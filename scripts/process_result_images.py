#!/usr/bin/env python
"""Offline result analysis CLI — the analog of
`/root/reference/src/analysis/process_result_images.py`: scan a folder of
`{name}_{method}.jpg` edited outputs, compute VA + low-level metrics per
method, run significance tests, and (optionally) CLIP-feature FID/KID vs the
originals.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("folder", help="folder of {name}_{method}.jpg result images")
    ap.add_argument("--va-model", default=None, help="torch va_pred_all checkpoint")
    ap.add_argument("--fid", action="store_true", help="also compute FID/KID vs originals")
    ap.add_argument("--inception-ckpt", default=None,
                    help="torch Inception-v3 state_dict (pytorch-fid "
                         "pt_inception-2015-12-05 or torchvision) for "
                         "calibrated FID/KID/ISC; falls back to CLIP-FID")
    ap.add_argument("--kid-subset", type=int, default=20)
    ap.add_argument("--csv", default=None, help="write the metrics frame to CSV")
    args = ap.parse_args()

    enable_persistent_cache()
    from rgie_tpu.analysis.process_results import process_result_images

    feature_extractor = None
    if args.fid and args.inception_ckpt:
        import jax

        from rgie_tpu.models.inception import (create_inception,
                                               make_feature_extractor)
        from rgie_tpu.utils.torch_convert import (convert_inception_v3,
                                                  load_torch_state_dict)

        sd = load_torch_state_dict(args.inception_ckpt)
        num_classes = sd["fc.weight"].shape[0] if hasattr(
            sd.get("fc.weight"), "shape") else 1008
        model, _ = create_inception(jax.random.PRNGKey(0), num_classes=num_classes)
        variables = jax.tree.map(jax.numpy.asarray, convert_inception_v3(sd))
        feature_extractor = make_feature_extractor(model, variables)
    elif args.fid:
        import jax

        from rgie_tpu.analysis.fid import make_clip_feature_extractor
        from rgie_tpu.models.clip import create_clip_image_encoder

        enc = create_clip_image_encoder(jax.random.PRNGKey(0))
        feature_extractor = make_clip_feature_extractor(enc)

    df = process_result_images(args.folder, model_path=args.va_model,
                               feature_extractor=feature_extractor,
                               kid_subset_size=args.kid_subset)
    if args.csv and not df.empty:
        df.to_csv(args.csv, index=False)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
