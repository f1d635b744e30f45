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
    ap.add_argument("--fid", action="store_true", help="also compute CLIP-FID/KID vs originals")
    ap.add_argument("--kid-subset", type=int, default=20)
    ap.add_argument("--csv", default=None, help="write the metrics frame to CSV")
    args = ap.parse_args()

    enable_persistent_cache()
    from rgie_tpu.analysis.process_results import process_result_images

    feature_extractor = None
    if args.fid:
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
