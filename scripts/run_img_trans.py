#!/usr/bin/env python
"""Manual/batch image-transform runner — analog of
`/root/reference/src/baselines/run_img_trans.py`: apply fixed / random /
min / max / custom filter-chain parameters to a dataset, compare VA emotions
before/after (the evaluation primitive, run_img_trans.py:361-386), save
outputs. Unlike the reference's hand-edited constant block, all knobs are CLI
flags, and the whole batch transforms in one jitted call.
"""

import argparse
import enum
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache


class TransformationType(enum.Enum):
    SAME = 1
    RANDOM = 2
    MAX = 3
    MIN = 4
    CUSTOM = 5


def build_params(ttype, key, dtype):
    """Parameter tables per type (reference: check_apply_params +
    init_custom_params, run_img_trans.py:94-465)."""
    import jax
    import jax.numpy as jnp

    from rgie_tpu.ops import chain as CH

    p = CH.init_params(dtype)
    if ttype == TransformationType.SAME:
        return p
    if ttype == TransformationType.CUSTOM:
        # the shipped custom look (run_img_trans.py:389-465): slight
        # underexposure, desaturation, red/blue curve pull at knot 1, blur 1.
        color = p.color.at[1, 0].mul(0.7).at[1, 2].mul(0.7)
        return p.replace(exposure=jnp.asarray(-0.1, dtype),
                         contrast=jnp.asarray(0.85, dtype),
                         saturation=jnp.asarray(0.85, dtype),
                         blur=jnp.asarray(1.0, dtype),
                         color=color)
    if ttype == TransformationType.MIN:
        return p.replace(exposure=jnp.asarray(-0.5, dtype),
                         saturation=jnp.asarray(0.3, dtype),
                         contrast=jnp.asarray(0.5, dtype),
                         blur=jnp.asarray(4.0, dtype))
    if ttype == TransformationType.MAX:
        return p.replace(exposure=jnp.asarray(0.5, dtype),
                         saturation=jnp.asarray(2.5, dtype),
                         contrast=jnp.asarray(1.8, dtype),
                         sharp=jnp.asarray(3.0, dtype))
    if ttype == TransformationType.RANDOM:
        ks = jax.random.split(key, 6)
        u = lambda k, lo, hi: jax.random.uniform(k, (), dtype, lo, hi)
        return p.replace(exposure=u(ks[0], -0.5, 0.5),
                         saturation=u(ks[1], 0.2, 2.5),
                         contrast=u(ks[2], 0.4, 2.0),
                         sharp=u(ks[3], 0.0, 3.0),
                         blur=u(ks[4], 1e-4, 4.0),
                         tone=jax.random.uniform(ks[5], (8, 1), dtype, 0.6, 1.4))
    raise ValueError(ttype)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--dataset", choices=("feed", "coco"), default="coco")
    ap.add_argument("--split", default="val")
    ap.add_argument("--type", default="CUSTOM",
                    choices=[t.name for t in TransformationType])
    ap.add_argument("--output-dir", default="./out_img_trans")
    ap.add_argument("--input-size", type=int, default=1024)
    ap.add_argument("--crop-size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--compare-emotions", action="store_true")
    ap.add_argument("--va-model", default=None)
    ap.add_argument("--one-batch", action="store_true")
    ap.add_argument("--check-individual", action="store_true",
                    help="apply each op separately and save per-op outputs "
                         "(the reference's is_ind_func_check, run_img_trans.py:27)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from rgie_tpu.data import CaptionFeedDataset, CocoCaptionsDataset, iterate_batches
    from rgie_tpu.ops import chain as CH
    from rgie_tpu.utils import stats as S

    ttype = TransformationType[args.type]
    key = jax.random.PRNGKey(args.seed)
    params = build_params(ttype, key, jnp.float32)
    # Inference-only batch transform: the Pallas fused pointwise prefix
    # (falls back to the pure-jnp chain off-TPU or for non-default orders).
    apply_jit = jax.jit(lambda im: CH.apply_filter_chain_fused(im, params))

    dataset = (CocoCaptionsDataset(args.data_dir, args.split) if args.dataset == "coco"
               else CaptionFeedDataset(args.data_dir))
    os.makedirs(args.output_dir, exist_ok=True)

    va_loss = None
    evaluate = None
    if args.compare_emotions:
        from rgie_tpu.engine import parametric as P
        from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
        from rgie_tpu.models.emotion import EmotionRegressor, create_regressor

        if args.va_model and os.path.exists(args.va_model):
            from rgie_tpu.utils.torch_convert import convert_resnet50, load_torch_state_dict

            variables = jax.tree.map(jnp.asarray,
                                     convert_resnet50(load_torch_state_dict(args.va_model)))
            va_loss = ValenceArousalLoss(regressor=EmotionRegressor(variables=variables))
        else:
            va_loss = ValenceArousalLoss(regressor=create_regressor(key))
        evaluate = jax.jit(P.make_evaluate(va_loss))

    stats = {}
    S.check_init_stats_adapt(stats, args.type)
    for images_np, metas in iterate_batches(dataset, args.batch, args.input_size,
                                            args.crop_size, limit=args.limit):
        images = jnp.asarray(images_np)
        if args.check_individual:
            # per-op visual spot checks (reference: is_ind_func_check)
            from rgie_tpu.ops.chain import DEFAULT_TRANSFORMS

            for op in DEFAULT_TRANSFORMS:
                single = jax.jit(lambda im, op=op: CH.apply_filter_chain(im, params, (op,)))(images)
                arr = np.clip(np.asarray(single[0]) * 255, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(args.output_dir, f"check_{op}.jpg"))
        adapted = apply_jit(images)
        if evaluate is not None:
            from rgie_tpu.engine import parametric as P

            models = P.models_of(va_loss, None)
            for b in range(images.shape[0]):
                m = evaluate(models, images[b:b + 1], adapted[b:b + 1])
                S.record_edit(stats[args.type], np.asarray(m["va_original"]),
                              np.asarray(m["va_adapted"]), float(m["rec_error"]))
        for b, meta in enumerate(metas):
            name = os.path.basename(meta[0]).replace(".jpg", "")
            arr = np.clip(np.asarray(adapted[b]) * 255, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(args.output_dir, f"{name}.jpg"))
        if args.one_batch:
            break

    if args.compare_emotions:
        S.print_stats(stats)


if __name__ == "__main__":
    main()
