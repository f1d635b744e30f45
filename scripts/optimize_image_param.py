#!/usr/bin/env python
"""Parametric pixel-space editing CLI — the TPU-native analog of the reference
entry point `/root/reference/src/optimize_image_param.py` (flags replace its
hand-edited constant block at :30-59).

Per adaptation alpha, every image's 300-step Adam edit runs as ONE fused XLA
program, vmapped over `--batch` images and sharded across all chips.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default=None, help="dataset root (captions.json feed)")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--va-model", default=None, help="torch va_pred_all checkpoint (converted on load)")
    ap.add_argument("--num-steps", type=int, default=300)
    ap.add_argument("--learning-rate", type=float, default=0.05)
    ap.add_argument("--weight-clf", type=float, default=0.15)
    ap.add_argument("--weight-recon", type=float, default=1.0)
    ap.add_argument("--weight-dis", type=float, default=0.0,
                    help="realism term weight (reference: optimize_image_param.py:91-98,315-330)")
    ap.add_argument("--dis-model", default=None,
                    help="torch pixel-discriminator checkpoint (imagenet_w0_high_lookhere_dis)")
    ap.add_argument("--input-size", type=int, default=480)
    ap.add_argument("--crop-size", type=int, default=480)
    ap.add_argument("--va-input-size", type=int, default=480,
                    help="VA regressor resize (reference ten-crop 480/448)")
    ap.add_argument("--va-crop-size", type=int, default=448)
    ap.add_argument("--output-size", type=int, default=1024,
                    help="full-resolution re-render size (reference output_transform, "
                         "optimize_image_param.py:77-81,295-312); 0 disables")
    ap.add_argument("--batch", type=int, default=None, help="images per device program (default: #chips)")
    ap.add_argument("--limit", type=int, default=500, help="dataset cap (reference: optimize_image.py:25)")
    ap.add_argument("--adaptations", default="pos_01:0.1,pos_02:0.2,neg_01:-0.1,neg_02:-0.1,neutral:0.0")
    ap.add_argument("--gradient-free", action="store_true", help="Nelder-Mead instead of Adam")
    ap.add_argument("--gf-maxiter", type=int, default=None, help="Nelder-Mead iteration cap")
    ap.add_argument("--save-orig", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the objective on backward (bigger batches / 1024px)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rgie_tpu.config import DATA_DIR, OUT_DIR, MODELS_DIR, OptimizeConfig, ParamEditConfig
    from rgie_tpu.data import CaptionFeedDataset, ShardedView, iterate_batches
    from rgie_tpu.engine import parametric as P
    from rgie_tpu.engine.optimize import optimize_gradient_free
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.clip import create_clip_image_encoder
    from rgie_tpu.models.emotion import EmotionRegressor, create_regressor
    from rgie_tpu.ops import chain as CH
    from rgie_tpu.parallel import (create_hybrid_mesh, create_mesh,
                                   global_from_local, init_distributed,
                                   local_rows, pad_to_multiple, process_info,
                                   replicate, shard_batch)
    from rgie_tpu.utils import stats as S

    # Multi-host bootstrap (SURVEY §2.3: data-parallel-over-DCN; the analog
    # of the reference's dormant imaginaire init_dist). No-op single-process,
    # so it runs unconditionally BEFORE any device use; with RGIE_COORDINATOR
    # / RGIE_NUM_PROCESSES / RGIE_PROCESS_ID (or pod auto-detect) the edit
    # below runs one lockstep SPMD program over all hosts.
    init_distributed()
    pid, nproc = process_info()

    data_dir = args.data_dir or str(DATA_DIR)
    out_dir = args.out_dir or str(OUT_DIR / f"optimized_param_{args.weight_clf:<1.2f}")
    os.makedirs(out_dir, exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)

    from rgie_tpu.models.loader import load_va_loss

    va_path = args.va_model or str(MODELS_DIR / "va_pred_all")
    va_loss = load_va_loss(va_path, k1, is_input_range_0_1=True,
                           input_size=args.va_input_size,
                           crop_size=args.va_crop_size)
    clip_enc = create_clip_image_encoder(k2) if args.weight_recon > 0 else None

    # Optional pixel-discriminator realism term (reference wires it via
    # NetWithCriterion when weight_dis > 0, optimize_image_param.py:91-98).
    dis_model, dis_vars = None, None
    if args.weight_dis > 0:
        from rgie_tpu.models.discriminators import PixelDiscriminator

        dis_model = PixelDiscriminator(size_w=args.crop_size, size_h=args.crop_size)
        dis_path = args.dis_model or str(MODELS_DIR / "imagenet_w0_high_lookhere_dis")
        if os.path.exists(dis_path):
            from rgie_tpu.utils.torch_convert import (convert_pixel_discriminator,
                                                      load_torch_state_dict)

            dis_vars = jax.tree.map(jnp.asarray, convert_pixel_discriminator(
                load_torch_state_dict(dis_path), size_w=args.crop_size,
                size_h=args.crop_size))
            print(f"loaded pixel discriminator from {dis_path}")
        else:
            k2, kd = jax.random.split(k2)
            dis_vars = dis_model.init(kd, jnp.zeros((1, args.crop_size, args.crop_size, 3)))
            print(f"WARNING: {dis_path} not found; random-weight discriminator stand-in")

    cfg = ParamEditConfig(
        optimize=OptimizeConfig(num_steps=args.num_steps, learning_rate=args.learning_rate),
        weight_clf=args.weight_clf, weight_recon=args.weight_recon,
        weight_dis=args.weight_dis,
        input_size=args.input_size, crop_size=args.crop_size,
        output_size=args.output_size, remat=args.remat)

    mesh = create_hybrid_mesh() if nproc > 1 else create_mesh()
    n_chips = mesh.devices.size
    batch = args.batch or n_chips  # GLOBAL batch (all hosts together)
    if batch % nproc:
        raise SystemExit(f"--batch {batch} must divide over {nproc} processes")
    local_batch = batch // nproc
    # 64 MiB scoped-VMEM limit: device-measured +2.3% on this program family
    # (sweep in rgie_tpu/utils/compileopts.py; RGIE_SCOPED_VMEM_KIB=0 off).
    from rgie_tpu.utils.compileopts import tpu_compiler_options

    copts = tpu_compiler_options()
    edit = jax.jit(P.make_batched_edit(va_loss, clip_enc, cfg, dis_model),
                   compiler_options=copts)
    models = P.models_of(va_loss, clip_enc, dis_vars)
    if nproc > 1 and not args.gradient_free:
        # SPMD path: weights become one globally-replicated tree (every host
        # passes identical values). The gradient-free path stays host-local —
        # its data-dependent Nelder-Mead iteration counts must not enter
        # lockstep global programs.
        models = replicate(models, mesh)

    # Full-resolution output re-render (reference output_transform,
    # optimize_image_param.py:295-312: re-apply the optimized vector to the
    # Resize(1024)+CenterCrop(1024) original before saving). Uses the Pallas
    # fused pointwise kernel for the chain prefix on TPU.
    rerender = None
    if args.output_size:
        rerender = jax.jit(lambda img, x: CH.edit_image_fused(
            img, x, input_size=cfg.crop_size, order=cfg.transforms))
    evaluate = jax.jit(jax.vmap(
        lambda m, i, e: P.make_evaluate(va_loss)(m, i[None], e[None]),
        in_axes=(None, 0, 0)))

    # "name:a" applies a to both VA dims; "name:v:a" sets them separately
    # (the valence x arousal target grid of BASELINE.json configs[4]).
    adaptations = []
    for spec in args.adaptations.split(","):
        parts = spec.split(":")
        if len(parts) == 2:
            adaptations.append((parts[0], (float(parts[1]), float(parts[1]))))
        else:
            adaptations.append((parts[0], (float(parts[1]), float(parts[2]))))

    dataset = CaptionFeedDataset(data_dir)
    limit = args.limit
    if nproc > 1:
        # Per-process feeding: rank p edits items p, p+n, ... and each host
        # contributes its rows to the global batch (global_from_local below).
        dataset = ShardedView(dataset, pid, nproc)
        limit = -(-args.limit // nproc) if args.limit else args.limit
    stats = {}
    from PIL import Image

    gradient_free_edit = None
    if args.gradient_free:
        # Nelder-Mead (reference: optimization_gradient_free,
        # optimize_image.py:126-148): host-driven simplex over a jitted
        # objective — each eval is one device call.
        objective = P.make_objective(va_loss, clip_enc, cfg)
        objective_jit = jax.jit(objective)
        single_edit = jax.jit(P.make_single_edit(va_loss, clip_enc, cfg),
                              compiler_options=copts)

        def gradient_free_edit(image, alpha):
            va0 = va_loss.predict_loss_metric(image)
            target = jnp.clip(va0 + alpha, 0.0, 1.0)
            feats = (clip_enc.embed_normalized(image) if clip_enc is not None
                     else jnp.zeros((1, 1)))
            ctx = P.EditContext(image=image, target=target, clip_features=feats)
            x0 = CH.pack_params(CH.init_params())
            x_opt, _ = optimize_gradient_free(
                lambda x: objective_jit(jnp.asarray(x), ctx, models),
                np.asarray(x0), maxiter=args.gf_maxiter)
            edited = CH.edit_image(image, jnp.asarray(x_opt),
                                   input_size=cfg.crop_size, order=cfg.transforms)
            return edited, jnp.asarray(x_opt)

    # Host readback: in multi-host runs each process extracts ITS rows of the
    # data-sharded global outputs (the rows it fed in); single-process is a
    # plain transfer.
    to_host = local_rows if nproc > 1 else np.asarray

    for images_np, metas in iterate_batches(dataset, local_batch,
                                            args.input_size, args.crop_size,
                                            limit=limit):
        images_np, n_real = pad_to_multiple(images_np, local_batch)
        if nproc > 1:
            images = global_from_local(images_np, mesh)
        else:
            images = shard_batch(jnp.asarray(images_np), mesh)
        for name, alpha in adaptations:
            S.check_init_stats_adapt(stats, name)
            t0 = time.time()
            if gradient_free_edit is not None:
                # Host-driven simplex: runs on this process's local rows only
                # (no cross-host collectives in the Nelder-Mead loop).
                images_l = jnp.asarray(images_np)
                parts, xs = [], []
                for b in range(n_real):
                    e, x = gradient_free_edit(images_l[b:b + 1], jnp.asarray(alpha))
                    parts.append(e)
                    xs.append(x)
                if n_real < images_l.shape[0]:
                    parts.append(images_l[n_real:])
                edited = jnp.concatenate(parts)
                dt = time.time() - t0
                metrics = {k: np.asarray(v) for k, v in
                           evaluate(models, images_l, edited).items()}
                edited_h = np.asarray(edited)
                best_xs_h = np.asarray(jnp.stack(xs))
            else:
                if nproc > 1:
                    alphas = global_from_local(
                        np.broadcast_to(np.asarray(alpha, np.float32),
                                        (images_np.shape[0], 2)), mesh)
                else:
                    alphas = jnp.broadcast_to(jnp.asarray(alpha),
                                              (images.shape[0], 2))
                result, edited = jax.block_until_ready(edit(models, images, alphas))
                dt = time.time() - t0
                metrics = {k: to_host(v) for k, v in
                           evaluate(models, images, edited).items()}
                edited_h = to_host(edited)
                best_xs_h = to_host(result.best_x)
            for b, meta in enumerate(metas[:n_real]):
                va0 = np.asarray(metrics["va_original"][b])
                va1 = np.asarray(metrics["va_adapted"][b])
                S.print_score(va1, f"{meta[0]} {name}", va0)
                S.record_edit(stats[name], va0, va1, float(metrics["rec_error"][b]))
                if rerender is not None:
                    # Re-apply the optimized vector at the output resolution
                    # (reference output_transform, optimize_image_param.py:295-312).
                    from rgie_tpu.data.dataset import load_image_rgb, preprocess_image

                    full = jnp.asarray(preprocess_image(
                        load_image_rgb(meta[1]), args.output_size, args.output_size))
                    img_arr = np.asarray(rerender(full, best_xs_h[b])[0])
                else:
                    img_arr = np.asarray(edited_h[b])
                img_out = np.clip(img_arr * 255, 0, 255).astype(np.uint8)
                base = meta[0].replace(".jpg", "")
                Image.fromarray(img_out).save(os.path.join(out_dir, f"{base}_{name}.jpg"))
            print(f"[{name}] batch of {n_real} edited in {dt:.2f}s "
                  f"({n_real / dt:.3f} img/s)")

    if nproc > 1:
        print(f"[process {pid}/{nproc}] per-process stats follow")
    print(f"weight_clf: {args.weight_clf}; weight_dis: {args.weight_dis}; "
          f"weight_recon: {args.weight_recon}")
    S.print_stats(stats)


if __name__ == "__main__":
    main()
