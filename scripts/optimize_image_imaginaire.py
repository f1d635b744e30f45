#!/usr/bin/env python
"""MUNIT style-space editing CLI — the TPU-native analog of the reference
entry point `/root/reference/src/optimize_image_imaginaire.py`: optimize the
8-dim style code of a frozen MUNIT autoencoder per image so the decoded image
hits a relative VA target, with L1 content reconstruction. Each 300-step edit
is one fused XLA program, vmapped over `--batch` images.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--va-model", default=None)
    ap.add_argument("--munit-model", default=None,
                    help="imaginaire .pt checkpoint (converted on load)")
    ap.add_argument("--num-steps", type=int, default=300)
    ap.add_argument("--learning-rate", type=float, default=0.05)
    ap.add_argument("--weight-clf", type=float, default=0.2)
    ap.add_argument("--weight-recon", type=float, default=1.0)
    ap.add_argument("--weight-dis", type=float, default=0.0,
                    help="hinge realism term relu(-gan_loss) "
                         "(reference: optimize_image_imaginaire.py:132-137)")
    ap.add_argument("--input-size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--limit", type=int, default=500)
    ap.add_argument("--adaptations", default="pos_01:0.1,pos_02:0.2,neg_01:-0.1,neg_02:-0.1,neutral:0.0")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the objective on backward (bigger batches / 1024px)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from rgie_tpu.config import (DATA_DIR, MODELS_DIR, OUT_DIR, GanEditConfig,
                                 MunitGenConfig, OptimizeConfig)
    from rgie_tpu.data import CaptionFeedDataset, iterate_batches
    from rgie_tpu.engine import gan as GE
    from rgie_tpu.engine import parametric as P
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.emotion import EmotionRegressor, create_regressor
    from rgie_tpu.models.munit import MunitGenerator, create_generator
    from rgie_tpu.parallel import (create_hybrid_mesh, create_mesh,
                                   global_from_local, init_distributed,
                                   local_rows, pad_to_multiple, process_info,
                                   replicate, shard_batch)
    from rgie_tpu.utils import stats as S

    # Multi-host bootstrap — no-op single-process, must precede device use.
    init_distributed()
    pid, nproc = process_info()

    data_dir = args.data_dir or str(DATA_DIR)
    out_dir = args.out_dir or str(OUT_DIR / "imaginaire" / f"weight_{args.weight_clf:<1.2f}")
    os.makedirs(out_dir, exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)

    # VA regressor on [-1,1] inputs (optimize_image_imaginaire.py:57-58).
    from rgie_tpu.models.loader import load_va_loss

    va_path = args.va_model or str(MODELS_DIR / "va_pred_all")
    va_loss = load_va_loss(va_path, k1, is_input_range_0_1=False)

    munit_path = args.munit_model or str(MODELS_DIR / "imaginaire_munit_200000_s5.pt")
    dis_model, dis_vars = None, None
    if os.path.exists(munit_path):
        import torch

        from rgie_tpu.utils.torch_convert import (convert_munit_autoencoder,
                                                  convert_multires_patch_discriminator,
                                                  filter_imaginaire_states)

        sd = torch.load(munit_path, map_location="cpu", weights_only=False)
        gen_sd = filter_imaginaire_states(sd["net_G"])
        va_vars = jax.tree.map(jnp.asarray, convert_munit_autoencoder(gen_sd, "a"))
        vb_vars = jax.tree.map(jnp.asarray, convert_munit_autoencoder(gen_sd, "b"))
        gen = MunitGenerator(variables_a=va_vars, variables_b=vb_vars)
        print(f"loaded MUNIT generator from {munit_path}")
        if args.weight_dis > 0 and "net_D" in sd:
            from rgie_tpu.models.discriminators import MultiResPatchDiscriminator

            dis_model = MultiResPatchDiscriminator()
            dis_vars = jax.tree.map(jnp.asarray, convert_multires_patch_discriminator(
                filter_imaginaire_states(sd["net_D"]), "a"))
            print("loaded MUNIT discriminator_a (weight_dis > 0)")
    else:
        gen = create_generator(k2, MunitGenConfig(), image_size=64)
        print(f"WARNING: {munit_path} not found; random-weight MUNIT stand-in")
    if args.weight_dis > 0 and dis_vars is None:
        from rgie_tpu.models.discriminators import MultiResPatchDiscriminator

        dis_model = MultiResPatchDiscriminator()
        k2, kd = jax.random.split(k2)
        dis_vars = dis_model.init(kd, jnp.zeros((1, args.input_size, args.input_size, 3)))
        print("WARNING: random-weight MUNIT discriminator stand-in")

    cfg = GanEditConfig(
        optimize=OptimizeConfig(num_steps=args.num_steps, learning_rate=args.learning_rate),
        weight_clf=args.weight_clf, weight_recon=args.weight_recon,
        weight_dis=args.weight_dis,
        input_size=args.input_size, crop_size=args.input_size,
        remat=args.remat)

    mesh = create_hybrid_mesh() if nproc > 1 else create_mesh()
    batch = args.batch or mesh.devices.size  # GLOBAL batch
    if batch % nproc:
        raise SystemExit(f"--batch {batch} must divide over {nproc} processes")
    local_batch = batch // nproc
    # Scoped-VMEM lever: opt-in for the GAN family until device-measured
    # (utils/compileopts.py; activate with RGIE_SCOPED_VMEM_KIB).
    from rgie_tpu.utils.compileopts import tpu_compiler_options
    edit = jax.jit(GE.make_batched_edit(gen, va_loss, cfg, dis_model),
                   compiler_options=tpu_compiler_options(
                       measured_default_kib=None))
    models = GE.models_of(gen, va_loss, dis_vars)
    if nproc > 1:
        models = replicate(models, mesh)
    evaluate = jax.jit(jax.vmap(
        lambda m, i, e: P.make_evaluate(va_loss)(m, i[None], e[None]),
        in_axes=(None, 0, 0)))

    adaptations = []
    for spec in args.adaptations.split(","):
        parts = spec.split(":")
        a = (float(parts[1]), float(parts[1])) if len(parts) == 2 else (float(parts[1]), float(parts[2]))
        adaptations.append((parts[0], a))
    dataset = CaptionFeedDataset(data_dir)
    limit = args.limit
    if nproc > 1:
        from rgie_tpu.data.dataset import ShardedView

        dataset = ShardedView(dataset, pid, nproc)
        limit = -(-args.limit // nproc) if args.limit else args.limit
    stats = {}
    to_host = local_rows if nproc > 1 else np.asarray

    for images_np, metas in iterate_batches(dataset, local_batch,
                                            args.input_size, args.input_size,
                                            normalize=True, limit=limit):
        images_np, n_real = pad_to_multiple(images_np, local_batch)
        if nproc > 1:
            images = global_from_local(images_np, mesh)
        else:
            images = shard_batch(jnp.asarray(images_np), mesh)
        for name, alpha in adaptations:
            S.check_init_stats_adapt(stats, name)
            if nproc > 1:
                alphas = global_from_local(
                    np.broadcast_to(np.asarray(alpha, np.float32),
                                    (images_np.shape[0], 2)), mesh)
            else:
                alphas = jnp.broadcast_to(jnp.asarray(alpha), (images.shape[0], 2))
            t0 = time.time()
            result, edited = jax.block_until_ready(edit(models, images, alphas))
            dt = time.time() - t0
            # make_evaluate only reads .regressor, shared by both models tuples
            metrics = {k: to_host(v) for k, v in
                       evaluate(models, images, edited).items()}
            edited_h = to_host(edited)
            for b, meta in enumerate(metas[:n_real]):
                va0 = np.asarray(metrics["va_original"][b])
                va1 = np.asarray(metrics["va_adapted"][b])
                S.print_score(va1, f"{meta[0]} {name}", va0)
                S.record_edit(stats[name], va0, va1, float(metrics["rec_error"][b]))
                out01 = np.asarray(GE.to_unit_range(jnp.asarray(edited_h[b])))
                base = os.path.basename(meta[0]).replace(".jpg", "")
                Image.fromarray(np.clip(out01 * 255, 0, 255).astype(np.uint8)).save(
                    os.path.join(out_dir, f"{base}_{name}.jpg"))
            print(f"[{name}] batch of {n_real} edited in {dt:.2f}s")

    print(f"weight_clf: {args.weight_clf}; weight_dis: {args.weight_dis}; "
          f"weight_recon: {args.weight_recon}")
    S.print_stats(stats)


if __name__ == "__main__":
    main()
