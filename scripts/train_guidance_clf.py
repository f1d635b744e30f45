#!/usr/bin/env python
"""Guidance-regressor (midu) training CLI — the TPU-native analog of
`/root/reference/src/clf/train_guidance_clf.py`: train the small CNN that
predicts valence/arousal from UNet mid-block activations of noisy latents.

Pipeline per batch (reference :209-294): teacher VA labels from the frozen
pixel regressor -> VAE-encode + add scheduler noise at random t -> UNet
mid-block features -> midu MSE -> Adam(lr 1e-5, wd 5e-5). Here the whole
step (feature extraction + fwd + bwd + update) is one pjit'd program with the
batch sharded over the `data` mesh axis (the gradient all-reduce the
reference never performed) and best-val orbax checkpointing.

Zero-egress default: random-weight UNet/VAE/teacher at --scale tiny;
converted torch checkpoints plug in via flags.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default=None, help="captions feed dataset; synthetic if absent")
    ap.add_argument("--out-dir", default="./checkpoints/midu")
    ap.add_argument("--scale", choices=("tiny", "tiny-xl", "sd", "sdxl"), default="tiny",
                    help="sdxl = MiduSDXL over the SDXL UNet mid block at 1024px "
                         "(reference train_guidance_clf.py:52-54,89-98); tiny-xl "
                         "is its test-size twin")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"), default=None,
                    help="UNet/VAE feature-extraction dtype (default bf16 at "
                         "sd/sdxl scale; the trained midu stays f32)")
    ap.add_argument("--setting", choices=("va", "valence", "arousal"), default="va")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--learning-rate", type=float, default=1e-5)
    ap.add_argument("--weight-decay", type=float, default=5e-5)
    ap.add_argument("--num-batches", type=int, default=16,
                    help="train batches per epoch (synthetic mode)")
    ap.add_argument("--val-batches", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rgie_tpu.config import TrainGuidanceConfig
    from rgie_tpu.diffusion import schedulers as SCH
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet
    from rgie_tpu.diffusion.vae import AutoencoderKL, VaeConfig, create_vae
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.emotion import create_regressor
    from rgie_tpu.models.midu import MiduSD, MiduSDXL
    from rgie_tpu.parallel import (create_hybrid_mesh, create_mesh,
                                   global_from_local, init_distributed,
                                   is_main_process, process_info, shard_batch)
    from rgie_tpu.training.train_midu import (create_train_state, get_noisy_latents,
                                              make_eval_step, make_train_step,
                                              shard_train_step)
    from rgie_tpu.utils.checkpoint import BestCheckpointer

    # Multi-host bootstrap — no-op single-process, must precede device use.
    init_distributed()
    pid, nproc = process_info()

    cfg = TrainGuidanceConfig(setting=args.setting, batch_size=args.batch_size,
                              learning_rate=args.learning_rate,
                              weight_decay=args.weight_decay, num_epochs=args.epochs)
    if cfg.batch_size % nproc:
        raise SystemExit(f"--batch-size {cfg.batch_size} must divide over "
                         f"{nproc} processes")
    local_bs = cfg.batch_size // nproc  # rows this host feeds per step
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    is_xl = args.scale in ("tiny-xl", "sdxl")
    if args.scale == "tiny":
        image_size = args.image_size or 64
        unet_cfg, vae_cfg = UNetConfig.tiny(), VaeConfig.tiny()
        teacher = create_regressor(k4, input_size=72, crop_size=64)
    elif args.scale == "tiny-xl":
        image_size = args.image_size or 64
        unet_cfg, vae_cfg = UNetConfig.tiny_xl(), VaeConfig.tiny()
        teacher = create_regressor(k4, input_size=72, crop_size=64)
    elif args.scale == "sd":
        image_size = args.image_size or 512
        unet_cfg, vae_cfg = UNetConfig.sd21(), VaeConfig.sd()
        teacher = create_regressor(k4)
    else:  # sdxl: 1024px images, 128px latents, 32px mid block
        image_size = args.image_size or 1024
        unet_cfg, vae_cfg = UNetConfig.sdxl(), VaeConfig.sdxl()
        teacher = create_regressor(k4)
    teacher_loss = ValenceArousalLoss(regressor=teacher, loss_type=args.setting)

    dtype_name = args.dtype or ("float32" if args.scale.startswith("tiny")
                                else "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    latent_hw = image_size // (2 ** (len(vae_cfg.block_out_channels) - 1))
    if args.scale.startswith("tiny"):
        unet, unet_vars = create_unet(k1, unet_cfg, sample_hw=latent_hw, context_len=8)
        vae, vae_vars = create_vae(k2, vae_cfg, image_hw=image_size)
    else:
        # Big frozen feature extractors: host-CPU init, cast, transfer
        # (adapt_images.py policy — SDXL f32 can't even init in 16GB HBM).
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            unet, unet_vars = create_unet(k1, unet_cfg, sample_hw=latent_hw,
                                          context_len=8, dtype=dtype)
            vae, vae_vars = create_vae(k2, vae_cfg, image_hw=image_size, dtype=dtype)
        accel = jax.devices()[0]
        cast = lambda t: jax.tree.map(
            lambda a: jax.device_put(a.astype(dtype) if a.dtype == jnp.float32 else a,
                                     accel), t)
        unet_vars = cast(unet_vars)
        vae_vars = cast(vae_vars)
    mid_ch = unet_cfg.block_out_channels[-1]
    mid_hw = latent_hw // (2 ** (len(unet_cfg.block_out_channels) - 1))
    num_outputs = 2 if args.setting == "va" else 1
    midu = MiduSDXL(num_outputs) if is_xl else MiduSD(num_outputs)
    midu_vars = midu.init(k3, jnp.zeros((1, mid_hw, mid_hw, mid_ch)))

    sched = SCH.make_schedule(50)
    empty_ctx = jnp.zeros((1, 8, unet_cfg.cross_attention_dim))
    # SDXL added conditioning for the frozen feature pass: empty-prompt pooled
    # embeds (zeros, matching an untrained/empty encode) + the standard
    # (orig_size, crop 0 0, target_size) micro-conditioning time ids
    # (reference trains with empty prompts via get_prompt_embeddings_sdxl,
    # MiduClassifier._set_midu_layer_no_grad).
    added_text = jnp.zeros((1, unet_cfg.addition_pooled_dim))
    added_time = jnp.asarray(
        [[image_size, image_size, 0, 0, image_size, image_size]], jnp.float32)

    import dataclasses

    def features_and_labels(uv, vv, tv, rng_key, images):
        """Teacher labels + noisy-latent mid-block features (all frozen).
        Weight pytrees are jit ARGUMENTS — closing 2.6B SDXL params into the
        traced fn embeds them as HLO constants (remote-compile 413)."""
        tl = dataclasses.replace(
            teacher_loss, regressor=dataclasses.replace(teacher_loss.regressor,
                                                        variables=tv))
        labels = tl.predict_loss_metric(images)
        latents = vae.apply(vv, images * 2 - 1, method=AutoencoderKL.encode)
        latents = latents.astype(jnp.float32)
        noisy, t = get_noisy_latents(rng_key, latents, sched.alphas_cumprod,
                                     cfg.num_train_timesteps)
        b = noisy.shape[0]
        ctx = jnp.broadcast_to(empty_ctx, (b,) + empty_ctx.shape[1:]).astype(dtype)
        if is_xl:
            _, mid = unet.apply(uv, noisy, t, ctx,
                                added_text_embeds=jnp.broadcast_to(
                                    added_text, (b, added_text.shape[1])).astype(dtype),
                                added_time_ids=jnp.broadcast_to(added_time, (b, 6)))
        else:
            _, mid = unet.apply(uv, noisy, t, ctx)
        return mid.astype(jnp.float32), labels

    _fl = jax.jit(features_and_labels)
    teacher_vars = teacher_loss.regressor.variables
    features_and_labels = lambda k, imgs: _fl(unet_vars, vae_vars, teacher_vars,
                                              k, imgs)

    mesh = create_hybrid_mesh() if nproc > 1 else create_mesh()
    state = create_train_state(midu_vars, cfg)
    train_step = make_train_step(lambda p, f: midu.apply(p, f), cfg)
    train_step, state = shard_train_step(train_step, mesh, state)
    eval_step = jax.jit(make_eval_step(lambda p, f: midu.apply(p, f)))

    def data_epoch(rng_key, n_batches):
        """Synthetic or dataset-backed image batches — LOCAL rows only: in
        multi-host runs each process yields its local_bs slice of the global
        batch (rank-interleaved dataset / rank-folded synthetic key) and
        global_from_local assembles the global array below."""
        if args.data_dir and os.path.exists(args.data_dir):
            from rgie_tpu.data import CaptionFeedDataset, iterate_batches
            from rgie_tpu.data.dataset import ShardedView

            ds = CaptionFeedDataset(args.data_dir)
            if nproc > 1:
                ds = ShardedView(ds, pid, nproc)
            count = 0
            for imgs, _ in iterate_batches(ds, local_bs, image_size, image_size):
                if imgs.shape[0] == local_bs:
                    yield jnp.asarray(imgs)
                    count += 1
                if count >= n_batches:
                    break
        else:
            for i in range(n_batches):
                yield jax.random.uniform(
                    jax.random.fold_in(rng_key, pid * 100003 + i),
                    (local_bs, image_size, image_size, 3))

    ckpt = BestCheckpointer(args.out_dir)
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        train_losses = []
        for bi, images in enumerate(data_epoch(jax.random.fold_in(k5, epoch),
                                               args.num_batches)):
            feats, labels = features_and_labels(
                jax.random.fold_in(k5, (epoch * 10000 + bi) * nproc + pid),
                images)
            if nproc > 1:
                feats = global_from_local(np.asarray(feats), mesh)
                labels = global_from_local(np.asarray(labels), mesh)
            else:
                feats = shard_batch(feats, mesh)
                labels = shard_batch(labels, mesh)
            state, loss, _ = train_step(state, feats, labels)
            train_losses.append(float(loss))

        val_losses = []
        for bi, images in enumerate(data_epoch(jax.random.fold_in(k5, 777),
                                               args.val_batches)):
            feats, labels = features_and_labels(
                jax.random.fold_in(k5, (888 + bi) * nproc + pid), images)
            if nproc > 1:
                feats = global_from_local(np.asarray(feats), mesh)
                labels = global_from_local(np.asarray(labels), mesh)
            loss, _ = eval_step(state.params, feats, labels)
            val_losses.append(float(loss))

        val_loss = float(np.mean(val_losses))
        # Rank 0 owns the checkpoint (per-rank val shards differ slightly;
        # params are identical — the train step psums over the global mesh).
        saved = (ckpt.maybe_save(val_loss, state.params, int(state.step))
                 if is_main_process() else False)
        print(f"epoch {epoch + 1}/{cfg.num_epochs} "
              f"train {np.mean(train_losses):.5f} val {val_loss:.5f} "
              f"{'(best saved)' if saved else ''} [{time.time() - t0:.1f}s]")

    if is_main_process():
        print(f"best val loss: {ckpt.best_loss:.5f} at {ckpt.best_path}")


if __name__ == "__main__":
    main()
