#!/usr/bin/env python
"""Diffusion dataset editing CLI — the TPU-native analog of the reference's
flagship entry point `/root/reference/src/adapt_images.py`: iterate a
captions dataset, DDIM-invert each image, optionally run null-text
optimization, resample with classifier-free + midu classifier guidance, save
and rescore every output.

Without downloaded SD weights (zero-egress), --scale tiny runs the full flow
on a small random-weight UNet/VAE; converted checkpoints plug in via
--unet/--vae/--midu checkpoints (rgie_tpu.utils.torch_convert).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--midu-ckpt", default=None)
    ap.add_argument("--diffusers-dir", default=None,
                    help="local diffusers snapshot dir (unet/ vae/ text_encoder/"
                         " ...): loads real pretrained weights via "
                         "rgie_tpu.diffusion.load instead of random init")
    ap.add_argument("--scale", choices=("tiny", "sd", "sdxl"), default="tiny")
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--dpm-diffusers-exact", action="store_true",
                    help="build the DPM karras/lu sigma tables with the "
                         "diffusers-exact conventions (inference-range "
                         "endpoints, appended training sigma_max on the "
                         "inverse table, first-order first inverse step) so "
                         "a real-checkpoint run is step-for-step comparable "
                         "to the reference's diffusers run")
    ap.add_argument("--scheduler", choices=("ddim", "dpm"), default="ddim",
                    help="ddim (reference SD default) or dpm; with --scale "
                         "sdxl, dpm uses karras sigmas + lu lambdas like the "
                         "reference (...XLPipeline.py:29-32)")
    ap.add_argument("--end-iteration", type=int, default=None)
    ap.add_argument("--cfg-scale", type=float, default=2.0)
    ap.add_argument("--clf-scale", type=float, default=0.2)
    ap.add_argument("--reference-value", type=float, default=None,
                    help="alpha offset on the original VA (GuidanceConfig.reference_value)")
    ap.add_argument("--no-nto", action="store_true")
    ap.add_argument("--use-caption", action="store_true", default=True)
    ap.add_argument("--batch", type=int, default=1,
                    help=">1 runs the batched edit program: the whole "
                         "invert->NTO->sample edit vmapped over the batch and "
                         "sharded over the mesh data axis")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize UNet activations on differentiated paths "
                         "(bigger batches at the cost of one extra forward)")
    ap.add_argument("--segment", type=int, default=0, metavar="K",
                    help="chain phase programs of K diffusion steps from the "
                         "host (diffusion/segmented.py) instead of one fused "
                         "XLA execution — required for batch/resolution "
                         "combos whose single execution would exceed the "
                         "~60s worker kill (see BASELINE.md round 3)")
    ap.add_argument("--remat-mode", choices=("call", "block"), default="block",
                    help="with --remat: 'block' remats each UNet res/attn "
                         "block (peak = boundaries + one block — the NTO "
                         "memory lever); 'call' wraps the whole UNet call "
                         "(the round-2 behavior)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--input-size", type=int, default=None)
    ap.add_argument("--dtype", choices=("float32", "bfloat16"), default=None,
                    help="weights/compute dtype (default: bf16 for sd/sdxl "
                         "scales -- SDXL f32 params alone exceed v5e HBM)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--vae-tile", type=int, default=None,
                    help="latent tile size for tiled VAE encode/decode "
                         "(diffusers enable_tiling analog; e.g. 64 = 512px "
                         "tiles, 25%% overlap). Needed for 1024px on one chip.")
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from rgie_tpu.adapt import ImageAdapter, ImageScorer, OutputImageManager
    from rgie_tpu.config import DATA_DIR, OUT_DIR, AdaptConfig, GuidanceConfig
    from rgie_tpu.data import CaptionFeedDataset, first_caption
    from rgie_tpu.diffusion import schedulers as SCH
    from rgie_tpu.diffusion.pipeline import InversionResamplingPipeline, PipelineParams
    from rgie_tpu.diffusion.text_encoder import (TextTowerConfig,
                                                 create_sd_prompt_encoder)
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet
    from rgie_tpu.diffusion.vae import VaeConfig, create_vae
    from rgie_tpu.models.midu import MiduSD, MiduSDXL
    from rgie_tpu.parallel import init_distributed, process_info

    # Multi-host bootstrap (no-op single-process; RGIE_COORDINATOR /
    # RGIE_NUM_PROCESSES / RGIE_PROCESS_ID or pod auto-detect) — must run
    # before any device use.
    init_distributed()
    pid, nproc = process_info()

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    if args.scale == "tiny":
        input_size = args.input_size or 64
        unet_cfg, vae_cfg = UNetConfig.tiny(), VaeConfig.tiny()
        tower_cfg = TextTowerConfig.tiny()
        is_xl = False
    elif args.scale == "sd":
        input_size = args.input_size or 512
        unet_cfg, vae_cfg = UNetConfig.sd21(), VaeConfig.sd()
        tower_cfg = TextTowerConfig.open_clip_vit_h()
        is_xl = False
    else:
        input_size = args.input_size or 1024
        unet_cfg, vae_cfg = UNetConfig.sdxl(), VaeConfig.sdxl()
        tower_cfg = TextTowerConfig.clip_vit_l()
        is_xl = True

    dtype_name = args.dtype or ("float32" if args.scale == "tiny" else "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    ckpt = None
    if args.diffusers_dir:
        from rgie_tpu.diffusion.load import load_diffusers_checkpoint

        ckpt = load_diffusers_checkpoint(
            args.diffusers_dir, dtype=None if args.scale == "tiny" else dtype)
        unet_cfg, vae_cfg = ckpt.unet_cfg, ckpt.vae_cfg
        is_xl = ckpt.is_xl
        if args.input_size is None:
            input_size = 1024 if is_xl else 512
        print(f"loaded diffusers checkpoint from {args.diffusers_dir} "
              f"(xl={is_xl}, bpe={'real' if ckpt.merges_path else 'fallback'})")

    latent_hw = input_size // (2 ** (len(vae_cfg.block_out_channels) - 1))
    if ckpt is not None and ckpt.unet_vars is not None:
        from rgie_tpu.diffusion.unet import UNet2DCondition
        from rgie_tpu.diffusion.vae import AutoencoderKL

        mdtype = jnp.float32 if args.scale == "tiny" else dtype
        unet = UNet2DCondition(unet_cfg, dtype=mdtype)
        vae = AutoencoderKL(vae_cfg, mdtype)
        unet_vars, vae_vars = ckpt.unet_vars, ckpt.vae_vars
    elif args.scale == "tiny":
        unet, unet_vars = create_unet(k1, unet_cfg, sample_hw=latent_hw, context_len=77)
        vae, vae_vars = create_vae(k2, vae_cfg, image_hw=input_size)
    else:
        # Big models: initialize on the host CPU backend, cast to the compute
        # dtype, then transfer -- SDXL's 2.6B f32 params can't even INIT in
        # 16GB HBM. (The reference loads fp16 weights from disk instead,
        # InversionResamplingStableDiffusionXLPipeline.py:19.)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            unet, unet_vars = create_unet(k1, unet_cfg, sample_hw=latent_hw,
                                          context_len=77, dtype=dtype)
            vae, vae_vars = create_vae(k2, vae_cfg, image_hw=input_size, dtype=dtype)
        accel = jax.devices()[0]
        cast = lambda t: jax.tree.map(
            lambda a: jax.device_put(a.astype(dtype) if a.dtype == jnp.float32 else a,
                                     accel), t)
        unet_vars = cast(unet_vars)
        vae_vars = cast(vae_vars)
    mid_ch = unet_cfg.block_out_channels[-1]
    midu = MiduSDXL(2) if is_xl else MiduSD(2)
    mid_hw = latent_hw // (2 ** (len(unet_cfg.block_out_channels) - 1))
    midu_vars = midu.init(k3, jnp.zeros((1, mid_hw, mid_hw, mid_ch)))
    if args.midu_ckpt and os.path.exists(args.midu_ckpt):
        from rgie_tpu.utils.torch_convert import convert_midu, load_torch_state_dict

        midu_vars = jax.tree.map(jnp.asarray,
                                 convert_midu(load_torch_state_dict(args.midu_ckpt), is_xl))
        print(f"loaded midu classifier from {args.midu_ckpt}")

    sched = SCH.make_schedule(args.num_steps)
    sigma_kw = {}
    if args.scheduler == "dpm" and is_xl:
        # The reference's SDXL DPM config: karras sigmas (+ lu lambdas, which
        # karras precedence masks) and the dedup'd inverse table.
        sigma_kw = dict(
            sigma_sched=SCH.make_dpm_sigma_schedule(
                args.num_steps, use_karras_sigmas=True, use_lu_lambdas=True,
                diffusers_exact=args.dpm_diffusers_exact),
            sigma_sched_inv=SCH.make_dpm_sigma_schedule(
                args.num_steps, use_karras_sigmas=True, use_lu_lambdas=True,
                inverse=True, diffusers_exact=args.dpm_diffusers_exact))
    if args.remat and args.remat_mode == "block":
        unet = unet.clone(block_remat=True)
    pipe = InversionResamplingPipeline(unet=unet, vae=vae, sched=sched,
                                       midu_model=midu, is_xl=is_xl,
                                       remat_unet=args.remat and args.remat_mode == "call",
                                       vae_tile=args.vae_tile,
                                       scheduler_type=args.scheduler,
                                       **sigma_kw)
    params = PipelineParams(unet=unet_vars, vae=vae_vars, midu=midu_vars)

    added_cond_fn = None
    if is_xl:
        from rgie_tpu.diffusion.pipeline import SdxlCond
        from rgie_tpu.diffusion.text_encoder import create_sdxl_prompt_encoder

        if ckpt is not None and ckpt.text_vars is not None:
            # Both towers must be present (load.py returns None for missing
            # ones — an SDXL dir with only text_encoder/ would otherwise
            # crash with an unhelpful TypeError; ADVICE r3).
            if ckpt.text2_vars is None:
                raise ValueError(
                    f"SDXL checkpoint {args.diffusers_dir} has text_encoder/ "
                    "but no text_encoder_2/ weights — both towers are "
                    "required for SDXL prompt encoding")
            from rgie_tpu.diffusion.text_encoder import (
                PromptEncoder, TextEncoderHidden, tower_config_from_params)

            # hidden_act comes from each tower's config.json (ADVICE r3):
            # tower 1 is CLIP ViT-L (quick_gelu), tower 2 OpenCLIP bigG (gelu)
            # for stock SDXL, but derived rather than hardcoded.
            c1 = tower_config_from_params(ckpt.text_vars["params"],
                                          skip_last=1, act=ckpt.text_act)
            c2 = tower_config_from_params(ckpt.text2_vars["params"],
                                          skip_last=1, act=ckpt.text2_act)
            prompt_enc = PromptEncoder(
                tower1=TextEncoderHidden(**c1), variables1=ckpt.text_vars,
                tower2=TextEncoderHidden(**c2), variables2=ckpt.text2_vars)
        else:
            prompt_enc = create_sdxl_prompt_encoder(k4)

        def embeds_fn(p, n):
            e, _, _ = prompt_enc.encode_sdxl(p, n, image_size=input_size)
            return e[1:2]  # cond row

        def cfg_embeds_fn(p, n):
            e, _, _ = prompt_enc.encode_sdxl(p, n, image_size=input_size)
            return e

        def added_cond_fn(p, n):
            _, pooled, time_ids = prompt_enc.encode_sdxl(p, n, image_size=input_size)
            return SdxlCond(text_embeds=pooled, time_ids=time_ids)
    else:
        if ckpt is not None and ckpt.text_vars is not None:
            from rgie_tpu.diffusion.text_encoder import (
                PromptEncoder, TextEncoderHidden, tower_config_from_params)

            # act from text_encoder/config.json (ADVICE r3): SD2.x/sd-turbo
            # OpenCLIP towers use gelu, SD1.x CLIP ViT-L uses quick_gelu —
            # hardcoding either silently corrupts the other family's prompts.
            c1 = tower_config_from_params(ckpt.text_vars["params"],
                                          skip_last=0, act=ckpt.text_act)
            prompt_enc = PromptEncoder(tower1=TextEncoderHidden(**c1),
                                       variables1=ckpt.text_vars)
        else:
            prompt_enc = create_sd_prompt_encoder(k4, tower_cfg)
        embeds_fn = lambda p, n: prompt_enc.encode_sd(p, n, do_cfg=False)
        cfg_embeds_fn = lambda p, n: prompt_enc.encode_sd(p, n, do_cfg=True)

    scorer = ImageScorer(pipe=pipe, params=params, embeds_fn=embeds_fn,
                         added_cond_fn=added_cond_fn)
    out_dir = args.out_dir or str(OUT_DIR / "adapt_images")
    manager = OutputImageManager(scorer=scorer, output_path=out_dir)
    adapter = ImageAdapter(pipe=pipe, params=params, scorer=scorer,
                           embeds_fn=embeds_fn, cfg_embeds_fn=cfg_embeds_fn,
                           added_cond_fn=added_cond_fn,
                           input_size=input_size)

    gcfg = GuidanceConfig(clf_scale=args.clf_scale, cfg_scale=args.cfg_scale,
                          reference_value=args.reference_value,
                          is_nto=not args.no_nto, use_caption=args.use_caption)
    acfg = AdaptConfig(num_inversion_steps=args.num_steps,
                       num_inference_steps=args.num_steps,
                       end_iteration=args.end_iteration, is_xl=is_xl)

    dataset = CaptionFeedDataset(args.data_dir or str(DATA_DIR))
    n = len(dataset) if args.limit is None else min(args.limit, len(dataset))
    if nproc > 1:
        # Rank-interleaved shard: process p edits items p, p+nproc, ...
        from rgie_tpu.data.dataset import ShardedView

        dataset = ShardedView(dataset, pid, nproc)
        n = -(-n // nproc)

    if args.batch <= 1:
        for i in range(n):
            _, (name, path, captions) = dataset[i]
            caption = first_caption(captions)
            print(f"[ {i + 1} / {n} ]: {name}\n")
            adapter.adapt(path, gcfg, manager, acfg.resolved_end_iteration(), caption)
        return

    # --- batched, mesh-sharded path (rgie_tpu.diffusion.batched): the whole
    # edit program vmapped over `--batch` images, batch axis over chips.
    import time

    import numpy as np

    from rgie_tpu.adapt.adapter import transform_image
    from rgie_tpu.data.dataset import ShardedView, load_image_rgb
    from rgie_tpu.diffusion.batched import (BatchedConds, make_batched_edit,
                                            stack_conds)
    from rgie_tpu.parallel import (batch_sharding, create_hybrid_mesh,
                                   create_mesh, global_from_local, local_rows,
                                   replicate)
    from rgie_tpu.utils.stats import print_score

    # Data axis = gcd(batch, devices): batch 2 on an 8-chip host (or batch 6
    # on 4 chips) shards over the largest divisor instead of erroring on the
    # batch-divisibility requirement of NamedSharding.
    import math as _math

    if nproc > 1:
        # Multi-host: one lockstep SPMD program over the DCN-aware hybrid
        # mesh; each process feeds its own rows (rank-interleaved dataset).
        n_dev = len(jax.devices())
        if args.batch % nproc or args.batch % n_dev:
            raise SystemExit(f"--batch {args.batch} must divide over "
                             f"{nproc} processes and {n_dev} global devices")
        local_batch = args.batch // nproc
        mesh = create_hybrid_mesh()
    else:
        local_batch = args.batch
        n_dev = len(jax.devices())
        n_data = _math.gcd(args.batch, n_dev) or 1
        mesh = create_mesh((n_data, 1), devices=jax.devices()[:n_data])
    sharding = batch_sharding(mesh)
    params = replicate(params, mesh)
    to_host = local_rows if nproc > 1 else np.asarray
    label = gcfg.resolved_label()
    out_sub = os.path.join(out_dir, label)
    os.makedirs(out_sub, exist_ok=True)

    edit_kwargs = dict(
        guidance_scale=gcfg.cfg_scale, guidance_clf_scale=gcfg.clf_scale,
        use_nto=gcfg.is_nto, use_reference=gcfg.reference_value is not None,
        end_iteration=acfg.resolved_end_iteration(),
        midu_is_minimized=not gcfg.max)
    if args.segment > 0:
        from rgie_tpu.diffusion.segmented import make_segmented_edit

        program = make_segmented_edit(pipe, chunk_steps=args.segment,
                                      **edit_kwargs)
    else:
        # Scoped-VMEM lever: opt-in for diffusion until device-measured
        # (utils/compileopts.py; activate with RGIE_SCOPED_VMEM_KIB).
        from rgie_tpu.utils.compileopts import tpu_compiler_options
        program = jax.jit(make_batched_edit(pipe, **edit_kwargs),
                          compiler_options=tpu_compiler_options(
                              measured_default_kib=None))
    empty = embeds_fn("", "")
    added_empty = None
    if is_xl:
        both = added_cond_fn("", "")
        added_empty = type(both)(text_embeds=both.text_embeds[1:2],
                                 time_ids=both.time_ids[1:2])

    from PIL import Image

    for start in range(0, n, local_batch):
        idxs = list(range(start, min(start + local_batch, n)))
        metas, images_l, conds_l = [], [], []
        for i in idxs:
            _, (name, path, captions) = dataset[i]
            caption = first_caption(captions)
            metas.append((name, path))
            images_l.append(transform_image(load_image_rgb(path), input_size)[0])
            prompt = gcfg.prompt if not gcfg.use_caption else (caption + " " + gcfg.prompt)
            ac, acond, auncond = None, None, None
            if is_xl:
                ac = added_cond_fn(prompt, gcfg.negative_prompt)
                both = added_cond_fn(caption, "")
                auncond = type(both)(text_embeds=both.text_embeds[0:1],
                                     time_ids=both.time_ids[0:1])
                acond = type(both)(text_embeds=both.text_embeds[1:2],
                                   time_ids=both.time_ids[1:2])
            conds_l.append(BatchedConds(
                cfg_embeds=cfg_embeds_fn(prompt, gcfg.negative_prompt),
                cond_embeds=embeds_fn(caption, ""),
                added_cfg=ac, added_cond=acond, added_uncond=auncond))
        # pad the tail batch to the compiled (local) batch size
        n_real = len(idxs)
        while len(images_l) < local_batch:
            images_l.append(images_l[-1])
            conds_l.append(conds_l[-1])
        images_np = np.stack([np.asarray(x) for x in images_l])
        if nproc > 1:
            images = global_from_local(images_np, mesh)
            conds = jax.tree.map(lambda x: global_from_local(np.asarray(x), mesh),
                                 stack_conds(conds_l))
            alphas = global_from_local(
                np.full((local_batch, 2), gcfg.reference_value or 0.0,
                        np.float32), mesh)
        else:
            images = jax.device_put(jnp.stack(images_l), sharding)
            conds = jax.tree.map(lambda x: jax.device_put(x, sharding),
                                 stack_conds(conds_l))
            alphas = jax.device_put(
                jnp.full((args.batch, 2), gcfg.reference_value or 0.0), sharding)

        t0 = time.time()
        out = jax.block_until_ready(program(params, images, empty, conds, alphas,
                                            added_empty))
        dt = time.time() - t0
        out_h = jax.tree.map(to_host, out)
        for b, (name, path) in enumerate(metas[:n_real]):
            print(f"[ {idxs[b] + 1} / {n} ]: {name}\n")
            orig = np.asarray(out_h.orig_score[b:b + 1])
            print_score(orig, "original")
            print_score(np.asarray(out_h.adapted_score[b:b + 1]), "adapted", orig)
            rec = float(np.mean(np.abs(out_h.edited[b] - images_np[b])))
            print("Reconstruction error: {:.4f}".format(rec))
            arr = np.clip(np.asarray(out_h.edited[b]) * 255, 0, 255).astype(np.uint8)
            base = name.replace(".jpg", "")
            Image.fromarray(arr).save(os.path.join(out_sub, f"{base}.jpg"))
        print(f"[{label}] batch of {n_real} edited in {dt:.2f}s "
              f"({n_real / dt:.3f} img/s)")


if __name__ == "__main__":
    main()
