#!/usr/bin/env python
"""Benchmark the flagship batched diffusion edit (adapt_images workload):
encode -> DDIM invert -> null-text optimization -> guided CFG sampling ->
decode -> rescore, vmapped over a batch and sharded over the mesh data axis
(rgie_tpu.diffusion.batched).

Reference workload: `/root/reference/src/adapt_images.py:60-85` +
`src/pipelines/InversionResamplingDiffusionPipeline.py:74-122` (bs=1 host
loop, 50+50 steps, NTO 10 inner steps). Weights are random — FLOPs and
memory traffic are identical to converted checkpoints (BASELINE.md policy).

Prints ONE JSON line per run with img/s/chip and the per-UNet-forward-
equivalent latency, and appends it to artifacts/diffusion_bench.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache


def unet_forward_equivalents(num_steps: int, use_nto: bool, num_inner: int) -> int:
    """Nominal single-latent UNet forward passes per edited image (counting a
    backward as 2 forwards, no remat surcharge; NTO inner loop at its full
    iteration budget — early stop only lowers the real number)."""
    n = 2                   # original + adapted VA scoring taps
    n += num_steps          # inversion
    if use_nto:
        # per outer step: 1 cond fwd + inner (fwd+bwd) + final CFG pair
        n += num_steps * (1 + num_inner * 3 + 2)
    # sampling: CFG pair + classifier-guidance grad (fwd+bwd)
    n += num_steps * (2 + 3)
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", choices=("tiny", "sd", "sdxl"), default="sd")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--num-inner", type=int, default=10)
    ap.add_argument("--no-nto", action="store_true")
    ap.add_argument("--remat", action="store_true", default=True)
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--remat-mode", choices=("call", "block"), default="call",
                    help="'block' = per-block nn.remat inside the UNet (peak "
                         "= boundaries + one block; the NTO ceiling lever); "
                         "'call' = whole-call jax.checkpoint (round-2 mode)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--segment", type=int, default=0, metavar="K",
                    help="run the SEGMENTED edit (diffusion/segmented.py): "
                         "phase programs of K diffusion steps chained from "
                         "the host. Lifts the ~60s single-execution kill on "
                         "tunneled workers that caps the monolith's batch")
    ap.add_argument("--memory-analysis", action="store_true",
                    help="compile only and print XLA's memory analysis "
                         "(temp/arg/output/peak bytes) without running — the "
                         "telemetry for per-chip batch-ceiling work")
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a device trace of one steady-state run and "
                         "print the top ops (profile_param_edit.parse_trace)")
    ap.add_argument("--vae-tile", type=int, default=None,
                    help="latent tile size for tiled VAE encode/decode "
                         "(diffusers enable_tiling analog; e.g. 64 = 512px "
                         "tiles, 25%% overlap). Needed for 1024px on one chip.")
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from rgie_tpu.diffusion import schedulers as SCH
    from rgie_tpu.diffusion.batched import BatchedConds, make_batched_edit
    from rgie_tpu.diffusion.pipeline import (InversionResamplingPipeline,
                                             PipelineParams, SdxlCond)
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet
    from rgie_tpu.diffusion.vae import VaeConfig, create_vae
    from rgie_tpu.models.midu import MiduSD, MiduSDXL
    from rgie_tpu.parallel import batch_sharding, create_mesh, replicate

    if args.scale == "tiny":
        size = args.size or 64
        unet_cfg, vae_cfg = UNetConfig.tiny(), VaeConfig.tiny()
        dtype = jnp.float32
        is_xl = False
    elif args.scale == "sd":
        size = args.size or 512
        unet_cfg, vae_cfg = UNetConfig.sd21(), VaeConfig.sd()
        dtype = jnp.bfloat16
        is_xl = False
    else:
        size = args.size or 512
        unet_cfg, vae_cfg = UNetConfig.sdxl(), VaeConfig.sdxl()
        dtype = jnp.bfloat16
        is_xl = True

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    latent_hw = size // (2 ** (len(vae_cfg.block_out_channels) - 1))

    if args.scale == "tiny":
        unet, unet_vars = create_unet(k1, unet_cfg, sample_hw=latent_hw, context_len=77)
        vae, vae_vars = create_vae(k2, vae_cfg, image_hw=size)
    else:
        # Big models: init on host CPU, cast, transfer (adapt_images.py policy —
        # SDXL f32 params can't even init in 16GB HBM).
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            unet, unet_vars = create_unet(k1, unet_cfg, sample_hw=latent_hw,
                                          context_len=77, dtype=dtype)
            vae, vae_vars = create_vae(k2, vae_cfg, image_hw=size, dtype=dtype)
        accel = jax.devices()[0]
        cast = lambda t: jax.tree.map(
            lambda a: jax.device_put(a.astype(dtype) if a.dtype == jnp.float32 else a,
                                     accel), t)
        unet_vars = cast(unet_vars)
        vae_vars = cast(vae_vars)

    mid_ch = unet_cfg.block_out_channels[-1]
    mid_hw = latent_hw // (2 ** (len(unet_cfg.block_out_channels) - 1))
    midu = MiduSDXL(2) if is_xl else MiduSD(2)
    midu_vars = midu.init(k3, jnp.zeros((1, mid_hw, mid_hw, mid_ch)))

    sched = SCH.make_schedule(args.num_steps)
    if args.remat and args.remat_mode == "block":
        unet = unet.clone(block_remat=True)
    pipe = InversionResamplingPipeline(unet=unet, vae=vae, sched=sched,
                                       midu_model=midu, is_xl=is_xl,
                                       remat_unet=args.remat and args.remat_mode == "call",
                                       vae_tile=args.vae_tile)
    params = PipelineParams(unet=unet_vars, vae=vae_vars, midu=midu_vars)

    mesh = create_mesh()
    sharding = batch_sharding(mesh)
    params = replicate(params, mesh)

    B, L, D = args.batch, 77, unet_cfg.cross_attention_dim
    ks = jax.random.split(k4, 8)
    images = jax.device_put(jax.random.uniform(ks[0], (B, size, size, 3)), sharding)
    empty = jax.random.normal(ks[1], (1, L, D)) * 0.02
    conds_kw = dict(
        cfg_embeds=jax.device_put(jax.random.normal(ks[2], (B, 2, L, D)) * 0.02,
                                  sharding),
        cond_embeds=jax.device_put(jax.random.normal(ks[3], (B, 1, L, D)) * 0.02,
                                   sharding))
    added_empty = None
    if is_xl:
        mk = lambda k, n: SdxlCond(
            text_embeds=jax.random.normal(jax.random.fold_in(k, 0),
                                          (B, n, 1280)) * 0.02,
            time_ids=jnp.tile(jnp.asarray([[size, size, 0, 0, size, size]],
                                          jnp.float32), (B, n, 1)).reshape(B, n, 6))
        conds_kw.update(
            added_cfg=jax.tree.map(lambda x: jax.device_put(x, sharding), mk(ks[4], 2)),
            added_cond=jax.tree.map(lambda x: jax.device_put(x, sharding), mk(ks[5], 1)),
            added_uncond=jax.tree.map(lambda x: jax.device_put(x, sharding), mk(ks[6], 1)))
        added_empty = SdxlCond(
            text_embeds=jax.random.normal(ks[7], (1, 1280)) * 0.02,
            time_ids=jnp.asarray([[size, size, 0, 0, size, size]], jnp.float32))
    conds = BatchedConds(**conds_kw)
    alphas = jax.device_put(jnp.zeros((B, 2)), sharding)

    # Scoped-VMEM lever provenance: segmented.py calls the same function with
    # the same args internally, so this records the exact options its phase
    # programs are jitted with too.
    from rgie_tpu.utils.compileopts import tpu_compiler_options
    copts = tpu_compiler_options(measured_default_kib=None)

    if args.segment > 0:
        from rgie_tpu.diffusion.segmented import make_segmented_edit

        program = make_segmented_edit(
            pipe, guidance_scale=2.0, guidance_clf_scale=0.2,
            use_nto=not args.no_nto, num_inner_steps=args.num_inner,
            chunk_steps=args.segment)
    else:
        program = jax.jit(make_batched_edit(
            pipe, guidance_scale=2.0, guidance_clf_scale=0.2,
            use_nto=not args.no_nto, num_inner_steps=args.num_inner),
            compiler_options=copts)

    if args.memory_analysis:
        if args.segment > 0:
            ap.error("--memory-analysis analyzes the monolithic program; "
                     "drop --segment")
        comp = program.lower(params, images, empty, conds, alphas,
                             added_empty).compile()
        ma = comp.memory_analysis()
        out = {}
        for f in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes", "peak_memory_in_bytes"):
            v = getattr(ma, f, None)
            if v is not None:
                out[f] = f"{v / 1e9:.3f} GB" if v > 1e6 else int(v)
        print(json.dumps({"batch": B, "scale": args.scale, "size": size,
                          "remat_mode": args.remat_mode, **out}), flush=True)
        return

    def run_once():
        out = program(params, images, empty, conds, alphas, added_empty)
        # force full materialization (tunneled-PJRT policy, bench.py)
        return (float(jnp.sum(out.edited.astype(jnp.float32))),
                float(jnp.sum(out.adapted_score)))

    t0 = time.time()
    run_once()
    compile_s = time.time() - t0
    print(f"# compile+first run: {compile_s:.1f}s", flush=True)

    t0 = time.time()
    for _ in range(args.runs):
        run_once()
    elapsed = (time.time() - t0) / args.runs

    n_chips = jax.device_count()
    img_s_chip = B / elapsed / n_chips
    fwd_eq = unet_forward_equivalents(args.num_steps, not args.no_nto, args.num_inner)
    per_unet_ms = elapsed / (fwd_eq * B) * 1000.0 * n_chips

    # Achieved FLOP/s + MFU (bench.py convention, VERDICT r2 weak #1 lineage):
    # XLA's cost analysis counts scan bodies once, so analyzing the full edit
    # undercounts ~100x. Instead cost-analyze ONE single-latent UNet forward
    # and multiply by fwd_eq x B — the same nominal-forward accounting as
    # per_unet_fwd_ms (bwd counted as 2 fwd; VAE/midu/rescore excluded, so
    # this slightly UNDERSTATES the true achieved figure).
    V5E_BF16_PEAK = 197e12
    tflops = mfu = None
    try:
        lat1 = jnp.zeros((1, latent_hw, latent_hw, unet_cfg.in_channels),
                         dtype)
        t1 = jnp.zeros((1,), jnp.int32)
        e1 = jnp.zeros((1, L, D), dtype)
        if is_xl:
            def unet_fwd(p, lat, tt, e):
                return unet.apply(
                    p, lat, tt, e,
                    added_text_embeds=jnp.zeros(
                        (1, unet_cfg.addition_pooled_dim), dtype),
                    added_time_ids=jnp.zeros((1, 6), jnp.float32))
        else:
            def unet_fwd(p, lat, tt, e):
                return unet.apply(p, lat, tt, e)
        cost = (jax.jit(unet_fwd).lower(params.unet, lat1, t1, e1)
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fwd_flops = float(cost.get("flops", 0.0))
        if fwd_flops > 0:
            tflops = fwd_flops * fwd_eq * B / elapsed / 1e12
            mfu = tflops * 1e12 / V5E_BF16_PEAK
    except (AttributeError, KeyError, TypeError, ValueError) as exc:
        print(f"bench_diffusion: MFU computation failed: {exc!r}",
              file=sys.stderr)

    row = {
        "metric": f"adapt_images {args.scale}-scale {size}px batched diffusion edit",
        "value": round(img_s_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "detail": {
            "batch": B, "steps": args.num_steps, "nto": not args.no_nto,
            "remat": args.remat, "remat_mode": args.remat_mode,
            "segment": args.segment or None,
            "edit_seconds": round(elapsed, 2),
            "unet_fwd_equivalents_per_image": fwd_eq,
            "per_unet_fwd_ms": round(per_unet_ms, 2),
            "achieved_tflops": round(tflops, 2) if tflops else None,
            "mfu_pct": round(mfu * 100.0, 2) if mfu else None,
            "compile_seconds": round(compile_s, 1), "chips": n_chips,
            # Provenance: CPU smoke rows must be distinguishable from
            # on-chip measurements in bench_history.jsonl.
            "device": jax.devices()[0].device_kind,
            # Exact compiler options passed to jit (VERDICT r4 #3).
            "compiler_options": copts,
        },
    }
    print(json.dumps(row), flush=True)
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "diffusion_bench.jsonl")
    os.makedirs(os.path.dirname(art), exist_ok=True)
    with open(art, "a") as f:
        f.write(json.dumps(row) + "\n")
    from rgie_tpu.utils.bench_history import record
    record("bench_diffusion.py", row)

    if args.profile:
        with jax.profiler.trace(args.profile):
            run_once()
        print("trace captured", flush=True)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_param_edit import parse_trace
        parse_trace(args.profile)


if __name__ == "__main__":
    main()
