#!/usr/bin/env python
"""Benchmark the MUNIT style-space edit (optimize_image_imaginaire workload)
at a given resolution/batch: decode -> clamp -> VA regressor (fwd+bwd) ->
re-encode L1 content recon -> Adam, scanned over N steps and vmapped over the
batch. The reference runs this at 1024px on one GPU
(`/root/reference/src/optimize_image_imaginaire.py:45`, shipped yaml:101-126);
--remat rematerializes the objective so 1024px fits at useful batch.

Prints ONE JSON line and appends it to artifacts/gan_bench.jsonl.
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
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--num-steps", type=int, default=100)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"), default="bfloat16")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from rgie_tpu.config import GanEditConfig, MunitGenConfig, OptimizeConfig
    from rgie_tpu.engine import gan as GE
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.emotion import create_regressor
    from rgie_tpu.models.munit import create_generator

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    # GAN path scores [-1,1] images: normalize=False (loader.load_va_loss's
    # is_input_range_0_1=False analog for random weights).
    reg = create_regressor(k1, normalize=False, dtype=dtype)
    va_loss = ValenceArousalLoss(regressor=reg)
    gen = create_generator(k2, MunitGenConfig(), image_size=args.size, dtype=dtype)

    cfg = GanEditConfig(
        optimize=OptimizeConfig(num_steps=args.num_steps, learning_rate=0.05),
        input_size=args.size, crop_size=args.size, remat=args.remat)
    # Scoped-VMEM lever: opt-in for the GAN family until device-measured
    # (utils/compileopts.py; activate with RGIE_SCOPED_VMEM_KIB).
    from rgie_tpu.utils.compileopts import tpu_compiler_options
    copts = tpu_compiler_options(measured_default_kib=None)
    edit = jax.jit(GE.make_batched_edit(gen, va_loss, cfg),
                   compiler_options=copts)
    models = GE.models_of(gen, va_loss)

    images = jax.random.uniform(k3, (args.batch, args.size, args.size, 3)) * 2 - 1
    alphas = jnp.full((args.batch, 2), 0.1)

    def run_once():
        result, edited = edit(models, images, alphas)
        return float(jnp.sum(edited.astype(jnp.float32))) + float(
            jnp.sum(result.best_loss))

    t0 = time.time()
    run_once()
    compile_s = time.time() - t0
    print(f"# compile+first run: {compile_s:.1f}s", flush=True)

    t0 = time.time()
    for _ in range(args.runs):
        run_once()
    elapsed = (time.time() - t0) / args.runs

    n_chips = jax.device_count()
    # torch-CPU per-step anchor (scripts/measure_torch_gan_baseline.py) —
    # comparable when measured at the same --size.
    vs_baseline = None
    anchor_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "torch_gan_baseline.json")
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor = json.load(f)
        if anchor.get("size") == args.size:
            vs_baseline = round(anchor["step_seconds"] * args.batch
                                / (elapsed / args.num_steps), 2)

    # Achieved FLOP/s + MFU (bench.py convention): cost-analyze ONE vmapped
    # value_and_grad objective step (the exact scan-body computation, minus
    # the negligible Adam update) and multiply by num_steps — XLA cost
    # analysis counts scan bodies once.
    V5E_BF16_PEAK = 197e12
    tflops = mfu = None
    try:
        objective = GE.make_objective(gen, va_loss, cfg)
        # Precompute the frozen per-image content/style codes EAGERLY: the
        # scan body differentiates the objective only (encode runs once per
        # edit, not per step), so the analyzed fn must exclude it.
        contents, styles = jax.vmap(
            lambda im: jax.tree.map(lambda x: x[0], gen.encode_a(im[None]))
        )(images)

        def one_step(models, contents, styles, alphas):
            def single(content, style, alpha):
                ctx = GE.GanEditContext(content=content[None],
                                        target=jnp.clip(alpha, 0.0, 1.0)[None])
                return jax.value_and_grad(
                    lambda s: objective(s, ctx, models))(style)

            return jax.vmap(single, in_axes=(0, 0, 0))(contents, styles, alphas)

        cost = (jax.jit(one_step).lower(models, contents, styles, alphas)
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0))
        if step_flops > 0:
            tflops = step_flops * args.num_steps / elapsed / 1e12
            mfu = tflops * 1e12 / V5E_BF16_PEAK
    except (AttributeError, KeyError, TypeError, ValueError) as exc:
        print(f"bench_gan: MFU computation failed: {exc!r}", file=sys.stderr)

    row = {
        "metric": f"optimize_image_imaginaire {args.size}px MUNIT edit",
        "value": round(args.batch / elapsed / n_chips, 4),
        "unit": "images/sec/chip (per full edit)",
        "vs_baseline": vs_baseline,
        "detail": {
            "batch": args.batch, "steps": args.num_steps,
            "per_step_ms_batched": round(elapsed / args.num_steps * 1000, 2),
            "remat": args.remat, "dtype": args.dtype,
            "achieved_tflops": round(tflops, 2) if tflops else None,
            "mfu_pct": round(mfu * 100.0, 2) if mfu else None,
            "edit_seconds": round(elapsed, 3),
            "compile_seconds": round(compile_s, 1), "chips": n_chips,
            # Provenance: CPU smoke rows must be distinguishable from
            # on-chip measurements in bench_history.jsonl.
            "device": jax.devices()[0].device_kind,
            # Exact compiler options passed to jit (VERDICT r4 #3 / ADVICE
            # r4: opt-in runs must be distinguishable in bench_history).
            "compiler_options": copts,
        },
    }
    print(json.dumps(row), flush=True)
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "gan_bench.jsonl")
    with open(art, "a") as f:
        f.write(json.dumps(row) + "\n")
    from rgie_tpu.utils.bench_history import record
    record("bench_gan.py", row)


if __name__ == "__main__":
    main()
