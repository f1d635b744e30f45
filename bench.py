#!/usr/bin/env python
"""Benchmark: edited images/sec/chip for the 256px, 100-step Adam parametric
edit (BASELINE.json configs[0]) — the reference's
`optimize_image_param.py` workload with the full pipeline: differentiable
filter chain -> ten-crop 448px ResNet-50 VA regressor (fwd+bwd) -> CLIP
ViT-B/32 recon loss (fwd+bwd) -> Adam, all fused into one scanned XLA program
and vmapped over a batch of images.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the PyTorch-CPU per-step anchor measured on this
host class by scripts/measure_torch_baseline.py (see BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rgie_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rgie_tpu.config import OptimizeConfig, ParamEditConfig
from rgie_tpu.engine import parametric as P
from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
from rgie_tpu.models.clip import create_clip_image_encoder
from rgie_tpu.models.emotion import create_regressor

NUM_STEPS = 100
IMAGE_SIZE = 256
# Batch sweep on-chip (2026-08): 8 -> 0.9076, 12 -> 1.000, 16 -> 0.8765
# img/s/chip (16 spills; remat at 16 is worse still, 0.64). 12 is the knee.
# Re-swept round 5 under the adopted compiler options (svmem64 + bundle
# cost model): 10 -> 1.014, 12 -> 1.082, 14 -> 0.930, 16 -> 0.933 — unmoved.
BATCH = int(os.environ.get("RGIE_BENCH_BATCH", "12"))
# bfloat16 runs the frozen regressor/CLIP compute on the MXU fast path with
# f32 loss/optimizer masters (the 41 edit params and Adam state stay f32).
DTYPE = os.environ.get("RGIE_BENCH_DTYPE", "bfloat16")
REMAT = os.environ.get("RGIE_BENCH_REMAT", "0") == "1"

# PyTorch-CPU anchor: reference-equivalent objective step (ten-crop 448
# ResNet-50 fwd+bwd + CLIP ViT-B/32 fwd+bwd + filter chain) measured by
# scripts/measure_torch_baseline.py on this host class. images/sec for the
# 100-step edit = 1 / (100 * step_seconds). None until measured.
TORCH_CPU_STEP_SECONDS = _v if (_v := float(os.environ.get("RGIE_TORCH_STEP_SECONDS", "0"))) > 0 else None
_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "artifacts", "torch_baseline.json")
if TORCH_CPU_STEP_SECONDS is None and os.path.exists(_BASELINE_FILE):
    with open(_BASELINE_FILE) as f:
        TORCH_CPU_STEP_SECONDS = json.load(f).get("step_seconds")


# Tunnel-fault retry policy (VERDICT r3 weak #1): a single axon hiccup at
# driver time must not erase the round's perf evidence. After a worker crash
# the next process can hit FAILED_PRECONDITION for ~60-150 s (CLAUDE.md), so
# retry transient backend errors with a settle delay in between.
MAX_ATTEMPTS = int(os.environ.get("RGIE_BENCH_ATTEMPTS", "3"))
SETTLE_SECONDS = (90.0, 150.0)
_TRANSIENT = ("UNAVAILABLE", "FAILED_PRECONDITION", "DEADLINE_EXCEEDED",
              "Unable to initialize backend")


def _is_transient(exc: BaseException) -> bool:
    return any(tok in repr(exc) for tok in _TRANSIENT)


def _clear_backends():
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass


def measure():
    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    regressor = create_regressor(k1, dtype=dtype)        # 480/448 ten-crop ResNet-50
    va_loss = ValenceArousalLoss(regressor=regressor)
    clip_enc = create_clip_image_encoder(k2, dtype=dtype)  # ViT-B/32

    cfg = ParamEditConfig(optimize=OptimizeConfig(num_steps=NUM_STEPS,
                                                  learning_rate=0.05),
                          remat=REMAT)
    # 64 MiB scoped-VMEM limit: device-measured +2.3% on this exact program
    # (sweep in rgie_tpu/utils/compileopts.py; RGIE_SCOPED_VMEM_KIB=0 off).
    from rgie_tpu.utils.compileopts import tpu_compiler_options

    copts = tpu_compiler_options()
    edit = jax.jit(P.make_batched_edit(va_loss, clip_enc, cfg),
                   compiler_options=copts)
    models = P.models_of(va_loss, clip_enc)

    images = jax.random.uniform(k3, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))
    alphas = jnp.full((BATCH, 2), 0.1)

    def run_once():
        result, edited = edit(models, images, alphas)
        # Force FULL materialization: block_until_ready proved optimistic on
        # tunneled PJRT backends; a host reduction cannot lie.
        return float(jnp.sum(edited)) + float(jnp.sum(result.best_loss))

    # Warmup (compile)
    t0 = time.time()
    run_once()
    compile_s = time.time() - t0

    # Steady state
    runs = 3
    t0 = time.time()
    for _ in range(runs):
        run_once()
    elapsed = (time.time() - t0) / runs

    n_chips = jax.device_count()
    images_per_sec_per_chip = BATCH / elapsed / n_chips
    step_latency_ms = elapsed / NUM_STEPS * 1000.0  # batched step latency

    # Achieved FLOP/s + MFU (VERDICT r2 weak #1). XLA's cost analysis counts
    # a lax.scan body ONCE (trip count is opaque to it), so analyzing the
    # full edit undercounts ~NUM_STEPS x. Instead analyze ONE vmapped
    # value_and_grad objective step — the exact computation the scan body
    # runs, minus the negligible Adam update — and multiply by NUM_STEPS.
    # Reported against the v5e bf16 MXU peak (197 TFLOP/s) regardless of
    # dtype.
    V5E_BF16_PEAK = 197e12
    tflops = mfu = None
    try:
        from rgie_tpu.engine.parametric import EditContext
        from rgie_tpu.ops import chain as CH

        objective = P.make_objective(va_loss, clip_enc, cfg)

        def one_step(models, images, alphas):
            def single(image, alpha):
                ctx = EditContext(image=image[None],
                                  target=jnp.clip(alpha, 0.0, 1.0)[None],
                                  clip_features=jnp.zeros((1, 512), image.dtype))
                x0 = CH.pack_params(CH.init_params(image.dtype))
                return jax.value_and_grad(
                    lambda x: objective(x, ctx, models))(x0)

            return jax.vmap(single, in_axes=(0, 0))(images, alphas)

        cost = (jax.jit(one_step).lower(models, images, alphas)
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0))
        if step_flops > 0:
            tflops = step_flops * NUM_STEPS / elapsed / 1e12
            mfu = tflops * 1e12 / V5E_BF16_PEAK
    except (AttributeError, KeyError, TypeError, ValueError) as exc:
        # Narrow catch (ADVICE r3): cost_analysis API drift must be visible,
        # not a silently-null MFU field.
        print(f"bench.py: MFU computation failed: {exc!r}", file=sys.stderr)

    vs_baseline = None
    if TORCH_CPU_STEP_SECONDS:
        torch_images_per_sec = 1.0 / (NUM_STEPS * TORCH_CPU_STEP_SECONDS)
        vs_baseline = images_per_sec_per_chip / torch_images_per_sec

    return {
        "metric": "edited images/sec/chip (256px, 100-step Adam edit)",
        "value": round(images_per_sec_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "detail": {
            "batch": BATCH,
            "edit_seconds": round(elapsed, 3),
            "per_step_ms_batched": round(step_latency_ms, 2),
            "compile_seconds": round(compile_s, 1),
            "chips": n_chips,
            # Provenance: CPU smoke rows must be distinguishable from
            # on-chip measurements in bench_history.jsonl.
            "device": jax.devices()[0].device_kind,
            "dtype": DTYPE,
            "remat": REMAT,
            "torch_cpu_step_seconds": TORCH_CPU_STEP_SECONDS,
            "achieved_tflops": round(tflops, 2) if tflops else None,
            "mfu_pct": round(mfu * 100.0, 2) if mfu else None,
            # Exact compiler options passed to jit (VERDICT r4 #3: the row
            # must be reproducible from its JSONL line alone).
            "compiler_options": copts,
        },
    }


def _record_history(result):
    """Append the measurement to artifacts/bench_history.jsonl (VERDICT r3
    #8: every on-chip number auditable against a raw run)."""
    from rgie_tpu.utils.bench_history import record

    record("bench.py", result)


def main():
    last_exc = None
    for attempt in range(MAX_ATTEMPTS):
        try:
            result = measure()
            _record_history(result)
            print(json.dumps(result))
            return 0
        except Exception as exc:  # noqa: BLE001 — classify, then re-raise
            if not _is_transient(exc) or attempt == MAX_ATTEMPTS - 1:
                last_exc = exc
                break
            settle = SETTLE_SECONDS[min(attempt, len(SETTLE_SECONDS) - 1)]
            print(f"bench.py: transient backend error (attempt "
                  f"{attempt + 1}/{MAX_ATTEMPTS}): {exc!r}; settling "
                  f"{settle:.0f}s before retry", file=sys.stderr)
            _clear_backends()
            time.sleep(settle)
    # Final failure: still emit the one JSON line, with an "error" field,
    # so the driver records WHAT failed rather than a bare traceback.
    print(json.dumps({
        "metric": "edited images/sec/chip (256px, 100-step Adam edit)",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": repr(last_exc),
    }))
    return 1


if __name__ == "__main__":
    sys.exit(main())
