#!/usr/bin/env python
"""A/B a curated set of XLA:TPU compiler options on the flagship parametric
edit (VERDICT r4 #4: the scoped-VMEM win proved jax.jit(compiler_options=...)
reaches the remote compiler and moves the number — sweep the remaining
headroom or bound it empirically).

Builds the bench.py models ONCE, then re-jits the same batched edit per
option set. Unknown/rejected option names are caught and recorded as
"rejected" rows rather than aborting the sweep, so the candidate list can
include speculative flags. Results append to artifacts/compiler_sweep.jsonl
(and bench_history.jsonl via the shared recorder).

Reference analog: none — the reference leaves compiler tuning to torch
defaults (`/root/reference/src/baselines/optimize_image.py:56-97` is the
matching hot loop).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache

# Candidate option sets. Each entry: (label, dict-to-merge-over-base).
# Base = the measured 64 MiB scoped-VMEM default (current champion).
# Values are conservative; a rejected name costs one failed compile only.
CANDIDATES = [
    ("default(no options)", None),
    ("svmem64", {}),  # base alone — the current champion, re-measured
    ("svmem64+bw_scale_0.8",
     {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.8"}),
    ("svmem64+bw_scale_1.2",
     {"xla_tpu_async_copy_bandwidth_scaling_factor": "1.2"}),
    ("svmem64+licm_2.0", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    ("svmem64+no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("svmem64+bundle_cost_model",
     {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
    ("svmem64+no_dot_strength_red",
     {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("svmem64+msa_retries_3",
     {"xla_tpu_memory_space_assignment_max_retries": "3"}),
    ("svmem64+vector_load_fusion_off",
     {"xla_tpu_vector_load_fusion": "false"}),
    # --- round-2 set: base is the ADOPTED default (svmem64 + bundle-aware
    # fusion cost model). Run via --only with "r2:" labels. Probes XLA's
    # generic optimization-effort knobs plus fusion-strategy toggles.
    ("r2:base(svmem64+bundle)", {"_bundle": "1"}),
    # exec/memory effort are FLOAT-typed in ExecutableBuildOptions — string
    # values die client-side with a TypeError before reaching the compiler.
    ("r2:exec_effort_0.7",
     {"_bundle": "1", "exec_time_optimization_effort": 0.7}),
    ("r2:exec_effort_1.0",
     {"_bundle": "1", "exec_time_optimization_effort": 1.0}),
    ("r2:memory_fitting_effort_0.7",
     {"_bundle": "1", "memory_fitting_effort": 0.7}),
    ("r2:latency_hiding_sched",
     {"_bundle": "1", "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("r2:no_nested_dot_fusion",
     {"_bundle": "1", "xla_tpu_nested_dot_fusion": "false"}),
    ("r2:no_dot_dot_fusion",
     {"_bundle": "1", "xla_tpu_dot_dot_fusion": "false"}),
    ("r2:experimental_fusion_cost_model",
     {"_bundle": "1", "xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ("r2:scavenge_vmem_for_fusions",
     {"_bundle": "1", "xla_tpu_scavenge_vmem_for_fusions": "true"}),
]

BASE = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
# "_bundle" marker in a candidate dict folds the adopted bundle-aware cost
# model into its base (kept out of BASE so the round-1 rows stay comparable
# to their original runs).
BUNDLE = {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--num-steps", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated candidate labels to run")
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from rgie_tpu.config import OptimizeConfig, ParamEditConfig
    from rgie_tpu.engine import parametric as P
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.clip import create_clip_image_encoder
    from rgie_tpu.models.emotion import create_regressor

    dtype = jnp.bfloat16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    va_loss = ValenceArousalLoss(regressor=create_regressor(k1, dtype=dtype))
    clip_enc = create_clip_image_encoder(k2, dtype=dtype)
    cfg = ParamEditConfig(optimize=OptimizeConfig(num_steps=args.num_steps,
                                                  learning_rate=0.05))
    fn = P.make_batched_edit(va_loss, clip_enc, cfg)
    models = P.models_of(va_loss, clip_enc)
    images = jax.random.uniform(k3, (args.batch, 256, 256, 3))
    alphas = jnp.full((args.batch, 2), 0.1)

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "compiler_sweep.jsonl")
    from rgie_tpu.utils.bench_history import record

    only = set(args.only.split(",")) if args.only else None
    for label, extra in CANDIDATES:
        if only and label not in only:
            continue
        if extra is None:
            copts = None
        else:
            extra = dict(extra)
            bundle = BUNDLE if extra.pop("_bundle", None) else {}
            copts = {**BASE, **bundle, **extra}
        row = {"metric": "compiler-option sweep (flagship batch-12 edit)",
               "label": label, "unit": "images/sec/chip",
               "detail": {"batch": args.batch, "steps": args.num_steps,
                          "compiler_options": copts,
                          "device": jax.devices()[0].device_kind}}
        try:
            edit = jax.jit(fn, compiler_options=copts)

            def run_once():
                result, edited = edit(models, images, alphas)
                return float(jnp.sum(edited)) + float(jnp.sum(result.best_loss))

            t0 = time.time()
            run_once()
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.runs):
                run_once()
            elapsed = (time.time() - t0) / args.runs
            row["value"] = round(args.batch / elapsed, 4)
            row["detail"]["edit_seconds"] = round(elapsed, 3)
            row["detail"]["compile_seconds"] = round(compile_s, 1)
        except Exception as exc:  # noqa: BLE001 — sweep must survive rejects
            row["value"] = None
            row["detail"]["error"] = repr(exc)[:500]
            print(f"# {label}: REJECTED/FAILED: {exc!r}"[:300],
                  file=sys.stderr, flush=True)
        print(json.dumps(row), flush=True)
        with open(art, "a") as f:
            f.write(json.dumps(row) + "\n")
        record("sweep_compiler_options.py", row)


if __name__ == "__main__":
    main()
