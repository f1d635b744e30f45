#!/usr/bin/env python
"""Capture a device trace of the batched parametric-edit step and print the
top ops by self time (xprof). Drives the same program as bench.py but with a
short scan so the trace stays small.

Usage: python scripts/profile_param_edit.py [--workload param|gan]
       [--steps 10] [--batch 8] [--size N] [--logdir /tmp/rgie_trace]
       [--parse-only]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache


def parse_trace(logdir: str, top: int = 25):
    """xplane.pb -> top ops by total self time (framework_op_stats tool)."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print(f"no xplane.pb under {logdir}")
        return
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]],
                                                   "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    try:
        table = json.loads(data)
    except Exception:
        out = os.path.join(logdir, "op_stats_raw.txt")
        with open(out, "w") as f:
            f.write(data)
        print(f"unparsed tool output written to {out} ({len(data)} bytes)")
        return
    with open(os.path.join(logdir, "op_stats.json"), "w") as f:
        json.dump(table, f)
    # gviz DataTable: cols + rows of {c:[{v:...}]}
    try:
        if isinstance(table, list):
            table = table[0]
        cols = [c.get("label") or c.get("id") for c in table["cols"]]
        rows = [[(cell or {}).get("v") for cell in r["c"]] for r in table["rows"]]
        idx = {name: i for i, name in enumerate(cols)}
        tkey = next(k for k in ("Total self-time (us)", "total_self_time",
                                "Total self time in us", "selfTimeUs",
                                "Total self-time (μs)") if k in idx)
        nkey = next(k for k in ("Operation Name", "Operation", "Op name",
                                "operation") if k in idx)
        hkey = next((k for k in ("Host/device", "host_or_device") if k in idx),
                    None)
        if hkey is not None:
            rows = [r for r in rows if r[idx[hkey]] == "Device"]
        rows.sort(key=lambda r: -(r[idx[tkey]] or 0))
        total = sum(r[idx[tkey]] or 0 for r in rows)
        print(f"{'self us':>12}  {'%':>5}  op")
        for r in rows[:top]:
            t = r[idx[tkey]] or 0
            print(f"{t:12.0f}  {100 * t / max(total, 1):5.1f}  {r[idx[nkey]]}")
    except Exception as e:
        print(f"could not tabulate ({e}); raw columns: "
              f"{table.get('cols') if isinstance(table, dict) else type(table)}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workload", choices=("param", "gan"), default="param")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=None,
                    help="image size (default: 256 param / 512 gan)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--logdir", default="/tmp/rgie_trace")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.logdir, args.top)
        return

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    if args.workload == "gan":
        from rgie_tpu.config import GanEditConfig, MunitGenConfig, OptimizeConfig
        from rgie_tpu.engine import gan as GE
        from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
        from rgie_tpu.models.emotion import create_regressor
        from rgie_tpu.models.munit import create_generator

        size = args.size or 512
        reg = create_regressor(k1, normalize=False, dtype=dtype)
        va_loss = ValenceArousalLoss(regressor=reg)
        gen = create_generator(k2, MunitGenConfig(), image_size=size, dtype=dtype)
        cfg = GanEditConfig(optimize=OptimizeConfig(num_steps=args.steps,
                                                    learning_rate=0.05),
                            input_size=size, crop_size=size, remat=args.remat)
        # GAN family keeps compiler defaults by measurement (BASELINE.md
        # round-5 sweeps) — options here are pure env opt-in, like bench_gan.
        from rgie_tpu.utils.compileopts import tpu_compiler_options
        edit = jax.jit(GE.make_batched_edit(gen, va_loss, cfg),
                       compiler_options=tpu_compiler_options(
                           measured_default_kib=None))
        models = GE.models_of(gen, va_loss)
        images = jax.random.uniform(k3, (args.batch, size, size, 3)) * 2 - 1
    else:
        from rgie_tpu.config import OptimizeConfig, ParamEditConfig
        from rgie_tpu.engine import parametric as P
        from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
        from rgie_tpu.models.clip import create_clip_image_encoder
        from rgie_tpu.models.emotion import create_regressor

        size = args.size or 256
        regressor = create_regressor(k1, dtype=dtype)
        va_loss = ValenceArousalLoss(regressor=regressor)
        clip_enc = create_clip_image_encoder(k2, dtype=dtype)
        cfg = ParamEditConfig(optimize=OptimizeConfig(num_steps=args.steps,
                                                      learning_rate=0.05),
                              remat=args.remat)
        # Trace the program the flagship actually ships: the measured default
        # compiler options (svmem64 + bundle cost model), same as bench.py.
        from rgie_tpu.utils.compileopts import tpu_compiler_options
        edit = jax.jit(P.make_batched_edit(va_loss, clip_enc, cfg),
                       compiler_options=tpu_compiler_options())
        models = P.models_of(va_loss, clip_enc)
        images = jax.random.uniform(k3, (args.batch, size, size, 3))
    alphas = jnp.full((args.batch, 2), 0.1)

    def run():
        result, edited = edit(models, images, alphas)
        return float(jnp.sum(edited)) + float(jnp.sum(result.best_loss))

    run()  # compile
    run()
    with jax.profiler.trace(args.logdir):
        run()
    print("trace captured", flush=True)
    parse_trace(args.logdir, args.top)


if __name__ == "__main__":
    main()
