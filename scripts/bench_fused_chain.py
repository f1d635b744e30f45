#!/usr/bin/env python
"""On-chip parity + timing for the Pallas fused pointwise chain used by the
full-resolution re-render (`ops/chain.edit_image_fused`): the exposure ->
saturation -> tone -> color -> contrast prefix in two HBM passes vs the
pure-jnp six-pass chain. Reference workload: optimize_image_param's
output_transform re-render at 1024px (/root/reference/src/
optimize_image_param.py:295-312).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from rgie_tpu.ops import chain as CH


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=20)
    args = ap.parse_args()

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    img = jax.random.uniform(k1, (args.batch, args.size, args.size, 3))
    x = 0.1 * jax.random.normal(k2, (41,))

    ref = jax.jit(lambda i, v: CH.edit_image(i, v, input_size=args.size))
    fused = jax.jit(lambda i, v: CH.edit_image_fused(i, v, input_size=args.size))

    o_ref = jax.block_until_ready(ref(img, x))
    o_fused = jax.block_until_ready(fused(img, x))
    err = float(jnp.max(jnp.abs(o_ref - o_fused)))
    print(f"max abs err fused vs jnp chain: {err:.3e}")
    assert err < 1e-4, err

    def bench(fn):
        jax.block_until_ready(fn(img, x))
        t0 = time.time()
        for _ in range(args.runs):
            jax.block_until_ready(fn(img, x))
        return (time.time() - t0) / args.runs * 1e3

    ms_ref, ms_fused = bench(ref), bench(fused)
    row = {
        "metric": f"full-res re-render {args.size}px batch {args.batch}",
        "value": round(ms_fused, 3), "unit": "ms (Pallas fused prefix)",
        "vs_baseline": None,
        "detail": {"jnp_chain_ms": round(ms_ref, 3),
                   "speedup": round(ms_ref / ms_fused, 3),
                   "max_abs_err": err, "runs": args.runs},
    }
    print(json.dumps(row), flush=True)
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "fused_chain_bench.jsonl")
    with open(art, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
