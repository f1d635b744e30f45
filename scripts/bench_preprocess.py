#!/usr/bin/env python
"""Host-side throughput of the native C++ preprocessing feeder
(`native/preprocess.cpp`: anti-aliased shorter-side resize -> center crop ->
[0,1] float, pthread pool) vs the PIL fallback — the data path that feeds
every dataset-scale edit run (reference: torchvision transforms inside the
bs=1 DataLoader, `/root/reference/src/adapt_images.py:60-85`).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgie_tpu.data.native_preprocess import native_available, preprocess_batch


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--resize", type=int, default=512)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    images = [rng.integers(0, 256, (args.hw, args.hw + 32, 3), dtype=np.uint8)
              for _ in range(args.n)]

    def run(use_native):
        if not use_native:
            from rgie_tpu.data.dataset import preprocess_image
            t0 = time.time()
            for _ in range(args.runs):
                for img in images:
                    preprocess_image(img.astype(np.float32) / 255.0,
                                     args.resize, args.crop, False)
            return args.n * args.runs / (time.time() - t0)
        t0 = time.time()
        for _ in range(args.runs):
            preprocess_batch(images, args.resize, args.crop, False)
        return args.n * args.runs / (time.time() - t0)

    assert native_available(), "build native/ first (make -C native)"
    preprocess_batch(images[:4], args.resize, args.crop, False)  # warm pool
    native_ips = run(True)
    pil_ips = run(False)
    row = {
        "metric": f"host preprocess {args.hw}px->{args.crop}px",
        "value": round(native_ips, 1), "unit": "images/sec (C++ pool)",
        "vs_baseline": round(native_ips / pil_ips, 2),
        "detail": {"pil_fallback_ips": round(pil_ips, 1), "n": args.n,
                   "threads": min(8, os.cpu_count() or 1)},
    }
    print(json.dumps(row), flush=True)
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "preprocess_bench.jsonl")
    with open(art, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
