"""ctypes bindings for the native C++ preprocessing library.

Builds lazily with `make -C native` on first use; falls back to the pure-PIL
path (rgie_tpu.data.dataset.preprocess_image) when the toolchain is absent.
The C++ path does shorter-side bilinear resize + center crop + normalize with
a pthread pool and no GIL — the host-side feeder for dataset-scale TPU edits.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_LIB = None
_LIB_FAILED = False
NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = NATIVE_DIR / "librgie_preprocess.so"
    try:
        if not so.exists():
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.rgie_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def preprocess_batch(images: Sequence[np.ndarray], resize_shorter: int, crop: int,
                     normalize: bool = False,
                     num_threads: Optional[int] = None) -> np.ndarray:
    """List of HWC uint8 (or [0,1] float) RGB arrays -> (N, crop, crop, 3)
    float32. Uses the C++ pool when built, else the PIL fallback."""
    lib = _load()
    if lib is None:
        from rgie_tpu.data.dataset import preprocess_image

        outs = []
        for img in images:
            f = img.astype(np.float32) / 255.0 if img.dtype == np.uint8 else img
            outs.append(preprocess_image(f, resize_shorter, crop, normalize))
        return np.concatenate(outs)

    n = len(images)
    u8 = [np.ascontiguousarray(img if img.dtype == np.uint8
                               else np.clip(img * 255, 0, 255).astype(np.uint8))
          for img in images]
    srcs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in u8])
    hs = (ctypes.c_int * n)(*[im.shape[0] for im in u8])
    ws = (ctypes.c_int * n)(*[im.shape[1] for im in u8])
    out = np.empty((n, crop, crop, 3), dtype=np.float32)
    threads = num_threads or min(8, os.cpu_count() or 1)
    lib.rgie_preprocess_batch(srcs, hs, ws, n, resize_shorter, crop,
                              int(normalize),
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                              threads)
    return out
