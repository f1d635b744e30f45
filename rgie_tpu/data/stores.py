"""Keyed backing stores for imaginaire-style datasets: folder and LMDB.

Re-implements the data-utils loader surface of
`/root/reference/src/external/imaginaire/utils/data.py:438-482`
(``load_from_lmdb`` / ``load_from_folder``): each takes ``keys`` — a dict
mapping data_type -> path(s) — plus per-data-type store handles, and returns
a dict of data_type -> list of decoded items. The handle classes themselves
(``getitem_by_path``) are NOT vendored in the reference (its editing entry
points never construct them), so the handle API here follows the loader
call sites: ``getitem_by_path(key: bytes, data_type: str)``.

Divergences, by design:
- Decoding is PIL (HWC uint8 numpy), not cv2 — cv2 must never enter a jax
  process here (CLAUDE.md); non-image data types return raw bytes.
- ``load_from_object_store`` (`data.py:486-517`, an AWS S3 reader with an
  infinite 30 s retry loop) is intentionally NOT implemented: this is a
  zero-egress environment and the editing path never uses it.
- LMDB support is gated on the optional ``lmdb`` module (not installed in
  this image); ``LmdbStore`` raises a clear ImportError at construction
  when it is missing, and everything else works without it.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Sequence, Union

import numpy as np

# data.py:20-23 (lowercase + uppercase variants collapse under .lower()).
IMG_EXTENSIONS = ("jpg", "jpeg", "png", "ppm", "bmp",
                  "pgm", "tif", "tiff", "webp")


def _is_image_key(key: str) -> bool:
    ext = key.rsplit(".", 1)[-1].lower()
    return ext in IMG_EXTENSIONS


def _decode(raw: bytes, key: str, data_type: str) -> Union[np.ndarray, bytes]:
    """Images -> HWC uint8 RGB numpy; everything else -> raw bytes."""
    if _is_image_key(key):
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(raw))
        if img.mode != "RGB":
            img = img.convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    return raw


class FolderStore:
    """Directory-backed store: keys are paths relative to ``root``."""

    def __init__(self, root: str):
        self.root = Path(root)
        if not self.root.is_dir():
            raise FileNotFoundError(f"FolderStore root is not a dir: {root}")

    def keys(self) -> List[str]:
        """All file keys under the root, sorted, '/'-separated."""
        out = []
        for dirpath, _, files in os.walk(self.root):
            rel = os.path.relpath(dirpath, self.root)
            for f in files:
                out.append(f if rel == "." else f"{rel}/{f}".replace(os.sep, "/"))
        return sorted(out)

    def getitem_by_path(self, key: bytes, data_type: str):
        k = key.decode() if isinstance(key, bytes) else key
        with open(self.root / k, "rb") as f:
            raw = f.read()
        return _decode(raw, k, data_type)


class LmdbStore:
    """LMDB-backed store (optional ``lmdb`` module; read-only env)."""

    def __init__(self, path: str):
        try:
            import lmdb
        except ImportError as exc:  # pragma: no cover - lmdb not in image
            raise ImportError(
                "LmdbStore requires the optional 'lmdb' package (not baked "
                "into this image); use FolderStore or install lmdb"
            ) from exc
        self._env = lmdb.open(path, readonly=True, lock=False,
                              readahead=False, meminit=False)

    def getitem_by_path(self, key: bytes, data_type: str):
        k = key if isinstance(key, bytes) else key.encode()
        with self._env.begin(write=False) as txn:
            raw = txn.get(k)
        if raw is None:
            raise KeyError(k)
        return _decode(bytes(raw), k.decode("utf-8", "replace"), data_type)


def _load(keys: Dict[str, Union[str, Sequence[str]]],
          handles: Dict[str, object]) -> Dict[str, list]:
    data: Dict[str, list] = {}
    for data_type, dt_keys in keys.items():
        if not isinstance(dt_keys, (list, tuple)):
            dt_keys = [dt_keys]
        data[data_type] = [
            handles[data_type].getitem_by_path(
                k.encode() if isinstance(k, str) else k, data_type)
            for k in dt_keys]
    return data


def load_from_folder(keys, handles) -> Dict[str, list]:
    """`data.py:463-482`: data_type -> list of decoded items."""
    return _load(keys, handles)


def load_from_lmdb(keys, lmdbs) -> Dict[str, list]:
    """`data.py:438-460`: data_type -> list of decoded items."""
    return _load(keys, lmdbs)
