"""adapt_images CLI with --segment: the batched entry point must drive the
segmented edit (diffusion/segmented.py) end to end at tiny scale — dataset ->
phase-chained edit -> OutputImageManager outputs, matching the monolithic
--batch path's file contract (reference flow: /root/reference/src/
adapt_images.py:60-85)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def _make_feed(root, n=2):
    (root / "annotations").mkdir(parents=True)
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(n):
        caps[str(i)] = f"a tiny test image {i}"
        arr = (rng.uniform(0, 1, (40, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" / f"{i:012d}.jpg")
    (root / "annotations" / "captions.json").write_text(json.dumps(caps))


@pytest.mark.slow
def test_adapt_cli_segmented_tiny(tmp_path):
    from adapt_images import main as adapt_main

    feed = tmp_path / "feed"
    _make_feed(feed)
    out = tmp_path / "out"
    argv_common = ["--scale", "tiny", "--num-steps", "2", "--batch", "2",
                   "--data-dir", str(feed), "--limit", "2",
                   "--reference-value", "0.1"]
    sys.argv = ["adapt_images.py"] + argv_common + \
        ["--segment", "1", "--out-dir", str(out)]
    adapt_main()

    outputs = []
    for sub, _dirs, files in os.walk(out):
        outputs += [os.path.join(sub, f) for f in files if f.endswith(".jpg")]
    assert len(outputs) == 2
    for f in outputs:
        arr = np.asarray(Image.open(f))
        assert arr.shape[-1] == 3 and arr.size > 0
