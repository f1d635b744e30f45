"""Unit tests for the vendored CLIP BPE implementation (rgie_tpu/diffusion/
bpe.py) through the REAL-vocab code path.

The public `bpe_simple_vocab_16e6.txt.gz` cannot be fetched on a zero-egress
host, so these tests drive `SimpleBPE` with a synthetic merges file in the
same format (header line + "a b" merge rules) and assert hand-computed
token ids: the algorithm (byte->unicode map, rank-ordered merge loop, the
`</w>` end-of-word marker, vocab id layout 256 bytes + 256 byte</w> + merges)
is exactly OpenAI CLIP's SimpleTokenizer, so a real merges file drops in
unchanged (reference installs `clip` from git, pyproject.toml:32)."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pytest

from rgie_tpu.diffusion.bpe import SimpleBPE, bytes_to_unicode

MERGES = ["h e", "l l", "he ll", "hell o</w>"]


def _write_merges(tmp_path, gz: bool = False):
    body = "#version: 0.2 synthetic\n" + "\n".join(MERGES) + "\n"
    if gz:
        p = tmp_path / "merges.txt.gz"
        with gzip.open(p, "wt", encoding="utf-8") as f:
            f.write(body)
    else:
        p = tmp_path / "merges.txt"
        p.write_text(body, encoding="utf-8")
    return str(p)


def _byte_id(ch: str) -> int:
    """Id of a single byte symbol = its index in bytes_to_unicode() order."""
    return list(bytes_to_unicode().values()).index(ch)


def test_merge_order_and_vocab_layout(tmp_path):
    bpe = SimpleBPE(_write_merges(tmp_path))
    # 'hello' merges (h,e) -> (l,l) -> (he,ll) -> (hell,o</w>) by rank order;
    # merged-symbol ids start at 512 (256 bytes + 256 byte</w>).
    assert bpe("hello") == [512 + 3]
    # 'he' alone: ('h', 'e</w>') has no applicable merge ((h,e) != (h,e</w>)).
    assert bpe("he") == [_byte_id("h"), 256 + _byte_id("e")]
    # 'hell' hits (h,e),(l,l) then stops: 'he' + 'll' -- but 'll' carries no
    # </w> merge, so the last symbol is 'l' 'l</w>'?  Hand-derive: word =
    # (h,e,l,l</w>); applicable: (h,e)->he; (l,l</w>) is NOT the (l,l) rule.
    assert bpe("hell") == [512 + 0, _byte_id("l"), 256 + _byte_id("l")]


def test_word_split_and_punctuation(tmp_path):
    bpe = SimpleBPE(_write_merges(tmp_path))
    # Lowercasing + whitespace collapse + per-word BPE; ',' is its own token
    # and single-char tokens get the </w> id directly.
    ids = bpe("Hello,   HELLO")
    assert ids == [512 + 3, 256 + _byte_id(","), 512 + 3]


def test_gzip_and_utf8_bytes(tmp_path):
    bpe = SimpleBPE(_write_merges(tmp_path, gz=True))
    assert bpe("hello") == [512 + 3]
    # Non-ASCII falls back to per-byte symbols (utf-8 'é' = 2 bytes, the last
    # carrying </w>); must not KeyError.
    ids = bpe("é")
    assert len(ids) == 2 and all(isinstance(i, int) for i in ids)


def test_tokenize_uses_real_bpe_when_vocab_present(tmp_path, monkeypatch):
    import rgie_tpu.diffusion.text_encoder as TE

    monkeypatch.setenv("RGIE_CLIP_BPE_PATH", _write_merges(tmp_path))
    monkeypatch.setattr(TE, "_BPE", None)
    try:
        toks = np.asarray(TE.tokenize(["hello hello"], context_length=8))
        assert toks.shape == (1, 8)
        assert toks[0, 0] == TE.BOS and toks[0, 3] == TE.EOS
        assert toks[0, 1] == toks[0, 2] == 512 + 3
        assert toks[0, 4:].tolist() == [0, 0, 0, 0]
    finally:
        TE._BPE = None  # do not leak the synthetic vocab to other tests
