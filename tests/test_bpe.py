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


def test_unicode_word_split_matches_clip_pattern():
    """The fallback scanner must agree with CLIP's actual \\p{L}/\\p{N}
    pattern (compiled here via the `regex` module) on accented, CJK,
    contraction, punctuation-run, and special-token inputs."""
    import regex

    pat = regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
        r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)
    from rgie_tpu.diffusion.bpe import _word_split_scan, word_split

    cases = [
        "a café on the rivière",            # accented latin (\p{L})
        "über-größe straße",                 # eszett + umlauts + hyphen
        "日本語のキャプション写真",               # CJK: one letter run
        "五 photos of 3 dogs",               # \p{N} is SINGLE chars; 五 is L
        "don't we'll they're it's i'm you've he'd",
        "!!!'s weird 'quote' runs...",       # apostrophe inside punct run
        "mixed123numbers and ½ fractions",   # No-category number
        "<|startoftext|>a<|endoftext|>",
        "!!<|endoftext|>trailing",           # greedy run engulfs the special
        "हिन्दी में कैप्शन",                     # combining marks are NOT \p{L}
        "emoji 😀🚀 split",
        "ﬁligree ﬂow",                        # ligatures are \p{L}
    ]
    for text in cases:
        text = text.lower()
        assert word_split(text) == pat.findall(text), text
        assert _word_split_scan(text) == pat.findall(text), text


def test_nonascii_tokens_through_merges(tmp_path):
    """Accented words tokenize through real merges on their utf-8 byte
    symbols: 'café' = c a f + 2-byte é, with the merge applying to the
    byte-level symbols exactly like OpenAI's tokenizer."""
    b2u = bytes_to_unicode()
    e1, e2 = (b2u[b] for b in "é".encode("utf-8"))
    merges = [f"c a", f"{e1} {e2}"]
    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\n" + "\n".join(merges) + "\n", encoding="utf-8")
    bpe = SimpleBPE(str(p))
    ids = bpe("café")
    # word -> (c,a,f,é1,é2</w>): merge (c,a) applies; (é1,é2) does NOT match
    # (é1,é2</w>). So symbols: 'ca', 'f', é1, é2</w>.
    assert ids == [512 + 0, _byte_id("f"), _byte_id(e1), 256 + _byte_id(e2)]
    # NFD input (e + combining acute) must NFC-normalize to the same ids.
    import unicodedata
    assert bpe(unicodedata.normalize("NFD", "café")) == ids


def test_fix_text_lite_clean(tmp_path):
    """Curly quotes uncurl (ftfy semantics) so contractions tokenize as
    contractions; full-width forms fold to ASCII; html entities unescape."""
    bpe = SimpleBPE(_write_merges(tmp_path))
    assert bpe("don’t") == bpe("don't")
    assert bpe("ｈｅｌｌｏ") == bpe("hello")
    assert bpe("hello &amp; hello") == bpe("hello & hello")
    assert bpe("hello\x00\x07hello") == bpe("hellohello")


def test_fix_encoding_repairs_classic_mojibake():
    """VERDICT r4 #8: minimal ftfy.fix_encoding — UTF-8 mis-decoded as
    cp1252/latin-1 is repaired (single and double encoded), while
    well-formed accented text passes through untouched."""
    from rgie_tpu.diffusion.bpe import _fix_encoding, _fix_text_lite

    assert _fix_encoding("Ã©") == "é"            # Ã© -> é
    assert _fix_encoding("cafÃ© naÃ¯ve") == "café naïve"
    assert _fix_encoding("l'annÃ©e derniÃ¨re") == "l'année dernière"
    # cp1252 view of a UTF-8 right single quote: â€™ -> ’
    assert _fix_encoding("donâ€™t") == "don’t"
    # double-encoded: ÃƒÂ© -> Ã© -> é
    assert _fix_encoding("ÃƒÂ©") == "é"
    # clean accented text is NOT "repaired"
    for clean in ("café naïve", "São Paulo", "hello", "üben—jetzt"):
        assert _fix_encoding(clean) == clean
    # end-to-end through the cleaner: mojibake quote becomes ASCII quote
    assert _fix_text_lite("donâ€™t") == "don't"
