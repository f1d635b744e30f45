"""Text encoders + prompt embedding for the SD family.

The reference builds prompt embeddings through diffusers' encode_prompt
(`/root/reference/src/pipelines/diff_utils.py:252-346`): SD2.1 uses the
OpenCLIP ViT-H text tower's penultimate hidden states (1024-d); SDXL
concatenates CLIP ViT-L (768) and OpenCLIP bigG (1280) hidden states (2048-d)
plus a pooled embedding. Here the towers are our Flax CLIP TextTransformer
with hidden-state output; tokenization uses the real CLIP BPE when a vocab
file is available (RGIE_CLIP_BPE_PATH) and a deterministic hash fallback
otherwise (zero-egress environments).
"""

from __future__ import annotations

import dataclasses
import gzip
import hashlib
import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rgie_tpu.models.clip import ResidualAttentionBlock, quick_gelu

BOS, EOS = 49406, 49407
CONTEXT_LEN = 77


def _gelu_exact(x):
    return nn.gelu(x, approximate=False)


#: HF `hidden_act` name -> fn. The SD-family checkpoints differ: CLIP ViT-L
#: (SDXL text_encoder) uses quick_gelu; the OpenCLIP-derived towers (SD2.1
#: ViT-H, SDXL bigG) use exact gelu.
ACTIVATIONS = {"quick_gelu": quick_gelu, "gelu": _gelu_exact}


class TextTowerConfig:
    """Standard tower shapes (matching the HF text_encoder configs the
    reference's `from_pretrained` pulls in)."""

    @staticmethod
    def open_clip_vit_h():  # SD2.1 text encoder: 23-layer HF checkpoint whose
        # last_hidden_state (with final LN) IS the penultimate-layer trick.
        return dict(width=1024, layers=23, heads=16, act="gelu", skip_last=0)

    @staticmethod
    def clip_vit_l():       # SDXL text_encoder 1: penultimate hidden states.
        return dict(width=768, layers=12, heads=12, act="quick_gelu", skip_last=1)

    @staticmethod
    def open_clip_big_g():  # SDXL text_encoder 2: penultimate + projected pool.
        return dict(width=1280, layers=32, heads=20, act="gelu", skip_last=1,
                    proj_dim=1280)

    @staticmethod
    def tiny():
        return dict(width=32, layers=2, heads=2)


class TextEncoderHidden(nn.Module):
    """CLIP text tower returning (hidden_states, pooled).

    ``skip_last=1`` returns the penultimate layer's raw hidden states (the
    diffusers SDXL `hidden_states[-2]` path); ``skip_last=0`` returns the
    final layer WITH the final LayerNorm applied (HF ``last_hidden_state`` —
    what diffusers' SD2.x encode_prompt consumes). ``proj_dim`` adds the HF
    ``text_projection`` to the pooled output (SDXL text_encoder_2)."""

    width: int = 1024
    layers: int = 23
    heads: int = 16
    vocab_size: int = 49408
    context_length: int = CONTEXT_LEN
    skip_last: int = 1
    act: str = "quick_gelu"
    proj_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width), self.dtype)
        x = x + pos[: tokens.shape[1]]
        mask = nn.make_causal_mask(tokens)
        act_fn = ACTIVATIONS[self.act]
        penultimate = x
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, act=act_fn,
                                       dtype=self.dtype,
                                       name=f"resblock_{i}")(x, mask=mask)
            if i == self.layers - 1 - self.skip_last:
                penultimate = x
        final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        hidden = penultimate if self.skip_last > 0 else final
        eot = jnp.argmax(tokens, axis=-1)
        pooled = final[jnp.arange(final.shape[0]), eot]
        if self.proj_dim is not None:
            proj = self.param("text_projection",
                              nn.initializers.normal(self.width ** -0.5),
                              (self.width, self.proj_dim), self.dtype)
            pooled = pooled @ proj
        return hidden, pooled


def tokenize(texts: Sequence[str], context_length: int = CONTEXT_LEN):
    """CLIP BPE when available, else a deterministic hash tokenizer.

    The hash fallback keeps the full pipeline runnable with random weights in
    zero-egress environments: same text -> same ids, BOS/EOS framing and
    padding semantics match CLIP's."""
    import numpy as np

    bpe = _load_bpe()
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        if bpe is not None:
            ids = bpe(text)[: context_length - 2]
        else:
            words = text.lower().strip().split()
            ids = [int(hashlib.md5(w.encode()).hexdigest(), 16) % 49000 + 320
                   for w in words][: context_length - 2]
        row = [BOS] + list(ids) + [EOS]
        out[i, : len(row)] = row
    return jnp.asarray(out)


_BPE = None


#: Default vendored location for the public CLIP merges file
#: (`bpe_simple_vocab_16e6.txt.gz` from openai/CLIP). Zero-egress build hosts
#: cannot fetch it, so it is not committed — drop the file here (or point
#: RGIE_CLIP_BPE_PATH at it) and every tokenize() call uses the real BPE.
VENDORED_BPE_PATH = os.path.join(os.path.dirname(__file__), "assets",
                                 "bpe_simple_vocab_16e6.txt.gz")


def _load_bpe():
    """Load the real CLIP BPE from RGIE_CLIP_BPE_PATH or the vendored asset."""
    global _BPE
    if _BPE is not None:
        return _BPE if _BPE is not False else None
    path = os.environ.get("RGIE_CLIP_BPE_PATH", "") or VENDORED_BPE_PATH
    if not os.path.exists(path):
        _BPE = False
        return None
    try:
        from rgie_tpu.diffusion.bpe import SimpleBPE

        _BPE = SimpleBPE(path)
        return _BPE
    except Exception:
        _BPE = False
        return None


@dataclasses.dataclass(frozen=True)
class PromptEncoder:
    """Bound text tower(s) producing CFG-ready embeddings.

    SD: embeds (2, 77, width) [uncond; cond]
    SDXL: embeds (2, 77, 768+1280) + pooled text_embeds (2, 1280) + time_ids.
    (reference: get_prompt_embeddings_sd / _sdxl, diff_utils.py:252-346)
    """

    tower1: Any          # TextEncoderHidden module
    variables1: Any
    tower2: Any = None   # SDXL second tower
    variables2: Any = None

    def encode_sd(self, prompt: str, negative_prompt: str = "",
                  do_cfg: bool = True) -> jnp.ndarray:
        tokens = tokenize([negative_prompt, prompt] if do_cfg else [prompt])
        hidden, _ = self.tower1.apply(self.variables1, tokens)
        return hidden

    def encode_sdxl(self, prompt: str, negative_prompt: str = "",
                    image_size: int = 1024) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        tokens = tokenize([negative_prompt, prompt])
        h1, _ = self.tower1.apply(self.variables1, tokens)
        h2, pooled2 = self.tower2.apply(self.variables2, tokens)
        embeds = jnp.concatenate([h1, h2], axis=-1)
        time_ids = get_add_time_ids(image_size, image_size)
        time_ids = jnp.broadcast_to(time_ids, (2, 6))
        return embeds, pooled2, time_ids


def get_add_time_ids(height: int, width: int, crop_top: int = 0, crop_left: int = 0,
                     target_height: Optional[int] = None,
                     target_width: Optional[int] = None) -> jnp.ndarray:
    """SDXL micro-conditioning (reference: get_add_time_ids, diff_utils.py:349-367):
    (orig_h, orig_w, crop_top, crop_left, target_h, target_w)."""
    return jnp.asarray([[height, width, crop_top, crop_left,
                         target_height or height, target_width or width]],
                       dtype=jnp.float32)


def tower_config_from_params(params: dict, skip_last: int = 1,
                             act: str = "gelu") -> dict:
    """Infer TextEncoderHidden shape kwargs from a converted param tree
    (rgie_tpu.utils.torch_convert.convert_clip_text_hf output). ``act`` and
    ``skip_last`` are role-dependent (see TextTowerConfig) and must be given."""
    width = params["positional_embedding"].shape[1]
    cfg = dict(width=width,
               layers=sum(1 for k in params if str(k).startswith("resblock_")),
               heads=max(width // 64, 1),
               vocab_size=params["token_embedding"]["embedding"].shape[0],
               skip_last=skip_last, act=act)
    if "text_projection" in params:
        cfg["proj_dim"] = params["text_projection"].shape[1]
    return cfg


def create_sd_prompt_encoder(key, tower_cfg: Optional[dict] = None,
                             vocab_size: int = 49408, dtype=jnp.float32) -> PromptEncoder:
    cfg = tower_cfg or TextTowerConfig.open_clip_vit_h()
    tower = TextEncoderHidden(vocab_size=vocab_size, dtype=dtype, **cfg)
    tokens = jnp.zeros((1, CONTEXT_LEN), jnp.int32)
    variables = tower.init(key, tokens)
    return PromptEncoder(tower1=tower, variables1=variables)


def create_sdxl_prompt_encoder(key, cfg1: Optional[dict] = None,
                               cfg2: Optional[dict] = None, dtype=jnp.float32) -> PromptEncoder:
    k1, k2 = jax.random.split(key)
    c1 = cfg1 or TextTowerConfig.clip_vit_l()
    c2 = cfg2 or TextTowerConfig.open_clip_big_g()
    t1 = TextEncoderHidden(dtype=dtype, **c1)
    t2 = TextEncoderHidden(dtype=dtype, **c2)
    tokens = jnp.zeros((1, CONTEXT_LEN), jnp.int32)
    return PromptEncoder(tower1=t1, variables1=t1.init(k1, tokens),
                         tower2=t2, variables2=t2.init(k2, tokens))
