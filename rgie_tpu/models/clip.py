"""CLIP ViT image encoder (and text encoder) in Flax, NHWC.

The reference uses OpenAI `clip.load("ViT-B/32")` for its reconstruction loss
(`/root/reference/src/baselines/optimize_image.py:151-183`). This is a
from-scratch Flax implementation of the same architecture (patch conv,
pre-LN transformer with quickGELU, class token, projection) so torch CLIP
checkpoints convert 1:1 and the loss compiles into the edit program. The text
tower doubles as the SD text encoder family's backbone (rgie_tpu.diffusion).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MLP(nn.Module):
    width: int
    act: Any = quick_gelu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(x)
        y = self.act(y)
        return nn.Dense(self.width, dtype=self.dtype, name="c_proj")(y)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    act: Any = quick_gelu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width, dtype=self.dtype,
            name="attn")(y, y, mask=mask)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        x = x + MLP(self.width, self.act, self.dtype, name="mlp")(y)
        return x


class VisionTransformer(nn.Module):
    """CLIP visual tower. ViT-B/32: width 768, layers 12, heads 12, patch 32,
    input 224, output_dim 512."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 32
    input_resolution: int = 224
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) already CLIP-normalized.
        b = x.shape[0]
        # Patch embedding as reshape + matmul instead of a stride-P conv: the
        # conv formulation's INPUT gradient lowered to a degenerate transposed
        # conv with a pathological layout on v5e (~21ms/step in the edit
        # loop); the matmul's gradient is just the transposed matmul. The
        # kernel parameter keeps the conv's HWIO shape for checkpoint parity.
        p = self.patch_size
        gh, gw = x.shape[1] // p, x.shape[2] // p
        kernel = self.param("conv1_kernel", nn.initializers.lecun_normal(),
                            (p, p, x.shape[-1], self.width), self.dtype)
        patches = x.reshape(b, gh, p, gw, p, x.shape[-1])
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, -1)
        x = patches @ kernel.reshape(-1, self.width)
        x = x.reshape(b, -1, self.width)  # (B, grid*grid, width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,), self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)), x], axis=1)
        n_tok = (self.input_resolution // self.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (n_tok, self.width), self.dtype)
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, dtype=self.dtype,
                                       name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim), self.dtype)
        return x @ proj


class TextTransformer(nn.Module):
    """CLIP text tower (causal mask, argmax-EOT pooling). ViT-B/32 text:
    width 512, layers 12, heads 8, context 77, vocab 49408."""

    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width), self.dtype)
        x = x + pos[: tokens.shape[1]]
        mask = nn.make_causal_mask(tokens)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, dtype=self.dtype,
                                       name=f"resblock_{i}")(x, mask=mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim), self.dtype)
        return x @ proj


@dataclasses.dataclass(frozen=True)
class ClipImageEncoder:
    """Frozen CLIP image tower with the reference's *0.5-normalization*
    preprocessing (optimize_image.py:155-165 uses Normalize(0.5, 0.5), NOT
    CLIP's standard mean/std — we reproduce that exactly)."""

    variables: Any
    model: VisionTransformer

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) in [0,1] (or [-1,1]: values with min < 0 skip the
        normalize step in the reference; here the caller chooses)."""
        from rgie_tpu.ops import geometry as G

        x = G.resize(images, (self.model.input_resolution, self.model.input_resolution),
                     antialias=False)
        x = (x - 0.5) / 0.5
        return self.model.apply(self.variables, x)

    def embed_normalized(self, images: jnp.ndarray) -> jnp.ndarray:
        feats = self(images)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


def create_clip_image_encoder(key, dtype=jnp.float32, **kw) -> ClipImageEncoder:
    model = VisionTransformer(dtype=dtype, **kw)
    variables = model.init(key, jnp.zeros((1, model.input_resolution,
                                           model.input_resolution, 3), dtype))
    return ClipImageEncoder(variables=variables, model=model)


def clip_loss(encoder: ClipImageEncoder, image1_features_normed: jnp.ndarray,
              image2: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine(e1, e2) (reference: optimize_image.py:151-183). The original
    image's features are precomputed ONCE per edit (the reference re-encodes
    the constant original every step — a pure waste we drop with identical
    numerics)."""
    f2 = encoder.embed_normalized(image2)
    return 1.0 - jnp.sum(image1_features_normed * f2, axis=-1)[0]
