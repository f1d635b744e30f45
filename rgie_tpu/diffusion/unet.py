"""Conditional diffusion UNet (Flax, NHWC) for the SD family.

The reference loads diffusers' torch UNets
(`/root/reference/src/pipelines/InversionResamplingStableDiffusionPipeline.py:21`,
`...XLPipeline.py:19`) and taps the mid-block with a forward hook
(`src/guidance_classifier/MiduClassifier.py:29,117-119`). JAX has no hooks, so
this UNet RETURNS the mid-block activations as an explicit second output —
the midu guidance classifier consumes them directly, and `jax.grad` w.r.t.
latents flows through the tap for classifier guidance.

Config-driven: `UNetConfig.sd21()` and `UNetConfig.sdxl()` reproduce the
diffusers architectures (block layout, attention heads, cross-attention dims,
SDXL's added text/time embeddings); tiny configs drive the tests.
bfloat16-friendly: pass dtype=jnp.bfloat16 for MXU-speed inference with fp32
GroupNorm statistics.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = ("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",)
    up_block_types: Tuple[str, ...] = ("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    attention_head_dim: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_embed_type: Optional[str] = None      # None | "text_time" (SDXL)
    addition_time_embed_dim: int = 256
    addition_pooled_dim: int = 1280                # pooled text-embed width
    projection_class_embeddings_input_dim: int = 2816
    norm_num_groups: int = 32

    @staticmethod
    def sd21() -> "UNetConfig":
        """stabilityai/stable-diffusion-2-1-base (also sd-turbo)."""
        return UNetConfig()

    @staticmethod
    def sdxl() -> "UNetConfig":
        """stabilityai/stable-diffusion-xl-base-1.0."""
        return UNetConfig(
            block_out_channels=(320, 640, 1280),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
            transformer_layers_per_block=(1, 2, 10),
            attention_head_dim=(5, 10, 20),
            cross_attention_dim=2048,
            addition_embed_type="text_time",
        )

    @staticmethod
    def tiny(cross_dim: int = 32) -> "UNetConfig":
        """Test-size config with the SD block structure."""
        return UNetConfig(
            block_out_channels=(8, 16),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1,
            transformer_layers_per_block=(1, 1),
            attention_head_dim=(2, 2),
            cross_attention_dim=cross_dim,
            norm_num_groups=4,
        )

    @staticmethod
    def tiny_xl(cross_dim: int = 32) -> "UNetConfig":
        """Test-size config with the SDXL block structure + added text_time
        conditioning (pooled embeds + 6 micro-conditioning time ids)."""
        return dataclasses.replace(
            UNetConfig.tiny(cross_dim),
            addition_embed_type="text_time",
            addition_time_embed_dim=8,
            addition_pooled_dim=16,
        )


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers convention (Timesteps module)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics regardless of activation dtype.

    ``eps`` follows diffusers: 1e-5 for UNet resnets/conv_norm_out
    (UNet2DConditionModel norm_eps), 1e-6 for Transformer2D's input norm and
    everything inside the VAE."""

    num_groups: int
    dtype: Any = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        return y.astype(orig)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm32(self.groups, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm32(self.groups, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


#: Pallas flash-attention toggle for the UNet's SELF-attention layers
#: (env RGIE_FLASH_ATTN: "auto"|"1"|"0"). "auto" = on whenever the backend is
#: a real TPU AND the sequence is long enough to need it. The naive einsum
#: formulation materializes a (B, heads, N, N) f32 score matrix — 1 GB per
#: image/head at N=16384 (1024px VAE decode / SDXL top self-attn) — while the
#: Pallas kernel streams K/V blocks through VMEM (fwd + custom bwd, so NTO's
#: grad-through-UNet works). Threshold n >= 8192: MEASURED on v5e (scripts/
#: check_flash_attn.py 2026-08) the SD2.1 UNet fwd at n<=4096 is 0.75x with
#: flash (54 -> 72 ms) — XLA's fused attention wins where the score matrix
#: fits — so flash is reserved for the shapes where einsum either OOMs or
#: thrashes HBM. Cross-attention (M = 77 text tokens) always stays on the
#: einsum path: its score matrix is tiny and flash block shapes don't
#: divide 77.
FLASH_ATTN = os.environ.get("RGIE_FLASH_ATTN", "auto")


def _flash_self_attention_ok(n: int, m: int, dim_head: int) -> bool:
    if FLASH_ATTN == "0":
        return False
    if n != m or n < 8192 or n % 512:
        return False
    # Mosaic block-shape constraint (MIN_BLOCK_SIZE=128): head_dim must be
    # < 128 or a multiple of 128, else the kernel fails at lowering — fall
    # back to einsum instead (ADVICE r2: dim_head % 8 alone let e.g. 136 by).
    if not (dim_head < 128 or dim_head % 128 == 0):
        return False
    # The Pallas kernel has no CPU lowering: hard-disable (even when forced
    # "1") whenever lowering targets CPU — either the backend is CPU or we
    # are under jax.default_device(cpu), the big-model CPU-side init path
    # (scripts/adapt_images.py:98). Trace-time check; apply() on the TPU
    # re-traces outside the context and takes the flash path.
    if jax.default_backend() == "cpu":
        return False
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) == "cpu":
        return False
    return True


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        if _flash_self_attention_ok(n, m, self.dim_head):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)
            out = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                sm_scale=1.0 / math.sqrt(self.dim_head))
            out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(self.dim_head)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 8, dtype=self.dtype, name="proj_in")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses exact (erf) gelu, not the tanh approximation.
        h = a * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               dtype=self.dtype, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               dtype=self.dtype, name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForwardGEGLU(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    channels: int
    heads: int
    dim_head: int
    depth: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm32(self.groups, eps=1e-6, name="norm")(x)
        y = y.reshape(b, h * w, c)
        y = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(y)
        for i in range(self.depth):
            y = BasicTransformerBlock(self.channels, self.heads, self.dim_head,
                                      dtype=self.dtype, name=f"block_{i}")(y, context)
        y = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(y)
        return y.reshape(b, h, w, c) + residual


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    """Returns (eps_prediction, mid_block_features).

    ``block_remat=True`` rematerializes each ResnetBlock / Transformer2D
    under `nn.remat`: the backward pass then holds only the block-boundary
    activations plus ONE block's residuals at a time, instead of the whole
    UNet's — the per-chip memory lever for the differentiated paths (NTO
    inner loss, classifier guidance). Unlike the pipeline's whole-call
    `jax.checkpoint` (which re-runs the full forward during backward and so
    restores the full residual set at peak), per-block remat caps the peak at
    max(block) + boundaries. Parameter names are unchanged, so checkpoints
    and converters are oblivious."""

    cfg: UNetConfig = UNetConfig()
    dtype: Any = jnp.float32
    block_remat: bool = False

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 added_text_embeds: Optional[jnp.ndarray] = None,
                 added_time_ids: Optional[jnp.ndarray] = None,
                 down_residuals: Optional[Sequence[jnp.ndarray]] = None,
                 mid_residual: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        ResBlock, TxBlock = ResnetBlock, Transformer2D
        if self.block_remat:
            ResBlock = nn.remat(ResnetBlock)
            TxBlock = nn.remat(Transformer2D)
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # Time embedding.
        temb = timestep_embedding(timesteps, ch0)
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_embed_0")(temb.astype(self.dtype))
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(temb))

        # SDXL added conditioning (text_embeds + time_ids -> temb add).
        if cfg.addition_embed_type == "text_time":
            tids = timestep_embedding(added_time_ids.reshape(-1), cfg.addition_time_embed_dim)
            tids = tids.reshape(sample.shape[0], -1)
            add = jnp.concatenate([added_text_embeds, tids.astype(self.dtype)], axis=-1)
            add = nn.Dense(temb_dim, dtype=self.dtype, name="add_embed_0")(add)
            add = nn.Dense(temb_dim, dtype=self.dtype, name="add_embed_2")(nn.silu(add))
            temb = temb + add

        context = encoder_hidden_states.astype(self.dtype)
        x = nn.Conv(ch0, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(sample.astype(self.dtype))

        skips = [x]
        # Down blocks.
        for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types,
                                                 cfg.block_out_channels)):
            heads_dim = cfg.attention_head_dim[bi]
            for li in range(cfg.layers_per_block):
                x = ResBlock(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"down_{bi}_res_{li}")(x, temb)
                if btype == "CrossAttnDownBlock2D":
                    # diffusers SD2.x/SDXL configs name per-block HEAD COUNTS in
                    # `attention_head_dim` (5/10/20 heads -> 64-dim heads at
                    # 320/640/1280 channels); tiny test configs follow suit.
                    heads = heads_dim
                    x = TxBlock(out_ch, heads, out_ch // heads,
                                      cfg.transformer_layers_per_block[bi],
                                      cfg.norm_num_groups, dtype=self.dtype,
                                      name=f"down_{bi}_attn_{li}")(x, context)
                skips.append(x)
            if bi < len(cfg.block_out_channels) - 1:
                x = Downsample(out_ch, dtype=self.dtype, name=f"down_{bi}_downsample")(x)
                skips.append(x)

        # Mid block (the tap the midu classifier reads).
        mid_ch = cfg.block_out_channels[-1]
        heads = cfg.attention_head_dim[-1]
        x = ResBlock(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_res_0")(x, temb)
        x = TxBlock(mid_ch, heads, mid_ch // heads,
                          cfg.transformer_layers_per_block[-1],
                          cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_attn")(x, context)
        x = ResBlock(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_res_1")(x, temb)
        # ControlNet residuals (diffusers ControlNetModel semantics: one
        # residual per skip entry, added where the up path consumes them, plus
        # one on the mid-block output). The midu guidance tap sees the
        # control-conditioned mid features.
        if mid_residual is not None:
            x = x + mid_residual
        if down_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_residuals)]
        mid_features = x

        # Up blocks (reversed channels, skip concats).
        rev_channels = tuple(reversed(cfg.block_out_channels))
        rev_types = cfg.up_block_types
        rev_tf = tuple(reversed(cfg.transformer_layers_per_block))
        for bi, (btype, out_ch) in enumerate(zip(rev_types, rev_channels)):
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResBlock(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"up_{bi}_res_{li}")(x, temb)
                if btype == "CrossAttnUpBlock2D":
                    heads = tuple(reversed(cfg.attention_head_dim))[bi]
                    x = TxBlock(out_ch, heads, out_ch // heads, rev_tf[bi],
                                      cfg.norm_num_groups, dtype=self.dtype,
                                      name=f"up_{bi}_attn_{li}")(x, context)
            if bi < len(rev_channels) - 1:
                x = Upsample(out_ch, dtype=self.dtype, name=f"up_{bi}_upsample")(x)

        x = GroupNorm32(cfg.norm_num_groups, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=jnp.float32, name="conv_out")(x)
        return x, mid_features


def create_unet(key, cfg: UNetConfig = UNetConfig.tiny(), sample_hw: int = 8,
                context_len: int = 8, dtype=jnp.float32):
    model = UNet2DCondition(cfg, dtype=dtype)
    sample = jnp.zeros((1, sample_hw, sample_hw, cfg.in_channels), dtype)
    ctx = jnp.zeros((1, context_len, cfg.cross_attention_dim), dtype)
    kwargs = {}
    if cfg.addition_embed_type == "text_time":
        kwargs = dict(added_text_embeds=jnp.zeros((1, cfg.addition_pooled_dim), dtype),
                      added_time_ids=jnp.zeros((1, 6), dtype))
    variables = model.init(key, sample, jnp.zeros((1,), jnp.int32), ctx, **kwargs)
    return model, variables
