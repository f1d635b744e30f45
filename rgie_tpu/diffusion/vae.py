"""VAE (AutoencoderKL) for the SD family, Flax NHWC.

The reference uses diffusers' torch VAE for image<->latent transport
(`get_latents_from_img`, `InversionResamplingStableDiffusionPipeline.py:147-150`;
decode at `diff_utils.py:109-119`) with fp32 upcast for SDXL fp16
(`...XLPipeline.py:194-216`). Scaling factors: 0.18215 (SD), 0.13025 (SDXL).

Encoding in the reference SAMPLES the latent posterior (`.sample()`,
`...StableDiffusionPipeline.py:149`); we expose both `mode` (deterministic,
the default here — reproducible edits) and `sample` with an explicit PRNG key.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rgie_tpu.diffusion.unet import GroupNorm32, _flash_self_attention_ok

SD_SCALING = 0.18215
SDXL_SCALING = 0.13025


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = SD_SCALING

    @staticmethod
    def sd() -> "VaeConfig":
        return VaeConfig()

    @staticmethod
    def sdxl() -> "VaeConfig":
        return VaeConfig(scaling_factor=SDXL_SCALING)

    @staticmethod
    def tiny() -> "VaeConfig":
        return VaeConfig(block_out_channels=(8, 16), layers_per_block=1,
                         norm_num_groups=4)


class VaeResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(self.groups, eps=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(self.groups, eps=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VaeAttention(nn.Module):
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm32(self.groups, eps=1e-6, name="norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        n = h * w
        if _flash_self_attention_ok(n, n, c):
            # Single-head flash attention: the einsum form materializes an
            # (N, N) score matrix — 1 GB per image at 1024px decode (N=16384).
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)
            y = flash_attention(q[:, None], k[:, None], v[:, None],
                                sm_scale=1.0 / math.sqrt(c))[:, 0]
        else:
            attn = jax.nn.softmax(
                jnp.einsum("bnc,bmc->bnm", q, k) / jnp.sqrt(c), axis=-1)
            y = jnp.einsum("bnm,bmc->bnc", attn, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(y)
        return x + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VaeConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = VaeResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"down_{bi}_res_{li}")(x)
            if bi < len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample: pad (0,1) asymmetric then stride 2.
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{bi}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = VaeResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype, name="mid_res_0")(x)
        x = VaeAttention(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(x)
        x = VaeResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype, name="mid_res_1")(x)
        x = GroupNorm32(cfg.norm_num_groups, eps=1e-6, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                       name="quant_conv")(x)


class Decoder(nn.Module):
    cfg: VaeConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(z)
        x = VaeResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype, name="mid_res_0")(x)
        x = VaeAttention(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(x)
        x = VaeResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype, name="mid_res_1")(x)
        for bi, ch in enumerate(reversed(cfg.block_out_channels)):
            for li in range(cfg.layers_per_block + 1):
                x = VaeResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"up_{bi}_res_{li}")(x)
            if bi < len(cfg.block_out_channels) - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"up_{bi}_upsample")(x)
        x = GroupNorm32(cfg.norm_num_groups, eps=1e-6, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=jnp.float32, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    cfg: VaeConfig = VaeConfig()
    dtype: Any = jnp.float32

    @property
    def upscale_factor(self) -> int:
        """Image px per latent px (8 for the SD family)."""
        return 2 ** (len(self.cfg.block_out_channels) - 1)

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)

    def encode_moments(self, images):
        """(B, H, W, 3) in [-1, 1] -> (mean, logvar) of the latent posterior."""
        moments = self.encoder(images)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images, key: Optional[jax.Array] = None):
        """Scaled latents; deterministic mode unless a key is given."""
        mean, logvar = self.encode_moments(images)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
        return self.cfg.scaling_factor * mean

    def decode(self, latents):
        """Scaled latents -> images in [-1, 1] (fp32 output — the analog of the
        reference's SDXL fp32 VAE upcast, ...XLPipeline.py:194-216)."""
        return self.decoder(latents / self.cfg.scaling_factor)

    def __call__(self, images, key: Optional[jax.Array] = None):
        return self.decode(self.encode(images, key))


def create_vae(key, cfg: VaeConfig = VaeConfig.tiny(), image_hw: int = 32,
               dtype=jnp.float32):
    model = AutoencoderKL(cfg, dtype)
    variables = model.init(key, jnp.zeros((1, image_hw, image_hw, cfg.in_channels), dtype))
    return model, variables


# ---------------------------------------------------------------------------
# Tiled VAE transport (the diffusers `enable_tiling` analog, diffusers
# autoencoder_kl.py tiled_decode/tiled_encode). One v5e chip cannot hold the
# full-resolution decoder activations at SDXL-1024 alongside a 2.6B UNet;
# tiling runs the VAE over fixed-size tiles SEQUENTIALLY (lax.map — the
# stacked tile axis is the memory knob) and crossfades tile borders.
#
# TPU-first differences from diffusers: tile grid positions are STATIC
# (trace-time python ints; the last tile is clamped to the canvas, never
# shape-varying), and blending is a symmetric linear crossfade via a
# per-tile weight mask accumulated into the canvas — pixels on a tile's cut
# edge (polluted by the conv zero-padding) get weight exactly 0. Like the
# diffusers implementation this is an approximation at seams: each tile runs
# its own mid-block attention. Defaults match diffusers' 512px tiles with
# 25% overlap (tile_latent_min_size=64, overlap_factor 0.25).

def tile_positions(extent: int, tile: int, stride: int) -> list:
    """Static tile start offsets covering [0, extent); last tile clamped."""
    if extent <= tile:
        return [0]
    ps = list(range(0, extent - tile + 1, stride))
    if ps[-1] + tile < extent:
        ps.append(extent - tile)
    return ps


def _edge_ramp(length: int, edge: int, ramp_lo: bool, ramp_hi: bool):
    import numpy as np

    w = np.ones((length,), np.float32)
    e = min(edge, length)
    if e == 0:
        return w
    # Linear 0 -> 1 over the overlap; the cut-edge pixel (conv zero-padding
    # pollution) gets weight exactly 0 — its canvas position is covered at
    # full weight by the neighbouring tile. e == 1 uses 0.5 so the two
    # single-pixel ramps never sum to zero.
    ramp = (np.arange(e, dtype=np.float32) / e) if e > 1 else np.array([0.5], np.float32)
    if ramp_lo:
        w[:e] = np.minimum(w[:e], ramp)
    if ramp_hi:
        w[-e:] = np.minimum(w[-e:], ramp[::-1])
    return w


def _stitch(tiles_list, positions, tile: int, edge: int, extent_hw, factor: int,
            out_channels: int):
    """Accumulate decoded/encoded tiles into a weighted canvas (static DUS)."""
    h, w = extent_hw
    b = tiles_list[0].shape[0]
    dt = tiles_list[0].dtype
    acc = jnp.zeros((b, h * factor, w * factor, out_channels), dt)
    wacc = jnp.zeros((1, h * factor, w * factor, 1), dt)
    i = 0
    for y, x in positions:
        wy = _edge_ramp(tile * factor, edge * factor, y > 0, y + tile < h)
        wx = _edge_ramp(tile * factor, edge * factor, x > 0, x + tile < w)
        mask = jnp.asarray((wy[:, None] * wx[None, :])[None, :, :, None], dt)
        acc = acc.at[:, y * factor:(y + tile) * factor,
                     x * factor:(x + tile) * factor].add(tiles_list[i] * mask)
        wacc = wacc.at[:, y * factor:(y + tile) * factor,
                       x * factor:(x + tile) * factor].add(mask)
        i += 1
    return acc / wacc


def decode_tiled(model: AutoencoderKL, variables, latents: jnp.ndarray,
                 tile: int = 64, stride: int = 48) -> jnp.ndarray:
    """Scaled latents -> [-1, 1] images, decoding (tile, tile) latent tiles
    sequentially. Bit-equal to `decode` when the latent fits one tile."""
    b, h, w, _ = latents.shape
    if h <= tile and w <= tile:
        return model.apply(variables, latents, method=AutoencoderKL.decode)
    f = model.upscale_factor
    pos = [(y, x) for y in tile_positions(h, tile, stride)
           for x in tile_positions(w, tile, stride)]
    stacked = jnp.stack([latents[:, y:y + tile, x:x + tile, :] for y, x in pos])
    dec = jax.lax.map(
        lambda t: model.apply(variables, t, method=AutoencoderKL.decode), stacked)
    return _stitch(list(dec), pos, tile, tile - stride, (h, w), f,
                   model.cfg.in_channels)


def encode_tiled(model: AutoencoderKL, variables, images: jnp.ndarray,
                 key: Optional[jax.Array] = None, tile: int = 64,
                 stride: int = 48) -> jnp.ndarray:
    """[-1, 1] images -> scaled latents over (tile*f, tile*f) image tiles.
    `tile`/`stride` are in LATENT units (matching decode_tiled)."""
    f = model.upscale_factor
    b, hi, wi, _ = images.shape
    h, w = hi // f, wi // f
    if h <= tile and w <= tile:
        return model.apply(variables, images, key, method=AutoencoderKL.encode)
    pos = [(y, x) for y in tile_positions(h, tile, stride)
           for x in tile_positions(w, tile, stride)]
    stacked = jnp.stack([images[:, y * f:(y + tile) * f, x * f:(x + tile) * f, :]
                         for y, x in pos])
    if key is not None:
        keys = jax.random.split(key, len(pos))
        enc = jax.lax.map(
            lambda tk: model.apply(variables, tk[0], tk[1],
                                   method=AutoencoderKL.encode),
            (stacked, keys))
    else:
        enc = jax.lax.map(
            lambda t: model.apply(variables, t, method=AutoencoderKL.encode),
            stacked)
    return _stitch(list(enc), pos, tile, tile - stride, (h, w), 1,
                   model.cfg.latent_channels)
