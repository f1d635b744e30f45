"""Pallas TPU kernel: the fused pointwise filter sub-chain.

The parametric chain's pointwise ops (exposure -> saturation(HSV) -> tone
curve -> color curve -> contrast) each round-trip the image through HBM when
run as separate ops; at 1024² that's ~6 passes x 12MB. Here ONE Pallas pass
over row tiles computes the whole prefix in VMEM and simultaneously reduces
the per-image 601-gray sum the contrast op needs; contrast itself is then a
single fused multiply-add pass. Two HBM passes total.

Used on inference paths (final 1024px re-render, run_img_trans batch
transforms); the differentiated edit keeps the pure-jnp ops so autodiff stays
automatic. Semantics match rgie_tpu.ops.filters exactly — tests diff the two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgie_tpu.ops.chain import CURVE_KNOTS, FilterParams
from rgie_tpu.ops.color import GRAY_WEIGHTS

# packed params: [exposure, saturation, tone(8), color(24)]
_P_LEN = 2 + CURVE_KNOTS + 3 * CURVE_KNOTS


def _pack(params: FilterParams) -> jnp.ndarray:
    return jnp.concatenate([
        params.exposure[None], params.saturation[None],
        params.tone[:, 0], params.color.T.reshape(-1),
    ]).astype(jnp.float32)[None]  # (1, P)


def _prefix_kernel(p_ref, r_ref, g_ref, b_ref, ro_ref, go_ref, bo_ref, gsum_ref):
    k = CURVE_KNOTS
    # SMEM refs only support SCALAR loads on real Mosaic (interpret mode is
    # laxer) — index every parameter individually; indices are static.
    exposure = p_ref[0, 0]
    saturation = jnp.maximum(p_ref[0, 1], 0.0)

    r = r_ref[0]
    g = g_ref[0]
    b = b_ref[0]

    # exposure: x * 2^p, clamp (filters.apply_exposure)
    scale = jnp.exp2(exposure)
    r = jnp.clip(r * scale, 0.0, 1.0)
    g = jnp.clip(g * scale, 0.0, 1.0)
    b = jnp.clip(b * scale, 0.0, 1.0)

    # saturation via HSV (filters.apply_saturation), clamp
    cmax = jnp.maximum(jnp.maximum(r, g), b)
    cmin = jnp.minimum(jnp.minimum(r, g), b)
    delta = cmax - cmin
    safe = jnp.where(delta == 0, 1.0, delta)
    h_r = ((g - b) / safe) % 6.0
    h_g = (b - r) / safe + 2.0
    h_b = (r - g) / safe + 4.0
    is_r = (r >= g) & (r >= b)
    is_g = jnp.logical_and(jnp.logical_not(is_r), g >= b)
    h6 = jnp.where(is_r, h_r, jnp.where(is_g, h_g, h_b))
    h6 = jnp.where(delta == 0, 0.0, h6)
    s = jnp.where(cmax == 0, 0.0, delta / jnp.where(cmax == 0, 1.0, cmax))
    s = s * saturation
    c = cmax * s
    x = c * (1.0 - jnp.abs(h6 % 2.0 - 1.0))
    m = cmax - c
    sector = jnp.floor(h6).astype(jnp.int32) % 6
    o = jnp.zeros_like(c)
    sel = [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4]

    def pick(vals, default):
        # jnp.select lowers through argmax, which Mosaic can't do on TPU —
        # nested elementwise where() is the same math on the VPU.
        out = default
        for cond, val in zip(reversed(sel), reversed(vals)):
            out = jnp.where(cond, val, out)
        return out

    r = jnp.clip(pick([c, x, o, o, x], c) + m, 0.0, 1.0)
    g = jnp.clip(pick([x, c, c, x, o], o) + m, 0.0, 1.0)
    b = jnp.clip(pick([o, o, x, c, c], x) + m, 0.0, 1.0)

    # tone (shared weights) then per-channel color curves, clamped
    def curve(v, base, ch):
        total = jnp.zeros_like(v)
        for i in range(k):
            total = total + jnp.clip(v - i / k, 0.0, 1.0 / k) * p_ref[0, base + ch * k + i]
        return jnp.clip(jnp.minimum(total, 1.0), 0.0, 1.0)

    r = curve(r, 2, 0)
    g = curve(g, 2, 0)
    b = curve(b, 2, 0)
    r = curve(r, 2 + k, 0)
    g = curve(g, 2 + k, 1)
    b = curve(b, 2 + k, 2)

    ro_ref[0] = r
    go_ref[0] = g
    bo_ref[0] = b
    gray = GRAY_WEIGHTS[0] * r + GRAY_WEIGHTS[1] * g + GRAY_WEIGHTS[2] * b
    # The (B, n_tiles) sums live in SMEM as ONE whole-array block (Mosaic
    # requires SMEM blocks be (8,128)-divisible or equal to the array dims —
    # a (1,1) per-tile block fails to lower); each grid step writes its cell.
    gsum_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(gray)


@functools.partial(jax.jit, static_argnames=("rows",))
def fused_pointwise_chain(image: jnp.ndarray, params: FilterParams,
                          rows: int = 128) -> jnp.ndarray:
    """exposure->saturation->tone->color->contrast on (B, H, W, 3) in [0,1],
    fused into two HBM passes. H should be a multiple of ``rows``."""
    b, h, w, _ = image.shape
    n_tiles = pl.cdiv(h, rows)
    packed = _pack(params)

    img_spec = pl.BlockSpec((1, rows, w), lambda ib, ih: (ib, ih, 0),
                            memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, _P_LEN), lambda ib, ih: (0, 0),
                          memory_space=pltpu.SMEM)
    sum_spec = pl.BlockSpec((b, n_tiles), lambda ib, ih: (0, 0),
                            memory_space=pltpu.SMEM)

    r, g, bb = image[..., 0], image[..., 1], image[..., 2]
    ro, go, bo, gsums = pl.pallas_call(
        _prefix_kernel,
        grid=(b, n_tiles),
        in_specs=[p_spec, img_spec, img_spec, img_spec],
        out_specs=(img_spec, img_spec, img_spec, sum_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), image.dtype),
            jax.ShapeDtypeStruct((b, h, w), image.dtype),
            jax.ShapeDtypeStruct((b, h, w), image.dtype),
            jax.ShapeDtypeStruct((b, n_tiles), jnp.float32),
        ),
    )(packed, r, g, bb)

    out = jnp.stack([ro, go, bo], axis=-1)
    mean = jnp.sum(gsums, axis=1) / (h * w)                    # (B,)
    contrast = jnp.where(params.contrast < 0, 0.0, params.contrast)
    mean = mean[:, None, None, None]
    return jnp.clip((out - mean) * contrast + mean, 0.0, 1.0)  # one fused pass


def reference_pointwise_chain(image: jnp.ndarray, params: FilterParams) -> jnp.ndarray:
    """The same sub-chain via the pure-jnp ops (parity oracle)."""
    from rgie_tpu.ops import filters as F

    x = jnp.clip(F.apply_exposure(image, params.exposure), 0.0, 1.0)
    x = jnp.clip(F.apply_saturation(x, params.saturation), 0.0, 1.0)
    x = jnp.clip(F.apply_tone_curve(x, params.tone), 0.0, 1.0)
    x = jnp.clip(F.apply_color_curve(x, params.color), 0.0, 1.0)
    contrast = jnp.where(params.contrast < 0, 0.0, params.contrast)
    x = jnp.clip(F.apply_contrast(x, contrast), 0.0, 1.0)
    return x
