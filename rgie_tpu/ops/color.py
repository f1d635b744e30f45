"""Differentiable color-space conversions (NHWC, channels-last).

TPU-native re-design of the reference's mask-indexed torch implementations
(`/root/reference/src/baselines/image_transformations/color_transformations.py`):
the torch code builds boolean masks and writes through them (six scatter ops
per conversion), which maps terribly onto the VPU. Here every branch is a
`jnp.where` select over values computed with safe denominators, so XLA fuses
each conversion into a single elementwise kernel and gradients stay finite.

All functions take/return float arrays shaped (..., H, W, 3). Hue is in
[0, 1) (the reference divides by 6 at color_transformations.py:35).
"""

from __future__ import annotations

import jax.numpy as jnp

# Luminance weights from the reference (color_transformations.py:76) — NOT the
# ITU-R BT.601/709 weights; these come from the "look here" photo-filter work.
LUM_WEIGHTS = (0.27, 0.67, 0.06)
# ITU-R BT.601 weights used by kornia.color.rgb_to_grayscale (used by
# adjust_contrast_with_mean_subtraction).
GRAY_WEIGHTS = (0.299, 0.587, 0.114)


def rgb_to_lum(image: jnp.ndarray) -> jnp.ndarray:
    """Luminance (reference: color_transformations.py:74-77). Returns (..., H, W, 1)."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    lum = LUM_WEIGHTS[0] * r + LUM_WEIGHTS[1] * g + LUM_WEIGHTS[2] * b
    return lum[..., None]


def rgb_to_gray(image: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 grayscale (kornia.color.rgb_to_grayscale). Returns (..., H, W, 1)."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    gray = GRAY_WEIGHTS[0] * r + GRAY_WEIGHTS[1] * g + GRAY_WEIGHTS[2] * b
    return gray[..., None]


def lerp(a: jnp.ndarray, b: jnp.ndarray, length) -> jnp.ndarray:
    """Linear interpolation (reference: color_transformations.py:80-81)."""
    return (1 - length) * a + length * b


def _hue_from_rgb(rgb: jnp.ndarray, cmax: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Shared hue computation (reference: rgb2hs, color_transformations.py:25-36).

    Matches torch.max tie-breaking: the *first* channel achieving the max wins.
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    # Safe denominator: where delta == 0 the result is overridden to h = 0.
    safe = jnp.where(delta == 0, 1.0, delta)
    h_r = ((g - b) / safe) % 6.0
    h_g = (b - r) / safe + 2.0
    h_b = (r - g) / safe + 4.0
    idx = jnp.argmax(rgb, axis=-1)  # first-max, like torch.max(dim) indices
    h = jnp.where(idx == 0, h_r, jnp.where(idx == 1, h_g, h_b))
    h = jnp.where(delta == 0, 0.0, h)
    return h / 6.0


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> HSV with h, s, v in [0, 1] (reference: rgb2hsv_torch, color_transformations.py:18-22)."""
    cmax = jnp.max(rgb, axis=-1)
    cmin = jnp.min(rgb, axis=-1)
    delta = cmax - cmin
    h = _hue_from_rgb(rgb, cmax, delta)
    s = jnp.where(cmax == 0, 0.0, delta / jnp.where(cmax == 0, 1.0, cmax))
    return jnp.stack([h, s, cmax], axis=-1)


def rgb_to_hsl(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> HSL (reference: rgb2hsl_torch, color_transformations.py:4-15)."""
    cmax = jnp.max(rgb, axis=-1)
    cmin = jnp.min(rgb, axis=-1)
    delta = cmax - cmin
    h = _hue_from_rgb(rgb, cmax, delta)
    l = (cmax + cmin) / 2.0
    denom_lo = jnp.where(l == 0, 1.0, 2.0 * l)
    denom_hi = jnp.where(l == 1, 1.0, 2.0 - 2.0 * l)
    s = jnp.where(l <= 0.5, delta / denom_lo, delta / denom_hi)
    s = jnp.where((l == 0) | (l == 1), 0.0, s)
    return jnp.stack([h, s, l], axis=-1)


def _sector_to_rgb(h: jnp.ndarray, c: jnp.ndarray, x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Map (hue sector, chroma, x, match) to RGB (reference: hslv2rgb, color_transformations.py:63-71)."""
    # Reference casts h*6 to uint8 (trunc); h in [0, 1) so trunc == floor.
    idx = jnp.floor(h * 6.0).astype(jnp.int32) % 6
    o = jnp.zeros_like(c)
    # Sector table rows: (r, g, b) per idx 0..5.
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [c, x, o, o, x], c)
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [x, c, c, x, o], o)
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [o, o, x, c, c], x)
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """HSV -> RGB (reference: hsv2rgb_torch, color_transformations.py:39-48)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    c = v * s
    x = c * (1.0 - jnp.abs((h * 6.0) % 2.0 - 1.0))
    m = v - c
    return _sector_to_rgb(h, c, x, m)


def hsl_to_rgb(hsl: jnp.ndarray) -> jnp.ndarray:
    """HSL -> RGB (reference: hsl2rgb_torch, color_transformations.py:51-60)."""
    h, s, l = hsl[..., 0], hsl[..., 1], hsl[..., 2]
    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    x = c * (1.0 - jnp.abs((h * 6.0) % 2.0 - 1.0))
    m = l - c / 2.0
    return _sector_to_rgb(h, c, x, m)
