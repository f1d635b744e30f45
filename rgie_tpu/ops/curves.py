"""Piecewise-linear tone/color curve adjustment.

TPU-native rewrite of the reference's per-knot Python loop
(`/root/reference/src/baselines/image_transformations/img_trans_torch_diff.py:6-19`):
the torch code iterates `curve_steps` times accumulating into a running
tensor; here the knot dimension is a broadcast axis so the whole curve is one
fused VPU expression (and a single Pallas kernel in the fused edit path).
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_curve_adjustment(image: jnp.ndarray, param: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
    """Apply a piecewise-linear curve with K knots to an NHWC image.

    ``param`` has shape (..., K, C) where C broadcasts against the image
    channel dim (C=1 for the tone curve, C=3 for the color curve) — the
    channels-last analog of the reference's (B, C, K, 1) layout
    (image_transformations.py:69-88).

    For pixel value p in [0, 1]: out = sum_i clip(p - i/K, 0, 1/K) * w_i,
    clamped to <= 1 unless ``normalize`` (img_trans_torch_diff.py:6-19).
    """
    k = param.shape[-2]
    knots = jnp.arange(k, dtype=image.dtype) / k              # (K,)
    # (..., H, W, 1, C) - (K, 1) -> (..., H, W, K, C)
    segments = jnp.clip(image[..., None, :] - knots[:, None], 0.0, 1.0 / k)
    # param (..., K, C) broadcasts as (..., 1, 1, K, C) against (N, H, W, K, C).
    ndim_gap = segments.ndim - param.ndim
    w = param.reshape(param.shape[:-2] + (1,) * ndim_gap + param.shape[-2:]) if ndim_gap > 0 else param
    total = jnp.sum(segments * w, axis=-2)
    if normalize:
        curve_sum = jnp.sum(param, axis=-2, keepdims=False) + 1e-9
        total = total * (k / curve_sum)
    else:
        total = jnp.minimum(total, 1.0)
    return total
