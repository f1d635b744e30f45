"""Differentiable photo filters (NHWC), the TPU-native analog of the
reference's kornia-based op library
(`/root/reference/src/baselines/image_transformations/image_transformations.py`
and `img_trans_torch_diff.py`). Every op is a pure function of (image, param)
so the whole chain traces into one XLA program; parameter-range clamps follow
the reference exactly (they shape the loss landscape of the edit).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from rgie_tpu.ops import color as C
from rgie_tpu.ops import curves as curves_mod
from rgie_tpu.ops import geometry as G

_SIGMA_FLOOR = 1e-8  # guards exp(-(x/0)^2) NaNs; reference clamps sigma to >= 0 only


def _depthwise_conv(image: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D conv of NHWC image with an HW kernel, 'same' output (no padding added here)."""
    c = image.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], kernel.shape + (1, c))  # HWIO, I=1 per group
    return jax.lax.conv_general_dilated(
        image, k,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pad_reflect(image: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    return jnp.pad(image, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")


# ---------------------------------------------------------------------------
# Point ops
# ---------------------------------------------------------------------------


def apply_exposure(image: jnp.ndarray, p) -> jnp.ndarray:
    """im * 2**p, clamped (reference: img_trans_torch_diff.py:60-64)."""
    return jnp.clip(image * jnp.exp2(p), 0.0, 1.0)


def apply_brightness(image: jnp.ndarray, p) -> jnp.ndarray:
    """kornia.enhance.adjust_brightness(clip_output=True) with p clamped to [0,1]
    (reference: image_transformations.py:136-143)."""
    return jnp.clip(image + jnp.clip(p, 0.0, 1.0), 0.0, 1.0)


def apply_gamma(image: jnp.ndarray, p) -> jnp.ndarray:
    """kornia.enhance.adjust_gamma(gain=1) with p clamped to >= 0
    (reference: image_transformations.py:176-185). A 1e-7 floor (as in the
    hand-rolled variant, img_trans_torch_diff.py:73-76) keeps the gradient
    finite at zero pixels."""
    return jnp.power(jnp.maximum(image, 0.0) + 1e-7, jnp.maximum(p, 0.0))


def apply_contrast(image: jnp.ndarray, p) -> jnp.ndarray:
    """kornia.enhance.adjust_contrast_with_mean_subtraction
    (reference: image_transformations.py:101-109): scale around the mean of
    the ITU-601 grayscale image, clamped to [0,1]."""
    mean = jnp.mean(C.rgb_to_gray(image), axis=(-3, -2, -1), keepdims=True)
    return jnp.clip((image - mean) * p + mean, 0.0, 1.0)


def apply_saturation(image: jnp.ndarray, p) -> jnp.ndarray:
    """kornia.enhance.adjust_saturation with factor clamped to >= 0
    (reference: image_transformations.py:91-98): scale S in HSV space."""
    hsv = C.rgb_to_hsv(image)
    factor = jnp.maximum(p, 0.0)
    hsv = hsv.at[..., 1].set(hsv[..., 1] * factor)
    return C.hsv_to_rgb(hsv)


def apply_hue(image: jnp.ndarray, p) -> jnp.ndarray:
    """kornia.enhance.adjust_hue with p (radians) clamped to [-pi, pi]
    (reference: image_transformations.py:166-173): shift H in HSV space."""
    shift = jnp.clip(p, -math.pi, math.pi) / (2.0 * math.pi)
    hsv = C.rgb_to_hsv(image)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
    return C.hsv_to_rgb(hsv)


def apply_black_white(image: jnp.ndarray, p) -> jnp.ndarray:
    """lerp(im, luminance, p) (reference: img_trans_torch_diff.py:67-70)."""
    lum = C.rgb_to_lum(image)
    return C.lerp(image, jnp.broadcast_to(lum, image.shape), p)


def apply_white_balance(image: jnp.ndarray, p) -> jnp.ndarray:
    """lerp toward per-channel 0.5-mean balance, clamped
    (reference: img_trans_torch_diff.py:51-57)."""
    means = jnp.mean(image, axis=(-3, -2), keepdims=True) + 1e-9  # (..., 1, 1, C)
    balanced = image * (0.5 / means)
    return jnp.clip(C.lerp(image, balanced, p), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Curves
# ---------------------------------------------------------------------------


def apply_tone_curve(image: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Tone curve, p shaped (..., K, 1) in channels-last layout
    (reference: image_transformations.py:80-88)."""
    return curves_mod.apply_curve_adjustment(image, p)


def apply_color_curve(image: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Per-channel color curve, p shaped (..., K, 3)
    (reference: image_transformations.py:69-77)."""
    return curves_mod.apply_curve_adjustment(image, p)


# ---------------------------------------------------------------------------
# Neighborhood ops
# ---------------------------------------------------------------------------


def gaussian_kernel1d(sigma, size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 1D Gaussian taps, kornia-style (discrete sampling of the pdf)."""
    x = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    s = jnp.maximum(sigma, _SIGMA_FLOOR)
    g = jnp.exp(-0.5 * jnp.square(x / s))
    return g / jnp.sum(g)


def _band_matrix(g: jnp.ndarray, size: int) -> jnp.ndarray:
    """Banded (size, size) matrix T[i, reflect(i+k-pad)] += g[k]: the 1D
    reflect-padded correlation (kornia border: m < 0 -> -m, m >= size ->
    2*size-2-m) as a dense matmul operand.

    Built as K iota-compare one-hot accumulations — NO scatter (a
    sigma-dependent scatter build measured catastrophic under vmap: batched
    scatter unrolls on TPU and regressed the batch-8 bf16 edit step 2x) and
    NO dense mask constants (the previous (K, size, size) f32 trace-time
    masks were ~23 MB of HLO literal at the 480px edit and ~100 MB at 1024px
    — the axon remote-compile endpoint rejects constant-laden programs with
    HTTP 413; ADVICE r2). The one-hots come from broadcasted iota compares,
    so the HLO stays a few KB and XLA fuses the K adds."""
    ksize = int(g.shape[0])
    pad = ksize // 2
    rows = jnp.arange(size)
    cols = rows[None, :]
    t = jnp.zeros((size, size), g.dtype)
    for k in range(ksize):
        m = rows + (k - pad)
        m = jnp.where(m < 0, -m, m)
        m = jnp.where(m >= size, 2 * size - 2 - m, m)
        t = t + g[k] * (m[:, None] == cols).astype(g.dtype)
    return t


def apply_gaussian_blur(image: jnp.ndarray, p, kernel_size: int = 25) -> jnp.ndarray:
    """kornia.filters.gaussian_blur2d((25,25), sigma=clamp(p,0), reflect border),
    clamped to [0,1] (reference: image_transformations.py:112-123). Separable —
    and each 1D pass runs as a dense banded MATMUL on the MXU rather than a
    25-tap depthwise conv on the VPU: the device trace showed the depthwise
    pair + its transpose at ~43ms/edit-step (134 GFLOP/s, VPU-bound) while the
    equivalent (H,H)x(H,WC) matmuls are micro-seconds of MXU time (same trick
    as geometry.scale_about_center's separable-matmul zoom)."""
    sigma = jnp.maximum(p, 0.0)
    g = gaussian_kernel1d(sigma, kernel_size, image.dtype)
    pad = kernel_size // 2
    h, w = image.shape[1], image.shape[2]
    if min(h, w) > pad:
        th = _band_matrix(g, h)
        tw = _band_matrix(g, w)
        hp = jax.lax.Precision.HIGHEST
        out = jnp.einsum("ij,bjwc->biwc", th, image, precision=hp)
        out = jnp.einsum("ij,bhjc->bhic", tw, out, precision=hp)
    else:
        # tiny images: reflect pad would exceed the extent; keep the conv path
        padded = _pad_reflect(image, pad, pad)
        out = _depthwise_conv(padded, g[:, None])   # vertical
        out = _depthwise_conv(out, g[None, :])      # horizontal
    return jnp.clip(out, 0.0, 1.0)


# numpy (NOT jnp): a module-level device array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize in the
# multi-host CLIs (it must run before any backend init).
_SHARP_KERNEL = np.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0


def _sep_corr2d(image: jnp.ndarray, gv: jnp.ndarray, gh: jnp.ndarray) -> jnp.ndarray:
    """Reflect-padded 2D correlation with the rank-1 kernel gv[:, None] *
    gh[None, :], as two banded MXU matmuls (same trick as apply_gaussian_blur:
    the depthwise 3x3 conv pair + its transpose sat at ~110 GB/s VPU-bound in
    the device trace; the banded matmuls are MXU micro-seconds)."""
    h, w = image.shape[1], image.shape[2]
    th = _band_matrix(gv.astype(image.dtype), h)
    tw = _band_matrix(gh.astype(image.dtype), w)
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("ij,bjwc->biwc", th, image, precision=hp)
    return jnp.einsum("ij,bhjc->bhic", tw, out, precision=hp)


def apply_sharpness(image: jnp.ndarray, p) -> jnp.ndarray:
    """kornia.enhance.sharpness with factor clamped to >= 0
    (reference: image_transformations.py:188-195).

    Kornia convention (factor 0 == identity, matching the reference's
    identity-initialized param vector at optimize_image_param.py:134-136):
    out = im + factor * (degenerate - im), where degenerate is the PIL SMOOTH
    kernel applied to the interior (1-px border keeps original pixels).

    The SMOOTH kernel is rank-2 — (ones(3)⊗ones(3) + 4·δ⊗δ)/13 — so the
    depthwise conv becomes one separable box correlation plus 4·image.
    """
    factor = jnp.maximum(p, 0.0)
    h, w = image.shape[-3], image.shape[-2]
    if min(h, w) > 1:
        ones3 = jnp.ones((3,), image.dtype)
        degenerate = (_sep_corr2d(image, ones3, ones3) + 4.0 * image) / 13.0
        degenerate = jnp.clip(degenerate, 0.0, 1.0)
    else:
        padded = _pad_reflect(image, 1, 1)
        degenerate = jnp.clip(
            _depthwise_conv(padded, _SHARP_KERNEL.astype(image.dtype)), 0.0, 1.0)
    # Border mask: original pixels at the 1-px frame.
    yy = jnp.arange(h)
    xx = jnp.arange(w)
    interior = ((yy > 0) & (yy < h - 1))[:, None] & ((xx > 0) & (xx < w - 1))[None, :]
    degenerate = jnp.where(interior[..., None], degenerate, image)
    return image + factor * (degenerate - image)


def apply_sharpening_conv(image: jnp.ndarray, p) -> jnp.ndarray:
    """Hand-rolled edge-boost sharpening (reference: img_trans_torch_diff.py:79-89):
    im + p * |grad| * im with Sobel-style edge magnitude, clamped.

    Sobel kernels are rank-1 ([1,2,1]ᵀ⊗[-1,0,1] and its transpose), so both
    gradients run as separable banded matmuls (see _sep_corr2d)."""
    smooth = jnp.array([1.0, 2.0, 1.0], dtype=image.dtype)
    diff = jnp.array([-1.0, 0.0, 1.0], dtype=image.dtype)
    h, w = image.shape[1], image.shape[2]
    if min(h, w) > 1:
        gx = _sep_corr2d(image, smooth, diff)
        gy = _sep_corr2d(image, diff, smooth)
    else:
        kx = smooth[:, None] * diff[None, :]
        padded = _pad_reflect(image, 1, 1)
        gx = _depthwise_conv(padded, kx)
        gy = _depthwise_conv(padded, kx.T)
    edges = jnp.sqrt(gx * gx + gy * gy + 1e-7)
    return jnp.clip(image + p * edges * image, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Geometric ops
# ---------------------------------------------------------------------------


def apply_affine(image: jnp.ndarray, matrices: jnp.ndarray) -> jnp.ndarray:
    """kornia affine warp with border padding, clamped
    (reference: image_transformations.py:198-206)."""
    return jnp.clip(G.warp_affine(image, matrices, padding_mode="border"), 0.0, 1.0)


def apply_scale(image: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """kornia scale; p is (B, 2) = (sx, sy) or (B, 4) = (sx, sy, cx, cy)
    (reference: image_transformations.py:209-221)."""
    if p.shape[-1] == 4:
        return G.scale_about_center(image, p[:, 0:2], p[:, 2:4])
    return G.scale_about_center(image, p[:, 0:2])
