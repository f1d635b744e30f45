"""The ordered differentiable filter chain and its flat parameter vector.

TPU-native analog of the reference's dict-driven dispatcher
(`/root/reference/src/baselines/image_transformations/image_transformations.py:7-66`)
and vector packing (`src/optimize_image_param.py:121-292`). The chain order is
static (a Python tuple), so the whole edit traces into one fused XLA program;
the [0,1] clamp after every op matches apply_params:60. The reference's
"detach all intermediates except the last" (apply_params:60-64) only affects
the *returned list*, not the gradient through the chain — here we simply
return the final image.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import struct

from rgie_tpu.ops import filters as F

DEFAULT_TRANSFORMS: Tuple[str, ...] = (
    "exposure", "saturation", "tone", "color", "contrast", "sharp", "blur", "scale",
)

CURVE_KNOTS = 8


@struct.dataclass
class FilterParams:
    """Parameters of the active chain, channels-last layout.

    tone: (K, 1), color: (K, 3) — note the reference stores color as (3, K)
    row-major in the flat vector (optimize_image_param.py:193-194, 273); the
    pack/unpack helpers below preserve that exact flat layout.
    scale: (4,) = (sx, sy, cx, cy).
    """

    exposure: jnp.ndarray
    saturation: jnp.ndarray
    tone: jnp.ndarray
    color: jnp.ndarray
    contrast: jnp.ndarray
    sharp: jnp.ndarray
    blur: jnp.ndarray
    scale: jnp.ndarray


def init_params(dtype=jnp.float32) -> FilterParams:
    """Identity initialization (reference: optimize_image_param.py:121-209)."""
    return FilterParams(
        exposure=jnp.zeros((), dtype),
        saturation=jnp.ones((), dtype),
        tone=jnp.ones((CURVE_KNOTS, 1), dtype),
        color=jnp.ones((CURVE_KNOTS, 3), dtype),
        contrast=jnp.ones((), dtype),
        sharp=jnp.zeros((), dtype),
        blur=jnp.full((), 1e-4, dtype),
        scale=jnp.array([1.0, 1.0, 0.0, 0.0], dtype),
    )


NUM_PARAMS = 1 + 1 + CURVE_KNOTS + 3 * CURVE_KNOTS + 1 + 1 + 1 + 4  # = 41


def pack_params(p: FilterParams) -> jnp.ndarray:
    """Flatten to the reference's 41-dim vector layout
    (order: exposure, saturation, tone[8], color[3*8 row-major by channel],
    contrast, sharp, blur, scale[4] — optimize_image_param.py:121-209)."""
    return jnp.concatenate([
        p.exposure[None],
        p.saturation[None],
        p.tone[:, 0],
        p.color.T.reshape(-1),      # (K,3) -> (3,K) row-major == torch (3,8,1) flatten
        p.contrast[None],
        p.sharp[None],
        p.blur[None],
        p.scale,
    ])


def unpack_params(x: jnp.ndarray, input_size: int = 480) -> FilterParams:
    """Vector -> params with the reference's feasibility clamps
    (optimize_image_param.py:262-292): scale >= 1 (no black margins), center
    in [0, input_size], contrast gated at 0. Per-op range clamps (saturation,
    blur, sharp >= 0) live inside the ops themselves, as in the reference."""
    k = CURVE_KNOTS
    i = 0
    exposure = x[i]; i += 1
    saturation = x[i]; i += 1
    tone = x[i:i + k].reshape(k, 1); i += k
    color = x[i:i + 3 * k].reshape(3, k).T; i += 3 * k
    contrast = x[i]; i += 1
    sharp = x[i]; i += 1
    blur = x[i]; i += 1
    scale_raw = x[i:i + 4]; i += 4

    scale = jnp.concatenate([
        jnp.maximum(scale_raw[0:2], 1.0),
        jnp.clip(scale_raw[2:4], 0.0, float(input_size)),
    ])
    contrast = jnp.where(contrast < 0, 0.0, contrast)
    return FilterParams(exposure=exposure, saturation=saturation, tone=tone,
                        color=color, contrast=contrast, sharp=sharp,
                        blur=blur, scale=scale)


def apply_filter_chain(image: jnp.ndarray, params: FilterParams,
                       order: Tuple[str, ...] = DEFAULT_TRANSFORMS) -> jnp.ndarray:
    """Apply the ordered chain to an NHWC batch, clamping to [0,1] after every
    op (reference: apply_params, image_transformations.py:7-66)."""
    b = image.shape[0]
    ops = {
        "exposure": lambda im: F.apply_exposure(im, params.exposure),
        "saturation": lambda im: F.apply_saturation(im, params.saturation),
        "tone": lambda im: F.apply_tone_curve(im, params.tone),
        "color": lambda im: F.apply_color_curve(im, params.color),
        "contrast": lambda im: F.apply_contrast(im, params.contrast),
        "sharp": lambda im: F.apply_sharpness(im, params.sharp),
        "blur": lambda im: F.apply_gaussian_blur(im, params.blur),
        "scale": lambda im: F.apply_scale(im, jnp.broadcast_to(params.scale[None, :], (b, 4))),
        "gamma": lambda im: F.apply_gamma(im, getattr(params, "gamma")),
        "bright": lambda im: F.apply_brightness(im, getattr(params, "bright")),
        "bw": lambda im: F.apply_black_white(im, getattr(params, "bw")),
        "hue": lambda im: F.apply_hue(im, getattr(params, "hue")),
        "wb": lambda im: F.apply_white_balance(im, getattr(params, "wb")),
    }
    for name in order:
        image = jnp.clip(ops[name](image), 0.0, 1.0)
    return image


def edit_image(image: jnp.ndarray, x: jnp.ndarray, input_size: int = 480,
               order: Tuple[str, ...] = DEFAULT_TRANSFORMS) -> jnp.ndarray:
    """Full parametric edit: flat vector -> clamped params -> filter chain."""
    return apply_filter_chain(image, unpack_params(x, input_size), order)


# The pointwise prefix the Pallas kernel fuses (ops/pallas/pointwise_chain.py).
FUSED_PREFIX: Tuple[str, ...] = ("exposure", "saturation", "tone", "color", "contrast")


def apply_filter_chain_fused(image: jnp.ndarray, params: FilterParams,
                             order: Tuple[str, ...] = DEFAULT_TRANSFORMS
                             ) -> jnp.ndarray:
    """``apply_filter_chain`` with the Pallas fused pointwise kernel for the
    exposure->saturation->tone->color->contrast prefix (two HBM passes instead
    of six; 1.39x measured at 1024px batch 8), falling back to the pure-jnp
    chain when the order doesn't start with that prefix or the platform has
    no Pallas TPU backend. Semantics identical (tests diff the two); the
    differentiated edit keeps the pure-jnp ops so autodiff stays automatic."""
    if tuple(order[:len(FUSED_PREFIX)]) != FUSED_PREFIX:
        return apply_filter_chain(image, params, order)
    import jax

    if jax.devices()[0].platform != "tpu":
        return apply_filter_chain(image, params, order)
    from rgie_tpu.ops.pallas.pointwise_chain import fused_pointwise_chain

    # Row-tile size must divide H (the kernel's gray-mean reduction would
    # otherwise sum padding rows) AND be 8-divisible (Mosaic block rule:
    # sublane dim of a VMEM block must be a multiple of 8 or the whole H).
    # 128 rows max: at W=1024 a 256-row tile's working set (6 io buffers +
    # ~10 live HSV temporaries, f32) measured 16.05 MB — 56 KB over the
    # 16 MB VMEM scoped limit.
    rows = next((r for r in (128, 64, 32, 16, 8)
                 if image.shape[1] % r == 0), None)
    if rows is None:
        return apply_filter_chain(image, params, order)
    out = fused_pointwise_chain(image, params, rows=rows)
    return apply_filter_chain(out, params, tuple(order[len(FUSED_PREFIX):]))


def edit_image_fused(image: jnp.ndarray, x: jnp.ndarray, input_size: int = 480,
                     order: Tuple[str, ...] = DEFAULT_TRANSFORMS) -> jnp.ndarray:
    """Inference-path edit: flat vector -> params -> fused chain (see
    apply_filter_chain_fused)."""
    return apply_filter_chain_fused(image, unpack_params(x, input_size), order)
