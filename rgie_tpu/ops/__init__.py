"""Differentiable image-op library (NHWC, pure jnp; Pallas kernels for hot ops)."""

from rgie_tpu.ops.chain import (
    DEFAULT_TRANSFORMS,
    NUM_PARAMS,
    FilterParams,
    apply_filter_chain,
    edit_image,
    init_params,
    pack_params,
    unpack_params,
)
from rgie_tpu.ops.color import (
    hsl_to_rgb,
    hsv_to_rgb,
    lerp,
    rgb_to_gray,
    rgb_to_hsl,
    rgb_to_hsv,
    rgb_to_lum,
)
from rgie_tpu.ops.curves import apply_curve_adjustment
from rgie_tpu.ops.geometry import (
    bilinear_sample,
    center_crop,
    mean_replicated,
    replicate_and_crop,
    resize,
    resize_shorter_side,
    scale_about_center,
    ten_crop_offsets,
    warp_affine,
)
