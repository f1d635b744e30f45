"""Differentiable geometric image ops (NHWC): bilinear warping, resize, crops.

Replaces the reference's kornia geometry calls
(`/root/reference/src/baselines/image_transformations/image_transformations.py:198-221`)
and the torchvision Resize/CenterCrop preprocessing used throughout the entry
points. Warps are gather-based bilinear sampling in pixel coordinates
(align_corners=True convention, matching kornia's pixel-unit affine matrices).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample a single HWC image at float pixel coords (x, y) of any shape.

    padding_mode: 'zeros' (out-of-bounds reads 0) or 'border' (clamp to edge),
    the two modes the reference uses (kornia scale -> zeros, affine -> border,
    image_transformations.py:205,221).
    """
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = image[yc, xc]  # (..., C)
        if padding_mode == "zeros":
            valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            vals = jnp.where(valid[..., None], vals, 0.0)
        return vals

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wxe = wx[..., None]
    wye = wy[..., None]
    top = v00 * (1 - wxe) + v01 * wxe
    bot = v10 * (1 - wxe) + v11 * wxe
    return top * (1 - wye) + bot * wye


def _dst_grid(h: int, w: int, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    return jnp.meshgrid(xs, ys)  # (xx, yy) each (H, W)


def warp_affine(image: jnp.ndarray, matrix: jnp.ndarray, padding_mode: str = "zeros") -> jnp.ndarray:
    """Warp an NHWC batch by per-image 2x3 matrices mapping src -> dst pixels.

    Follows the kornia/OpenCV convention used by
    ``kornia.geometry.transform.affine`` (image_transformations.py:198-206):
    the matrix maps source to destination coordinates; sampling inverts it.
    """
    def warp_one(img, m):
        h, w = img.shape[0], img.shape[1]
        xx, yy = _dst_grid(h, w, img.dtype)
        a = m[:, :2]                      # 2x2 linear part
        t = m[:, 2]                       # translation
        det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / det
        dx = xx - t[0]
        dy = yy - t[1]
        sx = inv[0, 0] * dx + inv[0, 1] * dy
        sy = inv[1, 0] * dx + inv[1, 1] * dy
        return bilinear_sample(img, sx, sy, padding_mode)

    return jax.vmap(warp_one)(image, matrix)


def _axis_interp_matrix(src_coords: jnp.ndarray, src_len: int) -> jnp.ndarray:
    """Bilinear interpolation matrix M (out_len, src_len) with zeros padding:
    M[i, j] = max(0, 1 - |src_coords[i] - j|). Exactly equals gather-based
    bilinear sampling with 'zeros' out-of-bounds."""
    taps = jnp.arange(src_len, dtype=src_coords.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src_coords[:, None] - taps[None, :]))


def scale_about_center(image: jnp.ndarray, scale_xy: jnp.ndarray,
                       center_xy: jnp.ndarray = None) -> jnp.ndarray:
    """Zoom an NHWC batch by per-image (sx, sy) about (cx, cy) pixel centers.

    Equivalent to kornia.geometry.transform.scale (zeros padding): the sampled
    source coord is c + (dst - c)/s (image_transformations.py:209-221). With
    s >= 1 (the chain clamps it) this is a zoom-in with no black margins.

    TPU-first implementation: an axis-aligned zoom is SEPARABLE, so instead of
    gather-based bilinear sampling (whose scatter gradients dominated the
    whole edit step — 4 x 21ms/step at 256² b8 on v5e, 46% of total) it runs
    as two small dense interpolation matmuls on the MXU; the gradient is the
    transposed matmuls plus elementwise flow into the matrix entries.
    """
    def scale_one(img, s, c):
        h, w = img.shape[0], img.shape[1]
        if c is None:
            c = jnp.array([(w - 1) / 2.0, (h - 1) / 2.0], dtype=img.dtype)
        sx_safe = jnp.where(jnp.abs(s[0]) < 1e-12, 1e-12, s[0])
        sy_safe = jnp.where(jnp.abs(s[1]) < 1e-12, 1e-12, s[1])
        ys = jnp.arange(h, dtype=img.dtype)
        xs = jnp.arange(w, dtype=img.dtype)
        src_y = c[1] + (ys - c[1]) / sy_safe
        src_x = c[0] + (xs - c[0]) / sx_safe
        row_m = _axis_interp_matrix(src_y, h)   # (H, H)
        col_m = _axis_interp_matrix(src_x, w)   # (W, W)
        tmp = jnp.einsum("oi,iwc->owc", row_m, img,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("pj,ojc->opc", col_m, tmp,
                          precision=jax.lax.Precision.HIGHEST)

    if center_xy is None:
        return jax.vmap(lambda i, s: scale_one(i, s, None))(image, scale_xy)
    return jax.vmap(scale_one)(image, scale_xy, center_xy)


# ---------------------------------------------------------------------------
# Preprocessing: resize / crops (torchvision-transform equivalents)
# ---------------------------------------------------------------------------


def resize(image: jnp.ndarray, size: Tuple[int, int], antialias: bool = True) -> jnp.ndarray:
    """Bilinear resize of an NHWC batch (or HWC image) to (H, W)."""
    batched = image.ndim == 4
    shape = (image.shape[0], size[0], size[1], image.shape[-1]) if batched else (size[0], size[1], image.shape[-1])
    return jax.image.resize(image, shape, method="linear", antialias=antialias)


def resize_shorter_side(image: jnp.ndarray, size: int, antialias: bool = True) -> jnp.ndarray:
    """torchvision.transforms.Resize(int): scale so the shorter side == size.

    Shapes must be static under jit; aspect is resolved at trace time.
    """
    h, w = (image.shape[1], image.shape[2]) if image.ndim == 4 else (image.shape[0], image.shape[1])
    if h <= w:
        new_h, new_w = size, max(1, round(w * size / h))
    else:
        new_h, new_w = max(1, round(h * size / w)), size
    return resize(image, (new_h, new_w), antialias=antialias)


def center_crop(image: jnp.ndarray, crop: int) -> jnp.ndarray:
    """torchvision.transforms.CenterCrop(crop) for NHWC/HWC, crop <= H, W."""
    h, w = (image.shape[1], image.shape[2]) if image.ndim == 4 else (image.shape[0], image.shape[1])
    top = (h - crop) // 2
    left = (w - crop) // 2
    if image.ndim == 4:
        return image[:, top:top + crop, left:left + crop, :]
    return image[top:top + crop, left:left + crop, :]


def ten_crop_offsets(h: int, w: int, crop: int) -> Tuple[Tuple[int, int], ...]:
    """Deterministic 10-crop grid replacing the reference's seed-dependent
    RandomCrop x10 (`src/baselines/models/utilities/ReplicateAndCrop.py:23`).

    The reference samples 10 *random* crops inside the loss path, making its
    results seed-dependent; we use a fixed well-spread grid (4 corners, 4 edge
    midpoints, center, and one interior point) so edits are reproducible.
    Documented deviation — use ``replicate_and_crop(key=...)`` for parity with
    the stochastic behavior.
    """
    my, mx = h - crop, w - crop
    return (
        (0, 0), (0, mx), (my, 0), (my, mx),            # corners
        (my // 2, mx // 2),                            # center
        (0, mx // 2), (my // 2, 0), (my, mx // 2), (my // 2, mx),  # edge midpoints
        (my // 4, 3 * mx // 4),                        # interior
    )


def replicate_and_crop(image: jnp.ndarray, crop: int, num_replications: int = 10,
                       key: jax.Array = None) -> jnp.ndarray:
    """Replicate each image N times with distinct crops: (B, H, W, C) ->
    (B * N, crop, crop, C), row-major in (image, replica) order like the
    reference (ReplicateAndCrop.py:40-43)."""
    b, h, w, c = image.shape
    if key is None:
        # Static offsets: plain lax.slice per crop; XLA's autodiff (pad-based
        # transpose of slice) measured faster than a hand-written VJP.
        offsets = ten_crop_offsets(h, w, crop)[:num_replications]
        crops = [jax.lax.slice(image, (0, t, l, 0), (b, t + crop, l + crop, c))
                 for (t, l) in offsets]
        return jnp.stack(crops, axis=1).reshape(b * len(offsets), crop, crop, c)

    tops = jax.random.randint(key, (num_replications,), 0, h - crop + 1)
    lefts = jax.random.randint(jax.random.fold_in(key, 1), (num_replications,), 0, w - crop + 1)

    def crop_one(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left, 0), (crop, crop, c))

    # (N, B, crop, crop, C) -> (B, N, ...) -> (B*N, ...)
    crops = jax.vmap(lambda t, l: jax.vmap(lambda im: crop_one(im, t, l))(image))(tops, lefts)
    return crops.transpose(1, 0, 2, 3, 4).reshape(b * num_replications, crop, crop, c)


def space_to_depth(image: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/block, W/block, block*block*C); channel order is
    (row-phase, col-phase, C) major-to-minor, matching the kernel fold in
    rgie_tpu.models.resnet.StemConv."""
    b, h, w, c = image.shape
    x = image.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // block, w // block, block * block * c)


def tencrop_offsets_even(h: int, w: int, crop: int,
                         num_replications: int = 10, block: int = 2) -> bool:
    """True iff every deterministic ten-crop offset (and the extents) is
    divisible by ``block`` — the condition for taking the crops in
    space-to-depth(block) space. Holds at the production 480/448 geometry
    (offsets 0/8/16/24/32) for both block=2 and block=4."""
    if h % block or w % block or crop % block:
        return False
    return all(t % block == 0 and l % block == 0
               for (t, l) in ten_crop_offsets(h, w, crop)[:num_replications])


def replicate_and_crop_s2d(image_s2d: jnp.ndarray, crop: int, h: int, w: int,
                           num_replications: int = 10,
                           block: int = 2) -> jnp.ndarray:
    """`replicate_and_crop` taken in space-to-depth(block) space: when the
    deterministic ten-crop offsets are block-aligned, a crop at (t, l) of
    size `crop` in image space is exactly the crop at (t/block, l/block) of
    size crop/block of the s2d tensor. (B, h/b, w/b, b²C) -> (B*N, crop/b,
    crop/b, b²C), same (image, replica) order as replicate_and_crop."""
    b, _, _, cb = image_s2d.shape
    offsets = ten_crop_offsets(h, w, crop)[:num_replications]
    cs = crop // block
    crops = [jax.lax.slice(image_s2d, (0, t // block, l // block, 0),
                           (b, t // block + cs, l // block + cs, cb))
             for (t, l) in offsets]
    return jnp.stack(crops, axis=1).reshape(b * len(offsets), cs, cs, cb)


def mean_replicated(x: jnp.ndarray, num_replications: int = 10) -> jnp.ndarray:
    """Average model outputs over replicas: (B*N, D) -> (B, D)
    (reference: MeanReplicatedCrops.py:18-27)."""
    b = x.shape[0] // num_replications
    return x.reshape(b, num_replications, *x.shape[1:]).mean(axis=1)
