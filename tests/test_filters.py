"""Tests for the differentiable filter library: identity-at-init, numpy
oracles, and gradient health. Reference semantics:
/root/reference/src/baselines/image_transformations/{image_transformations,img_trans_torch_diff}.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.ops import chain as CH
from rgie_tpu.ops import filters as F
from rgie_tpu.ops import curves


def _img(rng, shape=(1, 16, 16, 3)):
    return jnp.asarray(rng.uniform(0.05, 0.95, size=shape).astype(np.float32))


# --- identity at init values (the reference's x0 is the identity edit) -----

def test_exposure_zero_identity(rng):
    im = _img(rng)
    np.testing.assert_allclose(np.asarray(F.apply_exposure(im, 0.0)), np.asarray(im), atol=1e-6)


def test_exposure_doubles(rng):
    im = _img(rng) * 0.4
    np.testing.assert_allclose(np.asarray(F.apply_exposure(im, 1.0)), np.asarray(im) * 2, atol=1e-5)


def test_saturation_one_identity(rng):
    im = _img(rng)
    np.testing.assert_allclose(np.asarray(F.apply_saturation(im, 1.0)), np.asarray(im), atol=1e-5)


def test_saturation_zero_is_value_channel(rng):
    im = _img(rng)
    out = np.asarray(F.apply_saturation(im, 0.0))
    expect = np.broadcast_to(np.asarray(im).max(-1, keepdims=True), im.shape)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_contrast_one_identity(rng):
    im = _img(rng)
    np.testing.assert_allclose(np.asarray(F.apply_contrast(im, 1.0)), np.asarray(im), atol=1e-6)


def test_contrast_zero_is_gray_mean(rng):
    im = _img(rng)
    out = np.asarray(F.apply_contrast(im, 0.0))
    a = np.asarray(im)
    mean = (0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]).mean()
    np.testing.assert_allclose(out, mean, atol=1e-5)


def test_tone_curve_ones_identity(rng):
    im = _img(rng)
    p = jnp.ones((8, 1))
    np.testing.assert_allclose(np.asarray(F.apply_tone_curve(im, p)), np.asarray(im), atol=1e-6)


def test_color_curve_ones_identity(rng):
    im = _img(rng)
    p = jnp.ones((8, 3))
    np.testing.assert_allclose(np.asarray(F.apply_color_curve(im, p)), np.asarray(im), atol=1e-6)


def test_curve_oracle(rng):
    """Knot-loop numpy oracle of img_trans_torch_diff.py:6-19."""
    im = np.asarray(_img(rng))
    p = rng.uniform(0.2, 2.5, size=(8, 3)).astype(np.float32)
    total = np.zeros_like(im)
    for i in range(8):
        total += np.clip(im - i / 8, 0, 1 / 8) * p[i]
    expect = np.minimum(total, 1.0)
    out = np.asarray(curves.apply_curve_adjustment(jnp.asarray(im), jnp.asarray(p)))
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_curve_normalize(rng):
    im = np.asarray(_img(rng))
    p = rng.uniform(0.2, 2.5, size=(8, 1)).astype(np.float32)
    total = np.zeros_like(im)
    for i in range(8):
        total += np.clip(im - i / 8, 0, 1 / 8) * p[i]
    expect = total * 8 / (p.sum() + 1e-9)
    out = np.asarray(curves.apply_curve_adjustment(jnp.asarray(im), jnp.asarray(p), normalize=True))
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_sharp_zero_identity(rng):
    im = _img(rng)
    np.testing.assert_allclose(np.asarray(F.apply_sharpness(im, 0.0)), np.asarray(im), atol=1e-6)


def test_sharp_keeps_border(rng):
    im = _img(rng)
    out = np.asarray(F.apply_sharpness(im, 1.0))
    a = np.asarray(im)
    np.testing.assert_allclose(out[:, 0, :, :], a[:, 0, :, :], atol=1e-6)
    np.testing.assert_allclose(out[:, :, -1, :], a[:, :, -1, :], atol=1e-6)
    assert not np.allclose(out[:, 1:-1, 1:-1], a[:, 1:-1, 1:-1])


def test_sharp_interior_oracle():
    """factor=1 interior equals the 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13 smoothing."""
    rng = np.random.default_rng(3)
    a = rng.uniform(0.2, 0.8, size=(1, 6, 6, 3)).astype(np.float32)
    out = np.asarray(F.apply_sharpness(jnp.asarray(a), 1.0))
    k = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], dtype=np.float32) / 13
    for c in range(3):
        for y in range(1, 5):
            for x in range(1, 5):
                expect = (a[0, y - 1:y + 2, x - 1:x + 2, c] * k).sum()
                np.testing.assert_allclose(out[0, y, x, c], expect, atol=1e-5)


def test_blur_tiny_sigma_identity(rng):
    im = _img(rng)
    np.testing.assert_allclose(np.asarray(F.apply_gaussian_blur(im, 1e-4)), np.asarray(im), atol=1e-5)


def test_blur_large_sigma_smooths(rng):
    im = _img(rng, (1, 32, 32, 3))
    out = np.asarray(F.apply_gaussian_blur(im, 4.0))
    assert out.std() < np.asarray(im).std()
    # Blur preserves mean approximately (reflect padding).
    np.testing.assert_allclose(out.mean(), np.asarray(im).mean(), atol=5e-3)


def test_blur_gaussian_oracle():
    """Delta image through the blur == the (separable) 2D gaussian kernel."""
    sigma = 2.0
    im = jnp.zeros((1, 25, 25, 1)).at[0, 12, 12, 0].set(1.0)
    out = np.asarray(F.apply_gaussian_blur(im, sigma))[0, :, :, 0]
    x = np.arange(25) - 12
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    expect = np.outer(g, g)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_scale_one_identity(rng):
    im = _img(rng)
    p = jnp.array([[1.0, 1.0, 7.5, 7.5]])
    np.testing.assert_allclose(np.asarray(F.apply_scale(im, p)), np.asarray(im), atol=1e-6)


def test_scale_two_zooms_center():
    # A centered bright square, zoomed 2x about the center, grows.
    im = jnp.zeros((1, 16, 16, 1)).at[:, 6:10, 6:10, :].set(1.0)
    out = np.asarray(F.apply_scale(im, jnp.array([[2.0, 2.0, 7.5, 7.5]])))
    assert out.sum() > np.asarray(im).sum() * 2.5


def test_brightness(rng):
    im = _img(rng) * 0.5
    out = np.asarray(F.apply_brightness(im, 0.2))
    np.testing.assert_allclose(out, np.clip(np.asarray(im) + 0.2, 0, 1), atol=1e-6)


def test_gamma_identity(rng):
    im = _img(rng)
    np.testing.assert_allclose(np.asarray(F.apply_gamma(im, 1.0)), np.asarray(im), atol=1e-5)


def test_black_white(rng):
    im = _img(rng)
    out = np.asarray(F.apply_black_white(im, 1.0))
    a = np.asarray(im)
    lum = 0.27 * a[..., 0] + 0.67 * a[..., 1] + 0.06 * a[..., 2]
    for c in range(3):
        np.testing.assert_allclose(out[..., c], lum, atol=1e-6)


def test_white_balance_identity_at_zero(rng):
    im = _img(rng)
    np.testing.assert_allclose(np.asarray(F.apply_white_balance(im, 0.0)), np.asarray(im), atol=1e-6)


def test_hue_zero_identity(rng):
    im = _img(rng)
    np.testing.assert_allclose(np.asarray(F.apply_hue(im, 0.0)), np.asarray(im), atol=1e-5)


def test_hue_two_pi_thirds_rotates_channels():
    red = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(0.8)
    out = np.asarray(F.apply_hue(red, 2 * np.pi / 3))
    np.testing.assert_allclose(out[..., 1], 0.8, atol=1e-5)  # red -> green
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-5)


# --- chain-level tests ------------------------------------------------------

def test_chain_init_is_identity(rng):
    im = _img(rng, (1, 24, 24, 3))
    x0 = CH.pack_params(CH.init_params())
    assert x0.shape == (CH.NUM_PARAMS,)
    out = CH.edit_image(im, x0, input_size=24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-4)


def test_pack_unpack_round_trip(rng):
    x = jnp.asarray(rng.uniform(1.0, 2.0, size=(CH.NUM_PARAMS,)).astype(np.float32))
    p = CH.unpack_params(x, input_size=480)
    x2 = CH.pack_params(p)
    # scale >= 1 / center clamps are inside the feasible region here.
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)


def test_unpack_clamps():
    x = np.zeros(CH.NUM_PARAMS, dtype=np.float32)
    x[0] = 0.3          # exposure
    x[-4:] = [0.5, -2.0, -5.0, 999.0]   # scale raw
    x[34] = -1.0        # contrast < 0 -> 0
    p = CH.unpack_params(jnp.asarray(x), input_size=480)
    np.testing.assert_allclose(np.asarray(p.scale), [1.0, 1.0, 0.0, 480.0])
    assert float(p.contrast) == 0.0


def test_color_vector_layout_matches_reference():
    """The 24 color entries are channel-major (torch (3,8,1) flatten)."""
    x = np.zeros(CH.NUM_PARAMS, dtype=np.float32)
    color_start = 2 + 8
    x[color_start:color_start + 8] = 1.0        # channel 0 (red curve) only
    p = CH.unpack_params(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(p.color[:, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(p.color[:, 1:]), 0.0)


def test_chain_gradients_finite(rng):
    im = _img(rng, (1, 16, 16, 3))
    x0 = CH.pack_params(CH.init_params())

    def loss(x):
        return jnp.sum(CH.edit_image(im, x, input_size=16))

    g = np.asarray(jax.grad(loss)(x0))
    assert g.shape == (CH.NUM_PARAMS,)
    assert np.all(np.isfinite(g))
    # Exposure must move the output at init.
    assert abs(g[0]) > 1e-3


def test_chain_jit_compiles(rng):
    im = _img(rng, (1, 16, 16, 3))
    x0 = CH.pack_params(CH.init_params())
    f = jax.jit(lambda x: CH.edit_image(im, x, input_size=16))
    out = f(x0)
    assert out.shape == im.shape


def test_blur_matmul_path_matches_depthwise():
    """The MXU banded-matmul blur must equal the depthwise-conv formulation
    bit-for-bit up to reassociation (same taps, same reflect border)."""
    import numpy as np

    from rgie_tpu.ops import filters as F

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 48, 64, 3)).astype(np.float32))
    for p in (0.0, 0.7, 2.5):
        new = F.apply_gaussian_blur(img, jnp.asarray(p))
        g = F.gaussian_kernel1d(jnp.maximum(jnp.asarray(p), 0.0), 25, img.dtype)
        padded = F._pad_reflect(img, 12, 12)
        old = jnp.clip(F._depthwise_conv(F._depthwise_conv(padded, g[:, None]),
                                         g[None, :]), 0, 1)
        assert float(jnp.max(jnp.abs(new - old))) < 1e-6
