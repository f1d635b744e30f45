"""Golden tests for color conversions against an independent numpy oracle
(colorsys) and round-trip/gradient properties. The reference has no tests;
its implementation is /root/reference/src/baselines/image_transformations/color_transformations.py."""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np

from rgie_tpu.ops import color as C


def _rand_img(rng, shape=(2, 8, 8, 3)):
    return rng.uniform(0, 1, size=shape).astype(np.float32)


def test_rgb_to_hsv_matches_colorsys(rng):
    img = _rand_img(rng)
    out = np.asarray(C.rgb_to_hsv(jnp.asarray(img)))
    flat = img.reshape(-1, 3)
    expect = np.array([colorsys.rgb_to_hsv(*px) for px in flat]).reshape(img.shape)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_hsv_round_trip(rng):
    img = _rand_img(rng)
    back = C.hsv_to_rgb(C.rgb_to_hsv(jnp.asarray(img)))
    np.testing.assert_allclose(np.asarray(back), img, atol=1e-5)


def test_hsl_round_trip(rng):
    img = _rand_img(rng)
    back = C.hsl_to_rgb(C.rgb_to_hsl(jnp.asarray(img)))
    np.testing.assert_allclose(np.asarray(back), img, atol=1e-5)


def test_rgb_to_hsl_matches_colorsys(rng):
    img = _rand_img(rng)
    out = np.asarray(C.rgb_to_hsl(jnp.asarray(img)))
    flat = img.reshape(-1, 3)
    # colorsys returns (h, l, s); ours is (h, s, l).
    expect = np.array([colorsys.rgb_to_hls(*px) for px in flat]).reshape(img.shape)
    np.testing.assert_allclose(out[..., 0], expect[..., 0], atol=1e-5)
    np.testing.assert_allclose(out[..., 1], expect[..., 2], atol=1e-5)
    np.testing.assert_allclose(out[..., 2], expect[..., 1], atol=1e-5)


def test_gray_pixels_have_zero_saturation():
    img = jnp.full((1, 4, 4, 3), 0.37)
    hsv = C.rgb_to_hsv(img)
    np.testing.assert_allclose(np.asarray(hsv[..., 0]), 0.0)
    np.testing.assert_allclose(np.asarray(hsv[..., 1]), 0.0)


def test_rgb_to_lum_weights():
    img = jnp.ones((1, 2, 2, 3))
    np.testing.assert_allclose(np.asarray(C.rgb_to_lum(img)), 1.0, atol=1e-6)
    red = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(1.0)
    np.testing.assert_allclose(np.asarray(C.rgb_to_lum(red)), 0.27, atol=1e-6)


def test_hsv_gradients_finite(rng):
    img = jnp.asarray(_rand_img(rng, (1, 4, 4, 3)))

    def f(x):
        return jnp.sum(C.hsv_to_rgb(C.rgb_to_hsv(x)))

    g = jax.grad(f)(img)
    assert np.all(np.isfinite(np.asarray(g)))
    # Gradients through gray pixels (delta == 0) must also be finite.
    gray = jnp.full((1, 2, 2, 3), 0.5)
    g2 = jax.grad(f)(gray)
    assert np.all(np.isfinite(np.asarray(g2)))
