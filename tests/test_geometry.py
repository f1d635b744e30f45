"""Tests for geometric ops (warps, resize, crops)."""

import jax
import jax.numpy as jnp
import numpy as np

from rgie_tpu.ops import geometry as G


def test_warp_affine_identity(rng):
    im = jnp.asarray(rng.uniform(0, 1, (2, 12, 12, 3)).astype(np.float32))
    eye = jnp.broadcast_to(jnp.array([[1.0, 0, 0], [0, 1.0, 0]]), (2, 2, 3))
    out = G.warp_affine(im, eye)
    np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-6)


def test_warp_affine_translation():
    im = jnp.zeros((1, 8, 8, 1)).at[0, 2, 2, 0].set(1.0)
    # src->dst translation by (+1, +0): pixel moves right by 1.
    m = jnp.array([[[1.0, 0, 1.0], [0, 1.0, 0]]])
    out = np.asarray(G.warp_affine(im, m))
    assert out[0, 2, 3, 0] == 1.0
    assert out[0, 2, 2, 0] == 0.0


def test_warp_border_vs_zeros():
    im = jnp.ones((1, 6, 6, 1))
    m = jnp.array([[[1.0, 0, 3.0], [0, 1.0, 0]]])  # shift right by 3
    z = np.asarray(G.warp_affine(im, m, padding_mode="zeros"))
    b = np.asarray(G.warp_affine(im, m, padding_mode="border"))
    assert z[0, 0, 0, 0] == 0.0
    assert b[0, 0, 0, 0] == 1.0


def test_bilinear_midpoint():
    im = jnp.array([[[0.0], [1.0]], [[0.0], [1.0]]])  # (2, 2, 1)
    v = G.bilinear_sample(im, jnp.array(0.5), jnp.array(0.5))
    np.testing.assert_allclose(np.asarray(v), [0.5], atol=1e-6)


def test_resize_shorter_side_aspect():
    im = jnp.ones((1, 100, 200, 3))
    out = G.resize_shorter_side(im, 50)
    assert out.shape == (1, 50, 100, 3)
    out2 = G.resize_shorter_side(jnp.ones((1, 200, 100, 3)), 50)
    assert out2.shape == (1, 100, 50, 3)


def test_center_crop():
    im = jnp.arange(36.0).reshape(1, 6, 6, 1)
    out = G.center_crop(im, 4)
    assert out.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0]), 7.0)


def test_replicate_and_crop_shapes(rng):
    im = jnp.asarray(rng.uniform(0, 1, (2, 10, 10, 3)).astype(np.float32))
    crops = G.replicate_and_crop(im, 8, 10)
    assert crops.shape == (20, 8, 8, 3)
    # Replicas of image 0 come first (row-major image-major ordering).
    first = np.asarray(crops[0])
    assert np.allclose(first, np.asarray(im[0, 0:8, 0:8, :]))


def test_replicate_and_crop_random(key, rng):
    im = jnp.asarray(rng.uniform(0, 1, (1, 12, 12, 3)).astype(np.float32))
    crops = G.replicate_and_crop(im, 8, 10, key=key)
    assert crops.shape == (10, 8, 8, 3)


def test_mean_replicated():
    x = jnp.arange(20.0).reshape(20, 1)
    out = G.mean_replicated(x, 10)
    assert out.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 4.5)
    np.testing.assert_allclose(np.asarray(out[1, 0]), 14.5)


def test_scale_gradients(rng):
    im = jnp.asarray(rng.uniform(0, 1, (1, 12, 12, 3)).astype(np.float32))

    def f(s):
        return jnp.sum(G.scale_about_center(im, jnp.array([[s, s]]), jnp.array([[5.5, 5.5]])))

    g = jax.grad(f)(1.5)
    assert np.isfinite(float(g))


def test_scale_matmul_matches_gather(rng):
    """The separable-matmul zoom == gather-based bilinear sampling (zeros)."""
    im = jnp.asarray(rng.uniform(0, 1, (2, 17, 23, 3)).astype(np.float32))

    def gather_scale(img, s, c):
        h, w = img.shape[0], img.shape[1]
        ys = jnp.arange(h, dtype=img.dtype)
        xs = jnp.arange(w, dtype=img.dtype)
        xx, yy = jnp.meshgrid(xs, ys)
        src_x = c[0] + (xx - c[0]) / s[0]
        src_y = c[1] + (yy - c[1]) / s[1]
        return G.bilinear_sample(img, src_x, src_y, "zeros")

    for s, c in [((1.7, 1.3), (5.0, 8.0)), ((1.0, 1.0), (11.0, 8.5)),
                 ((0.6, 2.0), (0.0, 0.0))]:
        expect = np.stack([np.asarray(gather_scale(im[b], jnp.asarray(s), jnp.asarray(c)))
                           for b in range(2)])
        got = np.asarray(G.scale_about_center(
            im, jnp.broadcast_to(jnp.asarray(s), (2, 2)),
            jnp.broadcast_to(jnp.asarray(c), (2, 2))))
        np.testing.assert_allclose(got, expect, atol=2e-5)
