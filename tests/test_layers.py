"""Tests for the extended GAN layer library."""

import jax
import jax.numpy as jnp
import numpy as np

from rgie_tpu.config import MunitGenConfig
from rgie_tpu.models import layers as L


def test_non_local_block(key, rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    mod = L.NonLocal2dBlock(16)
    vars_ = mod.init(key, x)
    y = mod.apply(vars_, x)
    assert y.shape == x.shape
    # gamma initializes to 0 -> identity at init
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_modulated_conv_demodulation(key, rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    mod = L.ModulatedConv2d(16)
    vars_ = mod.init(key, x, style)
    y = mod.apply(vars_, x, style)
    assert y.shape == (2, 8, 8, 16)
    # different styles -> different outputs
    y2 = mod.apply(vars_, x, style + 1.0)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_partial_conv_mask_propagation(key):
    x = jnp.ones((1, 8, 8, 4))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6, :].set(1.0)
    mod = L.PartialConv2d(6)
    vars_ = mod.init(key, x, mask)
    y, new_mask = mod.apply(vars_, x, mask)
    assert y.shape == (1, 8, 8, 6)
    nm = np.asarray(new_mask)[0, :, :, 0]
    assert nm[3, 3] == 1.0      # interior valid
    assert nm[0, 0] == 0.0      # far corner still invalid
    assert nm[1, 1] == 1.0      # grew by the kernel radius


def test_hyper_conv(key, rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 3, 3, 3, 5)).astype(np.float32) * 0.1)
    mod = L.HyperConv2d(kernel=3)
    vars_ = mod.init(key, x, w)
    y = mod.apply(vars_, x, w)
    assert y.shape == (2, 6, 6, 5)
    # per-sample weights: swapping them swaps outputs
    y_swap = mod.apply(vars_, x, w[::-1])
    assert not np.allclose(np.asarray(y), np.asarray(y_swap))


def test_pixel_norm(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32)) * 5
    y = L.pixel_norm(x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y * y, axis=-1)), 1.0, rtol=1e-4)


def test_apply_noise_and_constant_input(key):
    x = jnp.ones((1, 4, 4, 2))
    mod = L.ApplyNoise()
    vars_ = mod.init(key, x, key)
    # zero-initialized scale -> identity
    np.testing.assert_allclose(np.asarray(mod.apply(vars_, x, key)), np.asarray(x))
    ci = L.ConstantInput(8, size=4)
    vars_ci = ci.init(key, 3)
    out = ci.apply(vars_ci, 3)
    assert out.shape == (3, 4, 4, 8)


def test_unit_autoencoder_round_trip(key, rng):
    cfg = MunitGenConfig(num_filters=4, max_num_filters=16, num_res_blocks=1,
                         num_downsamples_content=2)
    model = L.UnitAutoEncoder(cfg)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    vars_ = model.init(key, img)
    out = model.apply(vars_, img)
    assert out.shape == img.shape
    content = model.apply(vars_, img, method=L.UnitAutoEncoder.encode)
    assert content.shape == (1, 8, 8, 16)


def test_convnd_blocks(key, rng):
    x1 = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    m1 = L.ConvNdBlock(8, 3, spatial_dims=1, pad=1, norm="instance")
    v1 = m1.init(key, x1)
    assert m1.apply(v1, x1).shape == (2, 16, 8)

    x3 = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    m3 = L.ConvNdBlock(6, 3, spatial_dims=3, pad=1)
    v3 = m3.init(key, x3)
    assert m3.apply(v3, x3).shape == (1, 4, 4, 4, 6)

    r1 = L.ResNdBlock(4, spatial_dims=1)
    xr = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    vr = r1.init(key, xr)
    assert r1.apply(vr, xr).shape == xr.shape


def test_embedding_block(key):
    m = L.EmbeddingBlock(10, 6)
    v = m.init(key, jnp.zeros((2, 3), jnp.int32))
    out = m.apply(v, jnp.asarray([[1, 2, 3]]))
    assert out.shape == (1, 3, 6)


def test_spade_and_norms(key, rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 6)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    spade = L.SpatiallyAdaptiveNorm(6, hidden=8)
    v = spade.init(key, x, cond)
    assert spade.apply(v, x, cond).shape == x.shape

    ln = L.LayerNorm2d()
    vl = ln.init(key, x)
    y = ln.apply(vl, x)
    np.testing.assert_allclose(float(y.mean()), 0.0, atol=1e-5)

    sn = L.ScaleNorm()
    vs = sn.init(key, x)
    assert sn.apply(vs, x).shape == x.shape

    eq = L.EqualizedDense(5, lr_mul=0.5)
    ve = eq.init(key, jnp.zeros((2, 7)))
    assert eq.apply(ve, jnp.ones((2, 7))).shape == (2, 5)
