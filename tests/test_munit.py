"""MUNIT model tests: shapes per the shipped imagenet2imagenet.yaml config,
AdaIN/instance-norm semantics, encode/decode round trip, and a tiny GAN edit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.config import GanEditConfig, MunitGenConfig, OptimizeConfig
from rgie_tpu.models import munit as M

SMALL = MunitGenConfig(num_filters=8, max_num_filters=32, num_filters_mlp=16,
                       num_res_blocks=2, num_downsamples_style=3,
                       num_downsamples_content=2)


def test_instance_norm_zero_mean_unit_var(rng):
    x = jnp.asarray(rng.normal(2.0, 3.0, (2, 8, 8, 4)).astype(np.float32))
    y = M.instance_norm(x)
    np.testing.assert_allclose(np.asarray(y.mean(axis=(1, 2))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.var(axis=(1, 2))), 1.0, atol=1e-3)


def test_adain_applies_film(key, rng):
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))
    mod = M.AdaIN(4)
    vars_ = mod.init(key, x, style)
    y = mod.apply(vars_, x, style)
    # manual: in(x) * (1 + gamma) + beta
    w = vars_["params"]["fc"]["kernel"]
    b = vars_["params"]["fc"]["bias"]
    gb = np.asarray(style @ w + b)
    gamma, beta = gb[:, :4], gb[:, 4:]
    expect = np.asarray(M.instance_norm(x)) * (1 + gamma[:, None, None, :]) + beta[:, None, None, :]
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)


def test_encoder_shapes_shipped_config(key):
    """Full-size config on a small image: content (H/8, 256ch), style 8-dim
    (yaml:54-67: 3 content downsamples, max 256 filters, latent 8)."""
    cfg = MunitGenConfig()
    model = M.AutoEncoder(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(key, img)
    content, style = model.apply(vars_, img, method=M.AutoEncoder.encode)
    assert content.shape == (1, 8, 8, 256)
    assert style.shape == (1, 8)
    out = model.apply(vars_, content, style, method=M.AutoEncoder.decode)
    assert out.shape == (1, 64, 64, 3)


def test_autoencoder_round_trip_small(key, rng):
    model = M.AutoEncoder(SMALL)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    vars_ = model.init(key, img)
    recon = model.apply(vars_, img)
    assert recon.shape == img.shape
    assert np.all(np.isfinite(np.asarray(recon)))


def test_decode_depends_on_style(key, rng):
    gen = M.create_generator(key, SMALL, image_size=32)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    content, style = gen.encode_a(img)
    out1 = gen.decode_a(content, style)
    out2 = gen.decode_a(content, style + 1.0)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_style_gradients_flow(key, rng):
    gen = M.create_generator(key, SMALL, image_size=32)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    content, style = gen.encode_a(img)

    def f(s):
        return jnp.sum(gen.decode_a(content, s))

    g = np.asarray(jax.grad(f)(style))
    assert g.shape == style.shape
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


@pytest.mark.slow
def test_gan_edit_end_to_end(key, rng):
    from rgie_tpu.engine import gan as GE
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.emotion import create_regressor

    k1, k2 = jax.random.split(key)
    gen = M.create_generator(k1, SMALL, image_size=48)
    reg = create_regressor(k2, input_size=64, crop_size=56, normalize=False)
    va = ValenceArousalLoss(regressor=reg)
    cfg = GanEditConfig(optimize=OptimizeConfig(num_steps=6, learning_rate=0.05),
                        input_size=48, crop_size=48)
    edit = jax.jit(GE.make_single_edit(gen, va, cfg))
    models = GE.models_of(gen, va)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 48, 48, 3)).astype(np.float32))
    result, edited = edit(models, img, jnp.asarray([0.1, 0.1]))
    assert edited.shape == img.shape
    assert np.isfinite(float(result.best_loss))
    assert float(result.best_loss) <= float(result.first_loss)
    out01 = GE.to_unit_range(edited)
    assert float(out01.min()) >= 0.0 and float(out01.max()) <= 1.0
