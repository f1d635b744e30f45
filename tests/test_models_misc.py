"""Tests: midu classifiers, discriminators, GAN losses, EmoNet, compound
emotion vector, guidance scores."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.losses import gan as GAN
from rgie_tpu.losses import guidance_scores as GS
from rgie_tpu.losses.compound import compute_compound_emotion_vector
from rgie_tpu.models import discriminators as D
from rgie_tpu.models import midu as MD


def test_midu_sd_shapes(key):
    model, variables = MD.create_midu(key, is_sdxl=False)
    out = model.apply(variables, jnp.zeros((3, 8, 8, 1280)))
    assert out.shape == (3, 2)


def test_midu_sdxl_shapes(key):
    model, variables = MD.create_midu(key, is_sdxl=True)
    out = model.apply(variables, jnp.zeros((2, 32, 32, 1280)))
    assert out.shape == (2, 2)


def test_midu_score_and_grad(key, rng):
    model, variables = MD.create_midu(key, is_sdxl=False)
    clf = MD.ValenceArousalMidu(model=model, variables=variables)
    feats = jnp.asarray(rng.normal(size=(1, 8, 8, 1280)).astype(np.float32))
    s = clf.score(feats)
    assert np.isfinite(float(s))
    g = jax.grad(lambda f: clf.score(f))(feats)
    assert np.all(np.isfinite(np.asarray(g)))


def test_midu_loss(key, rng):
    model, variables = MD.create_midu(key, is_sdxl=False)
    clf = MD.ValenceArousalMidu(model=model, variables=variables)
    feats = jnp.asarray(rng.normal(size=(4, 8, 8, 1280)).astype(np.float32))
    labels = jnp.asarray(rng.uniform(0, 1, (4, 2)).astype(np.float32))
    loss, out = clf.loss_and_outputs(feats, labels)
    np.testing.assert_allclose(float(loss), float(jnp.mean((out - labels) ** 2)), rtol=1e-6)


def test_guidance_scores_targets():
    pred = jnp.asarray([[0.5, 0.0]])
    assert float(GS.valence_arousal_score(pred, is_minimized=True)) == 0.0
    assert float(GS.valence_arousal_score(pred, is_minimized=False)) == pytest.approx(0.25 + 1.0)
    assert float(GS.valence_arousal_score(pred, reference_value=jnp.asarray([[0.5, 0.0]]))) == 0.0
    assert float(GS.valence_score(pred, is_minimized=True)) == 0.0
    assert float(GS.arousal_score(pred, is_minimized=True)) == 0.0


def test_gan_loss_hinge():
    out = jnp.asarray([2.0, -2.0, 0.5])
    # dis update, real: mean(relu-like min(x-1, 0)) negated
    loss_real = float(GAN.gan_loss(out, True, "hinge", dis_update=True))
    np.testing.assert_allclose(loss_real, -np.mean(np.minimum(out - 1, 0)), rtol=1e-6)
    loss_fake = float(GAN.gan_loss(out, False, "hinge", dis_update=True))
    np.testing.assert_allclose(loss_fake, -np.mean(np.minimum(-out - 1, 0)), rtol=1e-6)
    loss_gen = float(GAN.gan_loss(out, True, "hinge", dis_update=False))
    np.testing.assert_allclose(loss_gen, -np.mean(np.asarray(out)), rtol=1e-6)


def test_gan_loss_least_square_and_bce():
    out = jnp.asarray([0.3, -0.7])
    ls = float(GAN.gan_loss(out, True, "least_square"))
    np.testing.assert_allclose(ls, 0.5 * np.mean((np.asarray(out) - 1) ** 2), rtol=1e-6)
    import torch
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor([0.3, -0.7]), torch.ones(2)).item()
    ours = float(GAN.gan_loss(out, True, "non_saturated"))
    np.testing.assert_allclose(ours, bce, rtol=1e-5)


def test_gan_loss_multiscale_average():
    outs = [jnp.ones((2, 4, 4, 1)), jnp.zeros((2, 2, 2, 1))]
    loss = GAN.gan_loss(outs, True, "hinge", dis_update=False)
    np.testing.assert_allclose(float(loss), -0.5, rtol=1e-6)


def test_patch_discriminator_shapes(key):
    model = D.NLayerPatchDiscriminator(num_filters=8, num_layers=3, max_num_filters=32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(key, x)
    out, feats = model.apply(variables, x)
    # strides: 2, 2, 2, 1 -> 64/8 = 8
    assert out.shape == (1, 8, 8, 1)
    assert len(feats) == 4


def test_multires_patch_discriminator(key):
    model = D.MultiResPatchDiscriminator(num_discriminators=3, num_filters=8,
                                         num_layers=3, max_num_filters=32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(key, x)
    outs, feats, inputs = model.apply(variables, x)
    assert len(outs) == 3 and len(inputs) == 3
    assert inputs[1].shape == (1, 32, 32, 3)
    assert inputs[2].shape == (1, 16, 16, 3)


def test_pixel_discriminator(key):
    model = D.PixelDiscriminator(num_features=4, size_w=120, size_h=120)
    x = jnp.zeros((2, 120, 120, 3))
    variables = model.init(key, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_compound_emotion_vector(rng):
    emotions = jnp.asarray(rng.uniform(0, 1, (4, 8)).astype(np.float32))
    ce = compute_compound_emotion_vector(emotions)
    assert ce.intensity.shape == (4,)
    assert np.all(np.asarray(ce.theta) >= 0) and np.all(np.asarray(ce.theta) < 2 * np.pi)
    assert set(np.asarray(ce.polarity).tolist()) <= {0.0, 1.0}
    # Pure amusement (angle 11/8 pi): theta == angle, intensity == mass.
    pure = jnp.zeros((1, 8)).at[0, 0].set(2.0)
    ce2 = compute_compound_emotion_vector(pure)
    np.testing.assert_allclose(float(ce2.theta[0]), 11 / 8 * np.pi, rtol=1e-5)
    np.testing.assert_allclose(float(ce2.intensity[0]), 2.0, rtol=1e-5)


def test_emonet_pipeline(key, rng):
    from rgie_tpu.models.emonet import EmoNet, classic_ten_crop, create_emonet

    crops = classic_ten_crop(jnp.zeros((2, 256, 256, 3)), 224)
    assert crops.shape == (20, 224, 224, 3)
    net = create_emonet(key)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    out = net(img)
    assert out.shape == (1, 2)
    assert float(out[0, 1]) == 0.0  # fake arousal column


def test_load_va_loss_dispatch(key, rng):
    """Path-name architecture dispatch (ValenceArousalLoss.py:29-57)."""
    import jax.numpy as jnp

    from rgie_tpu.models.loader import load_va_loss

    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))

    va = load_va_loss(None, key, input_size=72, crop_size=64)
    assert va.regressor.num_classes == 4 and va.regressor.use_sigmoid
    out = va.predict_loss_metric(img)
    assert out.shape == (1, 2)

    mse = load_va_loss("/nonexistent/model_mse", key, input_size=72, crop_size=64)
    assert mse.regressor.num_classes == 2 and not mse.regressor.use_sigmoid

    emo = load_va_loss("/nonexistent/EmoNet_valence.pth.tar", key,
                       is_input_range_0_1=False)
    assert emo.loss_type == "valence"
    out = emo.predict_loss_metric(jnp.asarray(
        rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert out.shape == (1, 1)


def test_stem_conv_space_to_depth_parity(key, monkeypatch):
    """StemConv's space-to-depth rewrite (RGIE_STEM_S2D path) == plain 7x7/2
    pad-3 conv (and the odd-size fallback hits the plain path exactly)."""
    import numpy as np

    from rgie_tpu.models import resnet as resnet_mod
    from rgie_tpu.models.resnet import StemConv

    monkeypatch.setattr(resnet_mod, "S2D", True)
    rng = np.random.default_rng(0)
    m = StemConv(64)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    v = m.init(key, x)
    k = v["params"]["kernel"]
    assert k.shape == (7, 7, 3, 64)  # converter-compatible param layout
    ref = jax.lax.conv_general_dilated(x, k, (2, 2), ((3, 3), (3, 3)),
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert float(jnp.max(jnp.abs(m.apply(v, x) - ref))) < 1e-5
    x_odd = x[:, :63, :63, :]
    ref_odd = jax.lax.conv_general_dilated(x_odd, k, (2, 2), ((3, 3), (3, 3)),
                                           dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert float(jnp.max(jnp.abs(m.apply(v, x_odd) - ref_odd))) == 0.0
    # default path (S2D off) is the plain conv bit-exactly
    monkeypatch.setattr(resnet_mod, "S2D", False)
    assert float(jnp.max(jnp.abs(m.apply(v, x) - ref))) == 0.0
