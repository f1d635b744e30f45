"""Ten-crop-in-s2d-space parity: the fused regressor path (space-to-depth
once per image -> crops in s2d space -> stride-1 4x4 stem, see
rgie_tpu/models/emotion.py TENCROP_S2D) must match the plain path exactly —
forward AND gradient — because the s2d-space zero padding corresponds 1:1 to
the reference's per-crop zero padding (torchvision resnet50 conv1 pad=3;
reference: /root/reference/src/baselines/models/EmotionPredictionModel.py:10-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.models import emotion as E
from rgie_tpu.models.resnet import StemConv
from rgie_tpu.ops import geometry as G


def test_stem_s2d_input_matches_plain():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 36, 44, 3))
    stem = StemConv(8)
    variables = stem.init(jax.random.PRNGKey(1), x)
    ref = stem.apply(variables, x)
    xs = G.space_to_depth(x, 2)
    out = StemConv(8, s2d_input=True).apply(variables, xs)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tencrop_offsets_even_production_geometry():
    assert G.tencrop_offsets_even(480, 480, 448)
    assert G.tencrop_offsets_even(480, 600, 448)
    assert not G.tencrop_offsets_even(481, 480, 448)
    # 48/44: my=4 -> interior offset my//4=1 is odd
    assert not G.tencrop_offsets_even(48, 48, 44)


def test_replicate_and_crop_s2d_matches_image_space():
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (2, 64, 80, 3))
    ref = G.replicate_and_crop(x, 48)                      # (20, 48, 48, 3)
    xs = G.space_to_depth(x, 2)
    got = G.replicate_and_crop_s2d(xs, 48, 64, 80)          # (20, 24, 24, 12)
    # depth-to-space each crop back and compare
    n, hs, ws, c4 = got.shape
    back = got.reshape(n, hs, ws, 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    back = back.reshape(n, hs * 2, ws * 2, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ref))


@pytest.mark.parametrize("normalize", [True, False])
def test_regressor_fused_matches_plain(monkeypatch, normalize):
    reg_kwargs = dict(num_classes=4, normalize=normalize,
                      input_size=64, crop_size=48, use_sigmoid=True)
    key = jax.random.PRNGKey(3)
    reg = E.create_regressor(key, **reg_kwargs)
    images = jax.random.uniform(jax.random.PRNGKey(4), (2, 40, 50, 3))

    monkeypatch.setattr(E, "TENCROP_S2D", False)
    ref = reg(images)
    monkeypatch.setattr(E, "TENCROP_S2D", True)
    fused = reg(images)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # Gradient w.r.t. the image — the path the edit differentiates.
    def loss(imgs, enabled):
        monkeypatch.setattr(E, "TENCROP_S2D", enabled)
        return jnp.sum(reg(imgs) ** 2)

    g_ref = jax.grad(lambda im: loss(im, False))(images)
    g_fused = jax.grad(lambda im: loss(im, True))(images)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_regressor_fused_gate_falls_back_on_odd_offsets():
    # 48/44 has an odd interior offset: the fused gate must decline and the
    # plain path must be taken (shapes still correct end to end).
    reg = E.create_regressor(jax.random.PRNGKey(5), input_size=48,
                             crop_size=44)
    out = reg(jax.random.uniform(jax.random.PRNGKey(6), (1, 30, 30, 3)))
    assert out.shape == (1, 4)


def test_regressor_s2d4_phase_folded_parity(monkeypatch):
    """Round-4 path: ten-crop in s2d(4) space with the PHASE-FOLDED stem
    output + elementwise phase-maxpool (resnet.max_pool_phase_folded) must
    match the standard path exactly — forward and image-gradient."""
    # 64/48 on a square resize: offsets {0,4,8,12,16} are all 4-aligned,
    # so the gate actually engages (64/56 offsets include 2 mod 4).
    reg = E.create_regressor(jax.random.PRNGKey(7), input_size=64,
                             crop_size=48)
    images = jax.random.uniform(jax.random.PRNGKey(8), (2, 48, 48, 3))
    from rgie_tpu.ops import geometry as G
    assert G.tencrop_offsets_even(64, 64, 48, block=4)

    monkeypatch.setattr(E, "TENCROP_S2D", False)
    monkeypatch.setattr(E, "TENCROP_S2D4", False)
    ref = reg(images)
    monkeypatch.setattr(E, "TENCROP_S2D4", True)
    fused4 = reg(images)
    np.testing.assert_allclose(np.asarray(fused4), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(imgs, enabled):
        monkeypatch.setattr(E, "TENCROP_S2D4", enabled)
        return jnp.sum(reg(imgs) ** 2)

    g_ref = jax.grad(lambda im: loss(im, False))(images)
    g4 = jax.grad(lambda im: loss(im, True))(images)
    # atol dominated by f32 reduction reorder on near-zero elements (the
    # folded stem sums the same taps in a different order).
    np.testing.assert_allclose(np.asarray(g4), np.asarray(g_ref),
                               rtol=1e-3, atol=5e-5)


def test_s2d4_gate_requires_mod4_offsets(monkeypatch):
    # 64/56 offsets {0,2,4,6,8} are even but not all 4-aligned: the s2d4
    # gate must decline while the s2d(2) gate may still fire.
    from rgie_tpu.ops import geometry as G

    assert G.tencrop_offsets_even(64, 64, 56, block=2)
    assert not G.tencrop_offsets_even(64, 64, 56, block=4)
    monkeypatch.setattr(E, "TENCROP_S2D4", True)
    reg = E.create_regressor(jax.random.PRNGKey(9), input_size=64,
                             crop_size=56)
    out = reg(jax.random.uniform(jax.random.PRNGKey(10), (1, 32, 32, 3)))
    assert out.shape == (1, 4)
