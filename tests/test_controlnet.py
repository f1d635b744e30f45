"""ControlNet residual injection (reference surface: diff_utils.py:47-72).

Key invariants: zero-init residuals make the controlled UNet EXACTLY equal
the plain UNet; a trained (perturbed) ControlNet changes eps and the mid-block
tap; residual counts line up with the UNet's skip list for both SD and SDXL
block layouts; the whole thing jits and differentiates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.diffusion.controlnet import (ControlNet, controlled_unet_apply,
                                           create_controlnet)
from rgie_tpu.diffusion.unet import UNetConfig, create_unet


def _setup(key, cfg, latent_hw=8):
    k1, k2 = jax.random.split(key)
    unet, unet_vars = create_unet(k1, cfg, sample_hw=latent_hw, context_len=8)
    cn, cn_vars = create_controlnet(k2, cfg, sample_hw=latent_hw, context_len=8)
    lat = jax.random.normal(jax.random.fold_in(key, 2), (2, latent_hw, latent_hw, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 3),
                            (2, 8, cfg.cross_attention_dim))
    cond = jax.random.uniform(jax.random.fold_in(key, 4),
                              (2, latent_hw * 8, latent_hw * 8, 3))
    t = jnp.asarray([10, 500])
    added = {}
    if cfg.addition_embed_type == "text_time":
        added = dict(added_text_embeds=jnp.ones((2, cfg.addition_pooled_dim)),
                     added_time_ids=jnp.tile(
                         jnp.asarray([[64, 64, 0, 0, 64, 64]], jnp.float32), (2, 1)))
    return unet, unet_vars, cn, cn_vars, lat, ctx, cond, t, added


@pytest.mark.parametrize("cfg_fn", [UNetConfig.tiny, UNetConfig.tiny_xl])
def test_zero_init_is_identity(key, cfg_fn):
    cfg = cfg_fn()
    unet, uv, cn, cv, lat, ctx, cond, t, added = _setup(key, cfg)
    eps_plain, mid_plain = unet.apply(uv, lat, t, ctx, **added)
    eps_ctrl, mid_ctrl = controlled_unet_apply(unet, uv, cn, cv, lat, t, ctx,
                                               cond, **added)
    np.testing.assert_allclose(np.asarray(eps_ctrl), np.asarray(eps_plain),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mid_ctrl), np.asarray(mid_plain),
                               rtol=1e-6, atol=1e-6)


def test_perturbed_controlnet_changes_output(key):
    cfg = UNetConfig.tiny()
    unet, uv, cn, cv, lat, ctx, cond, t, added = _setup(key, cfg)
    # un-zero the zero convs -> residuals become active
    cv = jax.tree.map(lambda a: a + 0.05, cv)
    eps_plain, mid_plain = unet.apply(uv, lat, t, ctx)
    eps_ctrl, mid_ctrl = controlled_unet_apply(unet, uv, cn, cv, lat, t, ctx, cond)
    assert not np.allclose(np.asarray(eps_ctrl), np.asarray(eps_plain))
    assert not np.allclose(np.asarray(mid_ctrl), np.asarray(mid_plain))
    # and the control IMAGE content matters
    eps_ctrl2, _ = controlled_unet_apply(unet, uv, cn, cv, lat, t, ctx, cond * 0.0)
    assert not np.allclose(np.asarray(eps_ctrl), np.asarray(eps_ctrl2))


def test_residual_count_matches_skips(key):
    cfg = UNetConfig.tiny()
    _, _, cn, cv, lat, ctx, cond, t, _ = _setup(key, cfg)
    down, mid = cn.apply(cv, lat, t, ctx, cond)
    # skips = conv_in + layers_per_block per level + downsamplers
    n_levels = len(cfg.block_out_channels)
    expected = 1 + n_levels * cfg.layers_per_block + (n_levels - 1)
    assert len(down) == expected
    assert mid.shape[-1] == cfg.block_out_channels[-1]


def test_controlled_apply_jits_and_differentiates(key):
    cfg = UNetConfig.tiny()
    unet, uv, cn, cv, lat, ctx, cond, t, _ = _setup(key, cfg)
    cv = jax.tree.map(lambda a: a + 0.01, cv)

    @jax.jit
    def loss(cn_vars, lat):
        eps, _ = controlled_unet_apply(unet, uv, cn, cn_vars, lat, t, ctx, cond)
        return jnp.mean(eps ** 2)

    g = jax.grad(loss)(cv, lat)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
