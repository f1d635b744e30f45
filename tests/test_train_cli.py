"""Guidance-classifier training CLI, including the SDXL path.

Reference: `/root/reference/src/clf/train_guidance_clf.py:52-54,89-98` trains
at 512 (SD, MiduSD) or 1024 (SDXL, MiduSDXL). Here the tiny twins of both
paths run end-to-end (teacher labels -> VAE encode -> noisy latents -> UNet
mid-block (with SDXL added conds) -> sharded train step -> best-val orbax).
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import pytest

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts", "train_guidance_clf.py")


def _load_cli():
    spec = importlib.util.spec_from_file_location("train_guidance_clf", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_cli(tmp_path, monkeypatch, scale):
    train_guidance_clf = _load_cli()

    # MiduSDXL's 4 maxpool stages need a 32px mid block: image 128 -> latent 64
    # (tiny VAE, one downsample) -> mid 32. MiduSD is happy with an 8px mid.
    size = "128" if scale == "tiny-xl" else "32"
    argv = ["train_guidance_clf.py", "--scale", scale,
            "--epochs", "2", "--num-batches", "2", "--val-batches", "1",
            "--batch-size", "8", "--image-size", size,
            "--out-dir", str(tmp_path / scale)]
    monkeypatch.setattr(sys, "argv", argv)
    train_guidance_clf.main()
    assert (tmp_path / scale).exists()


@pytest.mark.slow
def test_train_cli_tiny(tmp_path, monkeypatch):
    _run_cli(tmp_path, monkeypatch, "tiny")


@pytest.mark.slow
def test_train_cli_tiny_xl(tmp_path, monkeypatch):
    _run_cli(tmp_path, monkeypatch, "tiny-xl")


def test_tiny_xl_unet_added_conds(key):
    """UNetConfig.tiny_xl consumes pooled embeds + time ids and the added
    conditioning actually changes the mid-block tap."""
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet

    cfg = UNetConfig.tiny_xl()
    unet, variables = create_unet(key, cfg, sample_hw=8, context_len=8)
    lat = jax.random.normal(key, (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, cfg.cross_attention_dim))
    t = jnp.asarray([10, 500])
    te0 = jnp.zeros((2, cfg.addition_pooled_dim))
    te1 = jnp.ones((2, cfg.addition_pooled_dim))
    tids = jnp.asarray([[64, 64, 0, 0, 64, 64]] * 2, jnp.float32)
    eps0, mid0 = unet.apply(variables, lat, t, ctx, added_text_embeds=te0,
                            added_time_ids=tids)
    eps1, mid1 = unet.apply(variables, lat, t, ctx, added_text_embeds=te1,
                            added_time_ids=tids)
    assert eps0.shape == lat.shape and mid0.shape[0] == 2
    assert not jnp.allclose(mid0, mid1)
