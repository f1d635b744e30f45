"""Diffusion stack tests: scheduler math (incl. invert/sample round trips),
tiny UNet/VAE shapes + gradients, prompt encoding, and the pipeline scans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.diffusion import schedulers as S


def test_alphas_cumprod_matches_sd_config():
    acp = S.make_alphas_cumprod()
    assert acp.shape == (1000,)
    # endpoints of the scaled_linear schedule
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-5)
    assert 0.0 < acp[-1] < 0.05
    assert np.all(np.diff(acp) < 0)


def test_schedule_timesteps_leading_spacing():
    sched = S.make_schedule(50)
    ts = np.asarray(sched.timesteps)
    assert ts.shape == (50,)
    assert ts[0] == 981 and ts[-1] == 1  # (49*20)[::-1] + offset 1
    inv = np.asarray(S.inverse_timesteps(sched))
    assert inv[0] == 0 and inv[-1] == 980
    assert np.all(np.diff(inv) == 20)


def test_add_noise_formula(rng):
    sched = S.make_schedule(50)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
    t = jnp.asarray([10, 500])
    out = S.add_noise(sched, x, n, t)
    a = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
    expect = (np.sqrt(a)[:, None, None, None] * np.asarray(x) +
              np.sqrt(1 - a)[:, None, None, None] * np.asarray(n))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_ddim_invert_sample_round_trip(rng):
    """With a constant-eps 'model', DDIM inversion then sampling recovers the
    original latent (deterministic DDIM is exactly invertible)."""
    sched = S.make_schedule(10)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32) * 0.1)

    lat = x0
    for t in np.asarray(S.inverse_timesteps(sched)):
        lat = S.ddim_inverse_step(sched, eps, jnp.asarray(t), lat)
    noisy = lat
    assert not np.allclose(np.asarray(noisy), np.asarray(x0))

    # Reference quirk parity: the forward DDIM timesteps carry steps_offset 1
    # while the inverse ones don't; invert with the forward grid to round-trip.
    for t in np.asarray(sched.timesteps) - 1:
        lat = S.ddim_step(sched, eps, jnp.asarray(t), lat)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), atol=1e-3)


def test_prev_step_matches_reference_formula(rng):
    """ddim_step == the reference's explicit prev_step
    (InversionResamplingDiffusionPipeline.py:269-278)."""
    sched = S.make_schedule(50)
    acp = np.asarray(sched.alphas_cumprod)
    x = rng.normal(size=(1, 2, 2, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 2, 2, 4)).astype(np.float32)
    t = 501
    prev_t = t - 20
    a_t, a_prev = acp[t], acp[prev_t]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expect = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    got = np.asarray(S.ddim_step(sched, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_dpm_step_first_order_and_second(rng):
    sched = S.make_schedule(10)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    state = S.dpm_init_state(x.shape)
    ts = np.asarray(sched.timesteps)
    x1, state = S.dpm_step(sched, eps, jnp.asarray(ts[0]), jnp.asarray(ts[1]), x, state)
    assert np.all(np.isfinite(np.asarray(x1)))
    x2, state = S.dpm_step(sched, eps, jnp.asarray(ts[1]), jnp.asarray(ts[2]), x1, state)
    assert np.all(np.isfinite(np.asarray(x2)))
    assert bool(state.has_prev)


def test_unet_tiny_shapes_and_mid_tap(key):
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet

    model, variables = create_unet(key, UNetConfig.tiny(), sample_hw=8, context_len=5)
    sample = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 5, 32))
    out, mid = model.apply(variables, sample, jnp.asarray([10, 20]), ctx)
    assert out.shape == (2, 8, 8, 4)
    assert mid.shape == (2, 4, 4, 16)  # one downsample, top channel count


def test_unet_latent_gradients(key, rng):
    """Classifier-guidance pattern: grad of a mid-feature score wrt latents."""
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet

    model, variables = create_unet(key, UNetConfig.tiny(), sample_hw=8, context_len=5)
    ctx = jnp.asarray(rng.normal(size=(1, 5, 32)).astype(np.float32))

    def score(lat):
        _, mid = model.apply(variables, lat, jnp.asarray([100]), ctx)
        return jnp.sum(mid ** 2)

    g = jax.grad(score)(jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_vae_round_trip_shapes(key, rng):
    from rgie_tpu.diffusion.vae import AutoencoderKL, VaeConfig, create_vae

    model, variables = create_vae(key, VaeConfig.tiny(), image_hw=32)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    lat = model.apply(variables, img, method=AutoencoderKL.encode)
    assert lat.shape == (1, 16, 16, 4)  # one downsample in tiny config
    out = model.apply(variables, lat, method=AutoencoderKL.decode)
    assert out.shape == (1, 32, 32, 3)
    # sampling path with a key differs from the mode
    lat2 = model.apply(variables, img, jax.random.PRNGKey(1), method=AutoencoderKL.encode)
    assert not np.allclose(np.asarray(lat), np.asarray(lat2))


def test_tokenize_deterministic():
    from rgie_tpu.diffusion.text_encoder import BOS, EOS, tokenize

    t1 = np.asarray(tokenize(["a photo of a cat"]))
    t2 = np.asarray(tokenize(["a photo of a cat"]))
    np.testing.assert_array_equal(t1, t2)
    assert t1[0, 0] == BOS
    assert EOS in t1[0]
    assert t1.shape == (1, 77)


def test_prompt_encoder_sd(key):
    from rgie_tpu.diffusion.text_encoder import TextTowerConfig, create_sd_prompt_encoder

    enc = create_sd_prompt_encoder(key, TextTowerConfig.tiny(), vocab_size=49408)
    embeds = enc.encode_sd("a cat", "")
    assert embeds.shape == (2, 77, 32)


@pytest.mark.slow
def test_pipeline_invert_and_sample(key, rng):
    """End-to-end tiny pipeline: encode -> invert -> sample with CFG +
    classifier guidance -> decode."""
    from rgie_tpu.config import AdaptConfig
    from rgie_tpu.diffusion import schedulers as SCH
    from rgie_tpu.diffusion.pipeline import InversionResamplingPipeline, PipelineParams
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet
    from rgie_tpu.diffusion.vae import VaeConfig, create_vae
    from rgie_tpu.models.midu import MiduSD

    k1, k2, k3, k4 = jax.random.split(key, 4)
    unet, unet_vars = create_unet(k1, UNetConfig.tiny(), sample_hw=16, context_len=5)
    vae, vae_vars = create_vae(k2, VaeConfig.tiny(), image_hw=32)
    midu = MiduSD(num_outputs=2)
    midu_vars = midu.init(k3, jnp.zeros((1, 8, 8, 16)))

    # tiny midu over 16ch mid features: adapt the conv in channels via init above
    sched = SCH.make_schedule(4)
    pipe = InversionResamplingPipeline(unet=unet, vae=vae, sched=sched,
                                       midu_model=midu, is_xl=False)
    params = PipelineParams(unet=unet_vars, vae=vae_vars, midu=midu_vars)

    image = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    embeds1 = jnp.asarray(rng.normal(size=(1, 5, 32)).astype(np.float32))
    embeds2 = jnp.concatenate([embeds1, embeds1 * 0.5], axis=0)

    lat = pipe.encode_image(params, image)
    noisy, pivots = jax.jit(pipe.reverse_sample)(params, lat, embeds1)
    assert pivots.shape[0] == 5

    out_lat = jax.jit(lambda p, l, e: pipe.sample(
        p, l, e, guidance_scale=2.0, guidance_clf_scale=0.2))(params, noisy, embeds2)
    img_out = pipe.decode_latents(params, out_lat)
    assert img_out.shape == image.shape
    assert np.all(np.isfinite(np.asarray(img_out)))


@pytest.mark.slow
def test_pipeline_null_text_optimization(key, rng):
    from rgie_tpu.diffusion import schedulers as SCH
    from rgie_tpu.diffusion.pipeline import InversionResamplingPipeline, PipelineParams
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet
    from rgie_tpu.diffusion.vae import VaeConfig, create_vae

    k1, k2 = jax.random.split(key)
    unet, unet_vars = create_unet(k1, UNetConfig.tiny(), sample_hw=16, context_len=5)
    vae, vae_vars = create_vae(k2, VaeConfig.tiny(), image_hw=32)
    sched = SCH.make_schedule(3)
    pipe = InversionResamplingPipeline(unet=unet, vae=vae, sched=sched)
    params = PipelineParams(unet=unet_vars, vae=vae_vars)

    image = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, 5, 32)).astype(np.float32))
    uncond = jnp.zeros((1, 5, 32))

    lat = pipe.encode_image(params, image)
    _, pivots = pipe.reverse_sample(params, lat, cond)
    uncond_list = jax.jit(lambda p, pv: pipe.null_optimization(
        p, pv, cond, uncond, guidance_scale=2.0, num_inner_steps=3))(params, pivots)
    assert uncond_list.shape == (3, 5, 32)
    assert np.all(np.isfinite(np.asarray(uncond_list)))
    # NTO embeds feed back into sampling
    out = pipe.sample(params, pivots[-1], jnp.concatenate([uncond, cond], axis=0),
                      guidance_scale=2.0, uncond_embeds_per_step=uncond_list)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_sdxl_added_conditioning(key, rng):
    """tiny config with SDXL's text_time added embeddings."""
    import dataclasses

    from rgie_tpu.diffusion.unet import UNet2DCondition, UNetConfig

    cfg = dataclasses.replace(UNetConfig.tiny(), addition_embed_type="text_time",
                              projection_class_embeddings_input_dim=None)
    model = UNet2DCondition(cfg)
    sample = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 5, 32))
    te = jnp.zeros((1, 16))
    tids = jnp.zeros((1, 6))
    variables = model.init(key, sample, jnp.zeros((1,), jnp.int32), ctx,
                           added_text_embeds=te, added_time_ids=tids)
    out, mid = model.apply(variables, sample, jnp.asarray([7]), ctx,
                           added_text_embeds=te, added_time_ids=tids)
    assert out.shape == (1, 8, 8, 4)
    # added conds must influence the output
    out2, _ = model.apply(variables, sample, jnp.asarray([7]), ctx,
                          added_text_embeds=te + 1.0, added_time_ids=tids)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_pipeline_dpm_sampling(key, rng):
    """DPM++ scheduler path through the pipeline scans."""
    import dataclasses as dc

    from rgie_tpu.diffusion import schedulers as SCH
    from rgie_tpu.diffusion.pipeline import InversionResamplingPipeline, PipelineParams
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet
    from rgie_tpu.diffusion.vae import VaeConfig, create_vae

    k1, k2 = jax.random.split(key)
    unet, unet_vars = create_unet(k1, UNetConfig.tiny(), sample_hw=16, context_len=5)
    vae, vae_vars = create_vae(k2, VaeConfig.tiny(), image_hw=32)
    sched = SCH.make_schedule(4)
    pipe = InversionResamplingPipeline(unet=unet, vae=vae, sched=sched,
                                       scheduler_type="dpm")
    params = PipelineParams(unet=unet_vars, vae=vae_vars)
    image = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    embeds = jnp.asarray(rng.normal(size=(1, 5, 32)).astype(np.float32))
    lat = pipe.encode_image(params, image)
    noisy, pivots = pipe.reverse_sample(params, lat, embeds)
    assert pivots.shape[0] == 5
    out = pipe.sample(params, noisy, embeds, guidance_scale=1.0)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_adapter_orchestration(tmp_path, key, rng):
    """ImageAdapter end-to-end on the tiny pipeline: score -> invert -> NTO ->
    guided sample -> save -> rescore (the adapt_images.py flow)."""
    from PIL import Image

    from rgie_tpu.adapt import ImageAdapter, ImageScorer, OutputImageManager
    from rgie_tpu.config import GuidanceConfig
    from rgie_tpu.diffusion import schedulers as SCH
    from rgie_tpu.diffusion.pipeline import InversionResamplingPipeline, PipelineParams
    from rgie_tpu.diffusion.text_encoder import TextTowerConfig, create_sd_prompt_encoder
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet
    from rgie_tpu.diffusion.vae import VaeConfig, create_vae
    from rgie_tpu.models.midu import MiduSD

    k1, k2, k3, k4 = jax.random.split(key, 4)
    unet, unet_vars = create_unet(k1, UNetConfig.tiny(), sample_hw=16, context_len=77)
    vae, vae_vars = create_vae(k2, VaeConfig.tiny(), image_hw=32)
    midu = MiduSD(2)
    midu_vars = midu.init(k3, jnp.zeros((1, 8, 8, 16)))
    prompt_enc = create_sd_prompt_encoder(k4, TextTowerConfig.tiny())

    sched = SCH.make_schedule(3)
    pipe = InversionResamplingPipeline(unet=unet, vae=vae, sched=sched,
                                       midu_model=midu)
    params = PipelineParams(unet=unet_vars, vae=vae_vars, midu=midu_vars)
    embeds_fn = lambda p, n: prompt_enc.encode_sd(p, n, do_cfg=False)
    cfg_embeds_fn = lambda p, n: prompt_enc.encode_sd(p, n, do_cfg=True)

    scorer = ImageScorer(pipe=pipe, params=params, embeds_fn=embeds_fn)
    manager = OutputImageManager(scorer=scorer, output_path=str(tmp_path))
    adapter = ImageAdapter(pipe=pipe, params=params, scorer=scorer,
                           embeds_fn=embeds_fn, cfg_embeds_fn=cfg_embeds_fn,
                           input_size=32)

    img_path = str(tmp_path / "img.jpg")
    Image.fromarray((rng.uniform(0, 1, (40, 48, 3)) * 255).astype(np.uint8)).save(img_path)
    gcfg = GuidanceConfig(clf_scale=0.2, cfg_scale=2.0, is_nto=True,
                          reference_value=0.1)
    outputs = adapter.adapt(img_path, gcfg, manager, end_iteration=3,
                            caption="a test image")
    label = gcfg.resolved_label()
    assert label in outputs
    assert (tmp_path / label / "img.jpg").exists()
    assert np.all(np.isfinite(np.asarray(outputs[label])))


def test_flash_attention_gate_cpu():
    """The Pallas flash-attention gate (unet._flash_self_attention_ok) must be
    closed on CPU lowering (no CPU kernel exists) and only open for the long
    self-attention shapes where the einsum score matrix stops fitting."""
    from rgie_tpu.diffusion import unet as U

    # CPU backend (forced by conftest): closed regardless of shape or force.
    assert not U._flash_self_attention_ok(16384, 16384, 64)
    try:
        U.FLASH_ATTN = "1"
        assert not U._flash_self_attention_ok(16384, 16384, 64)
    finally:
        U.FLASH_ATTN = "auto"
    # Shape gating (checked before any backend consideration).
    assert not U._flash_self_attention_ok(16384, 77, 64)     # cross-attn
    assert not U._flash_self_attention_ok(4096, 4096, 64)    # einsum faster
    assert not U._flash_self_attention_ok(16384, 16384, 65)  # lane-misaligned
    assert not U._flash_self_attention_ok(16000, 16000, 64)  # not /512
    # Forced off always wins.
    try:
        U.FLASH_ATTN = "0"
        assert not U._flash_self_attention_ok(16384, 16384, 64)
    finally:
        U.FLASH_ATTN = "auto"


class _StubVae:
    """Position-independent local 'decoder' (x2 nearest upsample + tanh):
    overlapping tiles agree everywhere, so the crossfade stitch must be EXACT
    vs whole-image application — this isolates the grid/weight machinery."""

    class cfg:
        in_channels = 3
        latent_channels = 4

    upscale_factor = 2

    def apply(self, variables, x, key=None, method=None):
        if x.shape[-1] == 4:    # "decode": latent (.., 4) -> image (.., 3)
            y = jnp.repeat(jnp.repeat(x[..., :3], 2, axis=1), 2, axis=2)
            return jnp.tanh(y)
        # "encode": image (.., 3) -> latent (.., 4)
        y = x[:, ::2, ::2, :]
        return jnp.concatenate([y, y[..., :1]], axis=-1) * 0.5


def test_tiled_vae_stitch_exact_for_local_op(rng):
    from rgie_tpu.diffusion.vae import decode_tiled, encode_tiled

    stub = _StubVae()
    lat = jnp.asarray(rng.standard_normal((2, 12, 12, 4)).astype(np.float32))
    full = stub.apply(None, lat)
    for tile, stride in ((8, 4), (8, 6), (8, 8), (5, 3)):
        tiled = decode_tiled(stub, None, lat, tile=tile, stride=stride)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                                   rtol=0, atol=1e-6)
    img = jnp.asarray(rng.standard_normal((2, 24, 24, 3)).astype(np.float32))
    full_e = stub.apply(None, img)
    tiled_e = encode_tiled(stub, None, img, tile=8, stride=6)
    np.testing.assert_allclose(np.asarray(tiled_e), np.asarray(full_e),
                               rtol=0, atol=1e-6)


def test_tiled_vae_passthrough_and_pipeline(key, rng):
    """Latent <= tile: tiled == direct bit-exactly. And the pipeline-level
    vae_tile option runs the real tiny VAE through encode+decode under jit."""
    import dataclasses as dc

    from rgie_tpu.diffusion.vae import (AutoencoderKL, VaeConfig, create_vae,
                                        decode_tiled, encode_tiled)

    model, variables = create_vae(key, VaeConfig.tiny(), image_hw=24)
    lat = jnp.asarray(rng.standard_normal((1, 12, 12, 4)).astype(np.float32))
    direct = model.apply(variables, lat, method=AutoencoderKL.decode)
    assert float(jnp.max(jnp.abs(
        decode_tiled(model, variables, lat, tile=16) - direct))) == 0.0

    img = jnp.asarray(rng.uniform(-1, 1, (1, 24, 24, 3)).astype(np.float32))
    direct_e = model.apply(variables, img, method=AutoencoderKL.encode)
    assert float(jnp.max(jnp.abs(
        encode_tiled(model, variables, img, tile=16) - direct_e))) == 0.0

    # Real tiled path (latent 12 > tile 8) through the pipeline, jitted.
    tiled_dec = jax.jit(lambda v, z: decode_tiled(model, v, z, tile=8, stride=6))(
        variables, lat)
    assert tiled_dec.shape == (1, 24, 24, 3)
    assert np.all(np.isfinite(np.asarray(tiled_dec)))
    tiled_enc = jax.jit(lambda v, x: encode_tiled(model, v, x, tile=8, stride=6))(
        variables, img)
    assert tiled_enc.shape == (1, 12, 12, 4)
    assert np.all(np.isfinite(np.asarray(tiled_enc)))


def test_unet_block_remat_identical(key, rng):
    """block_remat=True (per-block nn.remat — the NTO memory lever) must not
    change outputs or latent gradients; param tree is unchanged too."""
    from rgie_tpu.diffusion.unet import UNet2DCondition, UNetConfig, create_unet

    cfg = UNetConfig.tiny()
    unet, variables = create_unet(key, cfg, sample_hw=8)
    unet_r = unet.clone(block_remat=True)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 6, cfg.cross_attention_dim)).astype(np.float32))
    t = jnp.asarray([7], jnp.int32)

    eps_a, mid_a = unet.apply(variables, x, t, ctx)
    eps_b, mid_b = unet_r.apply(variables, x, t, ctx)
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mid_a), np.asarray(mid_b), atol=1e-6)

    def loss(m, lat):
        e, mid = m.apply(variables, lat, t, ctx)
        return jnp.sum(e ** 2) + jnp.sum(mid ** 2)

    g_a = jax.grad(lambda lat: loss(unet, lat))(x)
    g_b = jax.grad(lambda lat: loss(unet_r, lat))(x)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=1e-4, atol=1e-5)

    # Re-init under remat: identical parameter tree.
    _, v_r = create_unet(key, cfg, sample_hw=8)
    a = jax.tree_util.tree_structure(variables)
    b = jax.tree_util.tree_structure(v_r)
    assert a == b
