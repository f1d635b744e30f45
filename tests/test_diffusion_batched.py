"""Batched/sharded diffusion editing: the vmapped whole-edit program must
match the single-image pipeline path per image, and run with the batch axis
sharded over the virtual 8-device mesh (the reference has no batched or
multi-device diffusion path at all — src/adapt_images.py:68 loops bs=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.diffusion import schedulers as SCH
from rgie_tpu.diffusion.batched import (BatchedConds, make_batched_edit,
                                        stack_conds)
from rgie_tpu.diffusion.pipeline import InversionResamplingPipeline, PipelineParams
from rgie_tpu.diffusion.unet import UNetConfig, create_unet
from rgie_tpu.diffusion.vae import VaeConfig, create_vae
from rgie_tpu.models.midu import MiduSD, ValenceArousalMidu


def _tiny_pipe(key, num_steps=3, remat=False):
    k1, k2, k3 = jax.random.split(key, 3)
    unet, unet_vars = create_unet(k1, UNetConfig.tiny(), sample_hw=16, context_len=5)
    vae, vae_vars = create_vae(k2, VaeConfig.tiny(), image_hw=32)
    midu = MiduSD(2)
    midu_vars = midu.init(k3, jnp.zeros((1, 8, 8, 16)))
    sched = SCH.make_schedule(num_steps)
    pipe = InversionResamplingPipeline(unet=unet, vae=vae, sched=sched,
                                       midu_model=midu, remat_unet=remat)
    params = PipelineParams(unet=unet_vars, vae=vae_vars, midu=midu_vars)
    return pipe, params


def _conds(rng, batch):
    per_image = []
    for b in range(batch):
        cond = jnp.asarray(rng.normal(size=(1, 5, 32)).astype(np.float32))
        uncond = jnp.zeros((1, 5, 32))
        per_image.append(BatchedConds(
            cfg_embeds=jnp.concatenate([uncond, cond], axis=0),
            cond_embeds=cond))
    return per_image


@pytest.mark.slow
def test_batched_edit_matches_single_image(key, rng):
    """B=2 batched program == two single-image pipeline runs (same weights,
    same embeds), including NTO and classifier guidance."""
    pipe, params = _tiny_pipe(key)
    batch = 2
    images = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, 3)).astype(np.float32))
    per_image = _conds(rng, batch)
    empty = jnp.zeros((1, 5, 32))
    alphas = jnp.asarray([[0.1, 0.1], [-0.1, -0.1]], jnp.float32)

    program = make_batched_edit(pipe, guidance_scale=2.0, guidance_clf_scale=0.2,
                                use_nto=True, use_reference=True,
                                num_inner_steps=3)
    out = jax.jit(program)(params, images, empty, stack_conds(per_image), alphas)
    assert out.edited.shape == images.shape
    assert out.orig_score.shape == (batch, 2)
    assert np.all(np.isfinite(np.asarray(out.edited)))

    # single-image oracle: the pipeline calls the adapter path makes
    clf = ValenceArousalMidu(model=pipe.midu_model, variables=params.midu)
    t_last = pipe.sched.timesteps[-1]
    for b in range(batch):
        img = images[b:b + 1]
        lat = pipe.encode_image(params, img)
        _, mid = pipe._unet(params.unet, lat, t_last, empty, None)
        orig = clf.predict(mid)
        ref = jnp.clip(orig + alphas[b][None], 0.0, 1.0)
        noisy, pivots = pipe.reverse_sample(params, lat, empty)
        nto = pipe.null_optimization(params, pivots, per_image[b].cond_embeds,
                                     empty, guidance_scale=2.0, num_inner_steps=3)
        out_lat = pipe.sample(params, noisy, per_image[b].cfg_embeds,
                              guidance_scale=2.0, guidance_clf_scale=0.2,
                              uncond_embeds_per_step=nto,
                              midu_reference_value=ref)
        edited = pipe.decode_latents(params, out_lat)
        np.testing.assert_allclose(np.asarray(out.orig_score[b]),
                                   np.asarray(orig[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.edited[b]),
                                   np.asarray(edited[0]), atol=5e-4)


@pytest.mark.slow
def test_batched_edit_sharded_over_mesh(key, rng):
    """Batch axis sharded over the 8-device data axis compiles + executes and
    matches the replicated result."""
    from rgie_tpu.parallel import batch_sharding, create_mesh, replicate

    pipe, params = _tiny_pipe(key)
    mesh = create_mesh()
    batch = mesh.devices.size
    images = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, 3)).astype(np.float32))
    per_image = _conds(rng, batch)
    conds = stack_conds(per_image)
    empty = jnp.zeros((1, 5, 32))
    alphas = jnp.zeros((batch, 2), jnp.float32)

    program = make_batched_edit(pipe, guidance_scale=2.0, guidance_clf_scale=0.2,
                                use_nto=True, num_inner_steps=2)
    ref_out = jax.jit(program)(params, images, empty, conds, alphas)

    sharding = batch_sharding(mesh)
    params_r = replicate(params, mesh)
    images_s = jax.device_put(images, sharding)
    conds_s = jax.tree.map(lambda x: jax.device_put(x, sharding), conds)
    alphas_s = jax.device_put(alphas, sharding)
    out = jax.jit(program)(params_r, images_s, empty, conds_s, alphas_s)
    assert len(out.edited.sharding.device_set) == batch
    # Sharded compilation reorders fusions; drift through the 3-scan program
    # stays well under a pixel quantum (1/255).
    np.testing.assert_allclose(np.asarray(out.edited), np.asarray(ref_out.edited),
                               atol=1.5e-3)


def test_batched_edit_remat_matches(key, rng):
    """remat_unet changes memory, not math."""
    pipe, params = _tiny_pipe(key, num_steps=2)
    import dataclasses
    pipe_r = dataclasses.replace(pipe, remat_unet=True)
    batch = 2
    images = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, 3)).astype(np.float32))
    conds = stack_conds(_conds(rng, batch))
    empty = jnp.zeros((1, 5, 32))
    alphas = jnp.zeros((batch, 2), jnp.float32)

    kwargs = dict(guidance_scale=2.0, guidance_clf_scale=0.2, use_nto=True,
                  num_inner_steps=2)
    out = jax.jit(make_batched_edit(pipe, **kwargs))(params, images, empty, conds, alphas)
    out_r = jax.jit(make_batched_edit(pipe_r, **kwargs))(params, images, empty, conds, alphas)
    np.testing.assert_allclose(np.asarray(out.edited), np.asarray(out_r.edited),
                               atol=2e-5)


@pytest.mark.slow
def test_batched_edit_tensor_parallel(key, rng):
    """(data=4, model=2) mesh with UNet/VAE/midu weights output-channel
    sharded over `model` (parallel.mesh.shard_model): GSPMD compiles/executes
    the unchanged edit program and matches the replicated result — the fit
    path for 1024px programs whose weights + grad activations exceed one
    chip."""
    from rgie_tpu.parallel import batch_sharding, create_mesh
    from rgie_tpu.parallel.mesh import shard_model

    pipe, params = _tiny_pipe(key)
    mesh = create_mesh((4, 2))
    batch = 4
    images = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, 3)).astype(np.float32))
    conds = stack_conds(_conds(rng, batch))
    empty = jnp.zeros((1, 5, 32))
    alphas = jnp.zeros((batch, 2), jnp.float32)

    program = make_batched_edit(pipe, guidance_scale=2.0, guidance_clf_scale=0.2,
                                use_nto=True, num_inner_steps=2)
    ref_out = jax.jit(program)(params, images, empty, conds, alphas)

    params_tp = shard_model(params, mesh)
    # At least the 16-channel tiny weights actually split over model=2.
    assert any(len(x.sharding.device_set) > 1
               for x in jax.tree.leaves(params_tp))
    sharding = batch_sharding(mesh)
    images_s = jax.device_put(images, sharding)
    conds_s = jax.tree.map(lambda x: jax.device_put(x, sharding), conds)
    alphas_s = jax.device_put(alphas, sharding)
    out = jax.jit(program)(params_tp, images_s, empty, conds_s, alphas_s)
    np.testing.assert_allclose(np.asarray(out.edited), np.asarray(ref_out.edited),
                               atol=1.5e-3)
