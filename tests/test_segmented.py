"""Segmented diffusion edit: the host-chained phase programs must reproduce
the monolithic `make_batched_edit` results exactly (the phase methods ARE the
monolith's loop bodies), window size must not change numerics (incl. a ragged
tail window), and the phases must accept mesh-sharded inputs. The segmented
driver exists because single executions past ~60 s are killed on the
tunneled single-chip workers (see rgie_tpu/diffusion/segmented.py docstring);
the reference has no analog (it loops bs=1 images on a host loop,
`/root/reference/src/adapt_images.py:60-85`)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.diffusion import schedulers as SCH
from rgie_tpu.diffusion.batched import (BatchedConds, make_batched_edit,
                                        stack_conds)
from rgie_tpu.diffusion.pipeline import InversionResamplingPipeline, PipelineParams
from rgie_tpu.diffusion.segmented import make_segmented_edit
from rgie_tpu.diffusion.unet import UNetConfig, create_unet
from rgie_tpu.diffusion.vae import VaeConfig, create_vae
from rgie_tpu.models.midu import MiduSD


def _tiny_pipe(key, num_steps=3, **pipe_kwargs):
    k1, k2, k3 = jax.random.split(key, 3)
    unet, unet_vars = create_unet(k1, UNetConfig.tiny(), sample_hw=16, context_len=5)
    vae, vae_vars = create_vae(k2, VaeConfig.tiny(), image_hw=32)
    midu = MiduSD(2)
    midu_vars = midu.init(k3, jnp.zeros((1, 8, 8, 16)))
    sched = SCH.make_schedule(num_steps)
    pipe = InversionResamplingPipeline(unet=unet, vae=vae, sched=sched,
                                       midu_model=midu, **pipe_kwargs)
    params = PipelineParams(unet=unet_vars, vae=vae_vars, midu=midu_vars)
    return pipe, params


def _conds(rng, batch):
    per_image = []
    for _ in range(batch):
        cond = jnp.asarray(rng.normal(size=(1, 5, 32)).astype(np.float32))
        uncond = jnp.zeros((1, 5, 32))
        per_image.append(BatchedConds(
            cfg_embeds=jnp.concatenate([uncond, cond], axis=0),
            cond_embeds=cond))
    return per_image


@pytest.mark.slow
@pytest.mark.parametrize("chunk", [1, 2])
def test_segmented_matches_monolith(key, rng, chunk):
    """chunk=2 over 3 steps exercises the ragged tail window (two compiled
    window shapes); chunk=1 is the per-step extreme."""
    pipe, params = _tiny_pipe(key)
    batch = 2
    images = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, 3)).astype(np.float32))
    conds = stack_conds(_conds(rng, batch))
    empty = jnp.zeros((1, 5, 32))
    alphas = jnp.asarray([[0.1, 0.1], [-0.1, -0.1]], jnp.float32)

    kwargs = dict(guidance_scale=2.0, guidance_clf_scale=0.2, use_nto=True,
                  use_reference=True, num_inner_steps=3)
    mono = jax.jit(make_batched_edit(pipe, **kwargs))(
        params, images, empty, conds, alphas)
    seg = make_segmented_edit(pipe, chunk_steps=chunk, **kwargs)(
        params, images, empty, conds, alphas)

    np.testing.assert_allclose(np.asarray(seg.orig_score),
                               np.asarray(mono.orig_score), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg.edited),
                               np.asarray(mono.edited), atol=5e-4)
    np.testing.assert_allclose(np.asarray(seg.adapted_score),
                               np.asarray(mono.adapted_score), atol=1e-4)


@pytest.mark.slow
def test_segmented_matches_monolith_sigma_dpm(key, rng):
    """Sigma-space DPM (karras tables) carries DpmState across window
    boundaries — the carry-chaining regression test."""
    steps = 4
    sig = SCH.make_dpm_sigma_schedule(steps, use_karras_sigmas=True)
    sig_inv = SCH.make_dpm_sigma_schedule(steps, use_karras_sigmas=True,
                                          inverse=True)
    pipe, params = _tiny_pipe(key, num_steps=steps, scheduler_type="dpm",
                              sigma_sched=sig, sigma_sched_inv=sig_inv)
    batch = 2
    images = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, 3)).astype(np.float32))
    conds = stack_conds(_conds(rng, batch))
    empty = jnp.zeros((1, 5, 32))
    alphas = jnp.zeros((batch, 2), jnp.float32)

    kwargs = dict(guidance_scale=2.0, guidance_clf_scale=0.0, use_nto=False,
                  num_inner_steps=2)
    mono = jax.jit(make_batched_edit(pipe, **kwargs))(
        params, images, empty, conds, alphas)
    seg = make_segmented_edit(pipe, chunk_steps=3, **kwargs)(
        params, images, empty, conds, alphas)
    np.testing.assert_allclose(np.asarray(seg.edited),
                               np.asarray(mono.edited), atol=5e-4)


@pytest.mark.slow
def test_segmented_sharded_inputs(key, rng):
    """Phase programs accept batch-axis-sharded inputs over the virtual mesh
    (the data-parallel scale-out path runs segmented too)."""
    from rgie_tpu.parallel import batch_sharding, create_mesh, replicate

    pipe, params = _tiny_pipe(key, num_steps=2)
    mesh = create_mesh()
    batch = mesh.devices.size
    images = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, 3)).astype(np.float32))
    conds = stack_conds(_conds(rng, batch))
    empty = jnp.zeros((1, 5, 32))
    alphas = jnp.zeros((batch, 2), jnp.float32)

    kwargs = dict(guidance_scale=2.0, guidance_clf_scale=0.2, use_nto=True,
                  num_inner_steps=2)
    program = make_segmented_edit(pipe, chunk_steps=2, **kwargs)
    ref_out = program(params, images, empty, conds, alphas)

    sharding = batch_sharding(mesh)
    out = program(replicate(params, mesh),
                  jax.device_put(images, sharding),
                  empty,
                  jax.tree.map(lambda x: jax.device_put(x, sharding), conds),
                  jax.device_put(alphas, sharding))
    assert len(out.edited.sharding.device_set) == batch
    np.testing.assert_allclose(np.asarray(out.edited),
                               np.asarray(ref_out.edited), atol=1.5e-3)
