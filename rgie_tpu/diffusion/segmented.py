"""Segmented (multi-execution) batched diffusion edit.

`make_batched_edit` fuses VAE encode -> inversion -> NTO -> guided sampling
-> VAE decode into ONE XLA execution (`rgie_tpu/diffusion/batched.py`). On
the tunneled single-chip workers this repo runs on, one device execution that
runs much past ~60 s is killed (worker restart surfaced as a JaxRuntimeError
UNAVAILABLE crash). Measured round 3, SD-512 NTO edits with per-block remat:
batch 2 x 75 steps (59.6 s) runs; batch 3 x 50 steps (~67 s projected) dies
with XLA-reported peak memory of only 4.4 GB on a 16 GB chip; batch 4 x 2
steps (identical shapes, 1.6 s) runs. The per-chip "memory ceilings" of
round 2 (BASELINE.md) were in fact EXECUTION-DURATION ceilings.

This driver removes them by splitting the edit into phase programs — prep
(encode + original score), inversion windows, NTO windows, sampling windows,
finish (decode + adapted score) — chained from the host. Step tables
(timesteps / sigma indices) arrive as DATA, so every window of the same
length reuses one compiled program per phase; per-execution device time drops
by ~S/chunk_steps while numerics match the monolith exactly (the phase
methods `invert_steps` / `null_optimization_steps` / `sample_steps` ARE the
monolith's loop bodies — `pipeline.py` delegates to them).

Reference parity: the edit semantics are those of `revert_and_sample`
(`/root/reference/src/pipelines/InversionResamplingDiffusionPipeline.py:74-122`);
segmentation only changes how many XLA executions deliver them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rgie_tpu.diffusion import schedulers as SCH
from rgie_tpu.diffusion.batched import BatchedConds, BatchedEditOutputs
from rgie_tpu.diffusion.pipeline import (InversionResamplingPipeline,
                                         PipelineParams, SdxlCond)
from rgie_tpu.models.midu import ValenceArousalMidu


def _batched_dpm_state(latents: jnp.ndarray) -> SCH.DpmState:
    """Per-image DpmState for (B, 1, h, w, c) latents: every leaf gains the
    leading batch axis, exactly as `vmap` would have created it inside the
    monolithic program."""
    b = latents.shape[0]
    return jax.vmap(lambda _: SCH.dpm_init_state(latents.shape[1:],
                                                 latents.dtype))(jnp.arange(b))


def make_segmented_edit(pipe: InversionResamplingPipeline, *,
                        guidance_scale: float = 2.0,
                        guidance_clf_scale: float = 0.2,
                        use_nto: bool = True,
                        use_reference: bool = False,
                        end_iteration: Optional[int] = None,
                        num_inner_steps: int = 10,
                        nto_epsilon: float = 1e-5,
                        guidance_rescale: float = 0.0,
                        midu_is_minimized: bool = True,
                        chunk_steps: int = 8):
    """Build ``program(params, images, empty_embeds, conds, alpha,
    added_empty=None) -> BatchedEditOutputs`` with the same contract as
    `make_batched_edit`, executed as a host-chained sequence of jitted phase
    programs of at most ``chunk_steps`` diffusion steps each.

    Weights stay jit ARGUMENTS throughout (PipelineParams is the first
    argument of every phase program — the repo-wide no-closed-weights rule).
    """
    s = pipe.sched.num_inference_steps
    end_it = end_iteration if end_iteration is not None else s
    start_iteration = s - end_it

    # Scoped-VMEM compiler option: pure opt-in for the diffusion family until
    # device-measured (utils/compileopts.py policy). None on CPU/tests.
    from rgie_tpu.utils.compileopts import tpu_compiler_options
    copts = tpu_compiler_options(measured_default_kib=None)

    # ---- phase programs (vmapped over the batch, compiled lazily) ----------

    def prep(params: PipelineParams, image, empty, alpha, added_empty):
        clf = ValenceArousalMidu(model=pipe.midu_model, variables=params.midu)
        t_last = pipe.sched.timesteps[-1]
        lat = pipe.encode_image(params, image[None])
        _, mid = pipe._unet(params.unet, lat, t_last, empty, added_empty)
        orig = clf.predict(mid)
        ref = jnp.clip(orig + alpha[None], 0.0, 1.0)
        return orig[0], ref, lat

    jit_prep = jax.jit(jax.vmap(prep, in_axes=(None, 0, None, 0, None)),
                       compiler_options=copts)

    def invert_chunk(params, lat, state, empty, added_empty, ts, src_ts, i_vals):
        return pipe.invert_steps(params, lat, state, empty, added_empty,
                                 ts, src_ts, i_vals)

    # The latent/state carries are dead after each window — donate them so
    # chained windows reuse the buffers instead of copying (no-op on CPU).
    jit_invert = jax.jit(jax.vmap(
        invert_chunk, in_axes=(None, 0, 0, None, None, None, None, None)),
        donate_argnums=(1, 2), compiler_options=copts)

    def nto_chunk(params, lat_cur, uncond, pivots_rev, cond_embeds,
                  added_cond, added_uncond, i_vals):
        return pipe.null_optimization_steps(
            params, lat_cur, uncond, pivots_rev, cond_embeds, i_vals,
            guidance_scale, added_cond=added_cond, added_uncond=added_uncond,
            num_inner_steps=num_inner_steps, epsilon=nto_epsilon)

    jit_nto = jax.jit(jax.vmap(
        nto_chunk, in_axes=(None, 0, 0, 0, 0, 0, 0, None)),
        donate_argnums=(1, 2), compiler_options=copts)

    def sample_chunk(params, lat, state, cfg_embeds, added_cfg, nto_stack,
                     ref, ts, next_ts, i_vals):
        return pipe.sample_steps(
            params, lat, state, cfg_embeds, added_cfg, ts, next_ts, i_vals,
            guidance_scale=guidance_scale,
            guidance_clf_scale=guidance_clf_scale,
            guidance_rescale=guidance_rescale,
            uncond_embeds_per_step=nto_stack,
            midu_is_minimized=midu_is_minimized,
            midu_reference_value=ref)

    nto_ax = 0 if use_nto else None
    ref_ax = 0 if use_reference else None
    jit_sample = jax.jit(jax.vmap(
        sample_chunk, in_axes=(None, 0, 0, 0, 0, nto_ax, ref_ax,
                               None, None, None)),
        donate_argnums=(1, 2), compiler_options=copts)

    def finish(params, lat, empty, added_empty):
        clf = ValenceArousalMidu(model=pipe.midu_model, variables=params.midu)
        t_last = pipe.sched.timesteps[-1]
        img = pipe.decode_latents(params, lat)
        lat2 = pipe.encode_image(params, img)
        _, mid = pipe._unet(params.unet, lat2, t_last, empty, added_empty)
        return img[0], clf.predict(mid)[0]

    jit_finish = jax.jit(jax.vmap(finish, in_axes=(None, 0, None, None)),
                         compiler_options=copts)

    def _windows(n: int):
        return [(a, min(a + chunk_steps, n)) for a in range(0, n, chunk_steps)]

    # ---- host orchestration ------------------------------------------------

    def program(params: PipelineParams, images: jnp.ndarray,
                empty_embeds: jnp.ndarray, conds: BatchedConds,
                alpha: jnp.ndarray,
                added_empty: Optional[SdxlCond] = None) -> BatchedEditOutputs:
        b = images.shape[0]
        orig, ref, lat = jit_prep(params, images, empty_embeds, alpha,
                                  added_empty)
        if not use_reference:
            ref = None

        # Inversion windows. pivots accumulate along axis 1 (the per-image
        # step axis), pivots[:, 0] being the clean latent as in
        # reverse_sample.
        ts_i, src_i, iv_i = pipe.invert_tables(end_it)
        n_inv = int(ts_i.shape[0])
        state = _batched_dpm_state(lat)
        piv_parts = [lat[:, None]]
        for a, z in _windows(n_inv):
            lat, state, piv = jit_invert(params, lat, state, empty_embeds,
                                         added_empty, ts_i[a:z], src_i[a:z],
                                         iv_i[a:z])
            piv_parts.append(piv)
        pivots = jnp.concatenate(piv_parts, axis=1)   # (B, n_inv+1, 1, h, w, c)
        noisy = lat

        # NTO windows (chained (lat_cur, uncond) carry).
        nto_stack = None
        if use_nto:
            idx = jnp.clip(s - 1 - jnp.arange(s), 0, pivots.shape[1] - 1)
            pivots_rev = pivots[:, idx]                  # (B, s, 1, h, w, c)
            lat_cur = pivots[:, -1]
            uncond = jnp.broadcast_to(empty_embeds,
                                      (b,) + empty_embeds.shape)
            parts = []
            for a, z in _windows(s):
                lat_cur, uncond, part = jit_nto(
                    params, lat_cur, uncond, pivots_rev[:, a:z],
                    conds.cond_embeds, conds.added_cond, conds.added_uncond,
                    jnp.arange(a, z))
                parts.append(part)
            nto_stack = jnp.concatenate(parts, axis=1)   # (B, s, 1, L, D)
            nto_stack = nto_stack.squeeze(2) if nto_stack.ndim == 5 else nto_stack

        # Sampling windows.
        ts_s, next_s, iv_s = pipe.sample_tables(start_iteration)
        n_smp = int(ts_s.shape[0])
        state = _batched_dpm_state(noisy)
        lat = noisy
        for a, z in _windows(n_smp):
            lat, state = jit_sample(params, lat, state, conds.cfg_embeds,
                                    conds.added_cfg, nto_stack, ref,
                                    ts_s[a:z], next_s[a:z], iv_s[a:z])

        edited, adapted = jit_finish(params, lat, empty_embeds, added_empty)
        return BatchedEditOutputs(edited=edited, orig_score=orig,
                                  adapted_score=adapted)

    return program
