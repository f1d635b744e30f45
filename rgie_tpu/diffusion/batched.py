"""Batched, mesh-sharded diffusion editing — the whole flagship edit as ONE
XLA program over an image batch.

The reference edits one image at a time on a host loop (`/root/reference/src/
adapt_images.py:60-85` iterates a bs=1 DataLoader; `revert_and_sample`,
`src/pipelines/InversionResamplingDiffusionPipeline.py:74-122`). Here the full
per-image program — VAE encode -> original VA score -> DDIM inversion scan ->
null-text-optimization scan -> guided sampling scan -> VAE decode -> adapted
VA rescore — is `vmap`ped over a batch of images and the batch axis is
sharded over the mesh's ``data`` axis, so B edits run in lockstep and chips
come in for free (per-image edits are embarrassingly parallel; SURVEY §2.3).

The per-image conditioning (caption-dependent prompt embeddings and SDXL
added conds) rides along as batch-axis pytrees (``BatchedConds``); the
empty-prompt embeddings used by inversion and scoring are shared across the
batch. NTO's data-dependent inner `while_loop` vmaps soundly: JAX runs the
body while ANY image's early-stop condition holds and select-masks finished
images' carries, so per-image results match the single-image path.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from rgie_tpu.diffusion.pipeline import (InversionResamplingPipeline,
                                         PipelineParams, SdxlCond)
from rgie_tpu.models.midu import ValenceArousalMidu


class BatchedConds(NamedTuple):
    """Per-image conditioning, every leaf with a leading batch axis."""

    cfg_embeds: jnp.ndarray              # (B, 2, L, D) [uncond; cond]
    cond_embeds: jnp.ndarray             # (B, 1, L, D) NTO caption embeds
    added_cfg: Optional[SdxlCond] = None     # SDXL: leaves (B, 2, ...)
    added_cond: Optional[SdxlCond] = None    # SDXL: leaves (B, 1, ...)
    added_uncond: Optional[SdxlCond] = None  # SDXL: leaves (B, 1, ...)


class BatchedEditOutputs(NamedTuple):
    edited: jnp.ndarray         # (B, H, W, 3) in [0, 1]
    orig_score: jnp.ndarray     # (B, num_outputs) VA of the input
    adapted_score: jnp.ndarray  # (B, num_outputs) VA of the edit


def make_batched_edit(pipe: InversionResamplingPipeline, *,
                      guidance_scale: float = 2.0,
                      guidance_clf_scale: float = 0.2,
                      use_nto: bool = True,
                      use_reference: bool = False,
                      end_iteration: Optional[int] = None,
                      num_inner_steps: int = 10,
                      nto_epsilon: float = 1e-5,
                      guidance_rescale: float = 0.0,
                      midu_is_minimized: bool = True):
    """Build ``program(params, images, empty_embeds, conds, alpha,
    added_empty=None) -> BatchedEditOutputs``.

    ``images`` (B, H, W, 3) in [0,1] (already transform_image'd);
    ``empty_embeds`` (1, L, D) empty-prompt embeddings shared by inversion and
    scoring (adapter semantics: revert_and_sample inverts with empty prompts,
    reference pipeline.py:83-84); ``alpha`` (B, num_outputs) relative VA
    offsets, used only when ``use_reference`` (GuidanceConfig.reference_value
    computed per image WITHOUT the reference's shared-config mutation bug,
    src/adapt_images/adapter.py:33-36).
    """
    s = pipe.sched.num_inference_steps
    end_it = end_iteration if end_iteration is not None else s
    start_iteration = s - end_it

    def one(params: PipelineParams, image, empty, conds: BatchedConds, alpha,
            added_empty: Optional[SdxlCond]):
        clf = ValenceArousalMidu(model=pipe.midu_model, variables=params.midu)
        t_last = pipe.sched.timesteps[-1]

        def score(img):
            lat = pipe.encode_image(params, img)
            _, mid = pipe._unet(params.unet, lat, t_last, empty, added_empty)
            return clf.predict(mid)

        orig = score(image[None])                        # (1, D)
        reference_value = None
        if use_reference:
            reference_value = jnp.clip(orig + alpha[None], 0.0, 1.0)

        latents = pipe.encode_image(params, image[None])
        noisy, pivots = pipe.reverse_sample(params, latents, empty,
                                            added=added_empty,
                                            end_iteration=end_it)

        nto_embeds = None
        if use_nto:
            nto_embeds = pipe.null_optimization(
                params, pivots, conds.cond_embeds, empty,
                guidance_scale=guidance_scale,
                added_cond=conds.added_cond, added_uncond=conds.added_uncond,
                num_inner_steps=num_inner_steps, epsilon=nto_epsilon)

        out_lat = pipe.sample(
            params, noisy, conds.cfg_embeds, added=conds.added_cfg,
            guidance_scale=guidance_scale,
            guidance_clf_scale=guidance_clf_scale,
            guidance_rescale=guidance_rescale,
            uncond_embeds_per_step=nto_embeds,
            start_iteration=start_iteration,
            midu_is_minimized=midu_is_minimized,
            midu_reference_value=reference_value)
        img = pipe.decode_latents(params, out_lat)       # (1, H, W, 3)
        adapted = score(img)
        return img[0], orig[0], adapted[0]

    batched = jax.vmap(one, in_axes=(None, 0, None, 0, 0, None))

    def program(params: PipelineParams, images: jnp.ndarray,
                empty_embeds: jnp.ndarray, conds: BatchedConds,
                alpha: jnp.ndarray,
                added_empty: Optional[SdxlCond] = None) -> BatchedEditOutputs:
        edited, orig, adapted = batched(params, images, empty_embeds, conds,
                                        alpha, added_empty)
        return BatchedEditOutputs(edited=edited, orig_score=orig,
                                  adapted_score=adapted)

    return program


def stack_conds(per_image: list) -> BatchedConds:
    """Stack a list of per-image BatchedConds (leaves without the batch axis)
    into one batch-axis pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_image)
