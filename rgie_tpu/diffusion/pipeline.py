"""Inversion-resampling diffusion pipeline: DDIM-invert a real image, run
null-text optimization, resample with classifier-free + classifier guidance.

TPU-native redesign of the reference pipeline family
(`/root/reference/src/pipelines/InversionResamplingDiffusionPipeline.py`,
`InversionResamplingStableDiffusionPipeline.py`, `...XLPipeline.py`):

  * inversion (reverse_sample:26-49) -> one `lax.scan` over ascending DDIM
    steps, pivot latents are the scan's stacked outputs (the reference APPENDS
    to a never-cleared list — SURVEY §2.4 quirk — we return them per call);
  * sampling (sample:51-145) -> one `lax.scan`: CFG pair batched through the
    UNet, DDIM/DPM step, then classifier guidance as `jax.grad` of the midu
    score w.r.t. the latents (the reference's autograd.grad at :126-142),
    gradient-normalized;
  * null-text optimization (_null_optimization:124-219) -> outer scan over
    timesteps, inner `lax.while_loop` with the reference's early-stop
    `loss < eps + i*2e-5` and per-step Adam on the uncond embeddings
    (lr = base_lr * (1 - i/100)); bf16 UNet + fp32 embedding masters replace
    the torch GradScaler dance.

Weights are jit ARGUMENTS (PipelineParams), not closure constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rgie_tpu.config import AdaptConfig, GuidanceConfig
from rgie_tpu.diffusion import schedulers as SCH
from rgie_tpu.diffusion.schedulers import DiffusionSchedule
from rgie_tpu.diffusion.unet import UNet2DCondition
from rgie_tpu.diffusion.vae import AutoencoderKL, decode_tiled, encode_tiled
from rgie_tpu.models.midu import ValenceArousalMidu


class PipelineParams(NamedTuple):
    unet: Any
    vae: Any
    midu: Optional[Any] = None


class SdxlCond(NamedTuple):
    """SDXL added conditioning, rows aligned with the embeds batch."""

    text_embeds: jnp.ndarray  # (B, 1280) pooled
    time_ids: jnp.ndarray     # (B, 6)


@dataclasses.dataclass(frozen=True)
class InversionResamplingPipeline:
    """Static configuration: modules + schedule. All methods are pure and
    jittable given a PipelineParams pytree."""

    unet: UNet2DCondition
    vae: AutoencoderKL
    sched: DiffusionSchedule
    midu_model: Any = None            # MiduSD/MiduSDXL module (or None)
    normalize_gradient: bool = True   # AdaptConfig.normalize_gradient
    is_xl: bool = False
    scheduler_type: str = "ddim"      # "ddim" | "dpm" (AdaptConfig.scheduler_type)
    # Rematerialize UNet activations on the two differentiated paths (NTO inner
    # loss, classifier guidance): trades one extra forward for ~the UNet's
    # activation footprint, which is what gates the batch size of the batched
    # edit (SURVEY §7.3 memory cliff).
    remat_unet: bool = False
    # Tiled VAE transport (diffusers enable_tiling analog, vae.decode_tiled/
    # encode_tiled): latent tile size, or None for whole-image VAE. At
    # SDXL-1024 the full-res decoder activations do not fit one chip next to
    # the UNet; tiles run sequentially via lax.map. Stride defaults to 3/4
    # of the tile (25% crossfaded overlap), diffusers' overlap_factor.
    vae_tile: Optional[int] = None
    vae_tile_stride: Optional[int] = None
    # Sigma-space DPM tables (karras sigmas / lu lambdas — the reference's
    # SDXL DPM configuration, ...XLPipeline.py:29-32). When set (and
    # scheduler_type == "dpm"), sampling steps over `sigma_sched` and
    # inversion over `sigma_sched_inv` (whose rounded-timestep dedup can make
    # it SHORTER than num_inference_steps — the documented diffusers inverse
    # behavior). Build both via SCH.make_dpm_sigma_schedule.
    sigma_sched: Optional[SCH.DpmSigmaSchedule] = None
    sigma_sched_inv: Optional[SCH.DpmSigmaSchedule] = None

    # -- UNet call helper ---------------------------------------------------

    def _unet(self, params, latents, t, embeds, added: Optional[SdxlCond]):
        if self.is_xl and added is not None:
            b = latents.shape[0]
            a_text = jnp.broadcast_to(added.text_embeds, (b,) + added.text_embeds.shape[1:])
            a_time = jnp.broadcast_to(added.time_ids, (b, 6))

            def call(p, lat, tt, e, at, ai):
                return self.unet.apply(p, lat, tt, e, added_text_embeds=at,
                                       added_time_ids=ai)

            if self.remat_unet:
                call = jax.checkpoint(call)
            return call(params, latents, t, embeds, a_text, a_time)

        def call(p, lat, tt, e):
            return self.unet.apply(p, lat, tt, e)

        if self.remat_unet:
            call = jax.checkpoint(call)
        return call(params, latents, t, embeds)

    # -- VAE transport (get_latents_from_img / decode_to_pil analogs) -------

    def encode_image(self, params: PipelineParams, image: jnp.ndarray,
                     key=None) -> jnp.ndarray:
        """(B, H, W, 3) in [0,1] -> scaled latents. The reference preprocesses
        to [-1,1] via the diffusers image processor
        (...StableDiffusionPipeline.py:147-150)."""
        x = image * 2.0 - 1.0
        if self.vae_tile is not None:
            lat = encode_tiled(self.vae, params.vae, x, key, tile=self.vae_tile,
                               stride=self._vae_stride())
        else:
            lat = self.vae.apply(params.vae, x, key, method=AutoencoderKL.encode)
        # Scheduler math runs in f32 regardless of the VAE compute dtype (the
        # scan carries and DDIM alphas stay f32; the UNet casts internally).
        return lat.astype(jnp.float32)

    def _vae_stride(self) -> int:
        return self.vae_tile_stride or max((self.vae_tile * 3) // 4, 1)

    def decode_latents(self, params: PipelineParams, latents: jnp.ndarray) -> jnp.ndarray:
        """latents -> images in [0,1] (diff_utils.decode_latents:109-119)."""
        if self.vae_tile is not None:
            img = decode_tiled(self.vae, params.vae, latents, tile=self.vae_tile,
                               stride=self._vae_stride())
        else:
            img = self.vae.apply(params.vae, latents, method=AutoencoderKL.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    # -- inversion ----------------------------------------------------------

    def invert_tables(self, end_iteration: Optional[int] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Full inversion step tables ``(ts, src_ts, i_vals)``, aligned per
        step. ``src_ts`` is only meaningful for table-DPM, ``i_vals`` (global
        step indices) for sigma-DPM; unused slots are zeros so the shapes are
        uniform. A segmented driver slices these and feeds ``invert_steps``
        chunk by chunk."""
        if self.scheduler_type == "dpm" and self.sigma_sched_inv is not None:
            ts = self.sigma_sched_inv.timesteps
            if end_iteration is not None:
                ts = ts[:end_iteration]
            i_vals = jnp.arange(ts.shape[0])
            return ts, jnp.zeros_like(ts), i_vals
        ts = SCH.inverse_timesteps(self.sched)
        if end_iteration is not None:
            ts = ts[:end_iteration]
        if self.scheduler_type == "dpm":
            dt = self.sched.num_train_timesteps // self.sched.num_inference_steps
            src_ts = jnp.concatenate([ts[:1] - dt, ts[:-1]])
        else:
            src_ts = jnp.zeros_like(ts)
        return ts, src_ts, jnp.arange(ts.shape[0])

    def invert_steps(self, params: PipelineParams, latents: jnp.ndarray,
                     state: SCH.DpmState, embeds: jnp.ndarray,
                     added: Optional[SdxlCond], ts: jnp.ndarray,
                     src_ts: jnp.ndarray, i_vals: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, SCH.DpmState, jnp.ndarray]:
        """Inversion over an explicit step window (a slice of
        ``invert_tables``). Carries the DPM state across windows (ignored by
        DDIM). Returns (final_latents, state, pivots (K, ...))."""
        use_sigma = self.scheduler_type == "dpm" and self.sigma_sched_inv is not None

        def body(carry, x):
            lat, st = carry
            t, t_src, i = x
            if use_sigma:
                # Sigma-space (karras/lu) inversion: step i moves sigmas[i]
                # -> sigmas[i+1] (ascending from 0 = clean latent); the UNet
                # conditions on the table's rounded timesteps (the diffusers
                # inverse-scheduler loop convention).
                eps, _ = self._unet(params.unet, lat, t, embeds, added)
                new, st = SCH.dpm_sigma_step(self.sigma_sched_inv, eps, i, lat, st)
            elif self.scheduler_type == "dpm":
                eps, _ = self._unet(params.unet, lat, t_src, embeds, added)
                new, st = SCH.dpm_step(self.sched, eps, t_src, t, lat, st)
            else:
                eps, _ = self._unet(params.unet, lat, t, embeds, added)
                new = SCH.ddim_inverse_step(self.sched, eps, t, lat)
            return (new, st), new

        (final, state), pivots = jax.lax.scan(body, (latents, state),
                                              (ts, src_ts, i_vals))
        return final, state, pivots

    def reverse_sample(self, params: PipelineParams, latents: jnp.ndarray,
                       embeds: jnp.ndarray, added: Optional[SdxlCond] = None,
                       end_iteration: Optional[int] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """DDIM inversion (reference: reverse_sample,
        ...StableDiffusionPipeline.py:26-49). Returns (noisy_latents,
        pivot_latents (S+1, ...)) — pivots[0] is the clean latent."""
        ts, src_ts, i_vals = self.invert_tables(end_iteration)
        state = SCH.dpm_init_state(latents.shape, latents.dtype)
        final, _, pivots = self.invert_steps(params, latents, state, embeds,
                                             added, ts, src_ts, i_vals)
        return final, jnp.concatenate([latents[None], pivots], axis=0)

    # -- sampling with CFG + classifier guidance -----------------------------

    def sample(self, params: PipelineParams, latents: jnp.ndarray,
               prompt_embeds: jnp.ndarray,
               added: Optional[SdxlCond] = None,
               guidance_scale: float = 7.5,
               guidance_clf_scale: float = 0.0,
               guidance_rescale: float = 0.0,
               uncond_embeds_per_step: Optional[jnp.ndarray] = None,
               start_iteration: int = 0,
               midu_is_minimized: bool = True,
               midu_reference_value: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Denoise with CFG and per-step classifier guidance (reference:
        sample, ...StableDiffusionPipeline.py:51-145). ``prompt_embeds`` is
        (2, L, D) [uncond; cond] when guidance_scale > 1 else (1, L, D).
        ``uncond_embeds_per_step`` (S, L, D) substitutes NTO embeddings
        (:108-109)."""
        ts, next_ts, steps = self.sample_tables(start_iteration)
        lat, state = self.sample_steps(
            params, latents, SCH.dpm_init_state(latents.shape, latents.dtype),
            prompt_embeds, added, ts, next_ts, steps,
            guidance_scale=guidance_scale,
            guidance_clf_scale=guidance_clf_scale,
            guidance_rescale=guidance_rescale,
            uncond_embeds_per_step=uncond_embeds_per_step,
            midu_is_minimized=midu_is_minimized,
            midu_reference_value=midu_reference_value)
        return lat

    def sample_tables(self, start_iteration: int = 0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Sampling step tables ``(ts, next_ts, i_vals)`` from
        ``start_iteration`` to the end; slice all three together to feed
        ``sample_steps`` window by window."""
        use_sigma = self.scheduler_type == "dpm" and self.sigma_sched is not None
        if use_sigma:
            ts = self.sigma_sched.timesteps[start_iteration:]
        else:
            ts = self.sched.timesteps[start_iteration:]
        dt = self.sched.num_train_timesteps // self.sched.num_inference_steps
        next_ts = jnp.concatenate([ts[1:], ts[-1:] - dt])
        steps = jnp.arange(start_iteration, start_iteration + ts.shape[0])
        return ts, next_ts, steps

    def sample_steps(self, params: PipelineParams, latents: jnp.ndarray,
                     dpm_state: SCH.DpmState, prompt_embeds: jnp.ndarray,
                     added: Optional[SdxlCond], ts: jnp.ndarray,
                     next_ts: jnp.ndarray, i_vals: jnp.ndarray,
                     guidance_scale: float = 7.5,
                     guidance_clf_scale: float = 0.0,
                     guidance_rescale: float = 0.0,
                     uncond_embeds_per_step: Optional[jnp.ndarray] = None,
                     midu_is_minimized: bool = True,
                     midu_reference_value: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, SCH.DpmState]:
        """Guided sampling over an explicit step window (a slice of
        ``sample_tables``); ``i_vals`` are GLOBAL step indices (they index
        ``uncond_embeds_per_step`` and the sigma tables). Returns
        (latents, dpm_state) so a segmented driver can chain windows."""
        use_sigma = self.scheduler_type == "dpm" and self.sigma_sched is not None
        do_cfg = guidance_scale > 1.0
        do_clf = self.midu_model is not None and guidance_clf_scale > 0.0
        latents_in, steps = latents, i_vals

        # Classifier guidance runs single-latent UNet passes with the UNCOND
        # conditioning row (the reference uses prompt_embeds[0],
        # ...StableDiffusionPipeline.py:130).
        added_uncond = None
        if added is not None:
            added_uncond = SdxlCond(text_embeds=added.text_embeds[0:1],
                                    time_ids=added.time_ids[0:1])

        def clf_score(lat, t, uncond):
            _, mid = self._unet(params.unet, lat, t, uncond, added_uncond)
            clf = ValenceArousalMidu(model=self.midu_model, variables=params.midu,
                                     is_minimized=midu_is_minimized,
                                     reference_value=midu_reference_value)
            return clf.score(mid)

        def body(carry, t_and_i):
            lat, dpm_state = carry
            t, t_next, i = t_and_i
            if do_cfg:
                embeds = prompt_embeds
                if uncond_embeds_per_step is not None:
                    embeds = embeds.at[0].set(uncond_embeds_per_step[i])
                pair = jnp.concatenate([lat, lat], axis=0)
                eps_pair, _ = self._unet(params.unet, pair, t, embeds, added)
                eps_u, eps_c = jnp.split(eps_pair, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                if guidance_rescale > 0.0:
                    eps = rescale_noise_cfg(eps, eps_c, guidance_rescale)
            else:
                added_cond = None
                if added is not None:
                    added_cond = SdxlCond(text_embeds=added.text_embeds[-1:],
                                          time_ids=added.time_ids[-1:])
                eps, _ = self._unet(params.unet, lat, t, prompt_embeds, added_cond)

            if use_sigma:
                lat, dpm_state = SCH.dpm_sigma_step(self.sigma_sched, eps, i,
                                                    lat, dpm_state)
            elif self.scheduler_type == "dpm":
                lat, dpm_state = SCH.dpm_step(self.sched, eps, t, t_next, lat, dpm_state)
            else:
                lat = SCH.ddim_step(self.sched, eps, t, lat)

            if do_clf:
                # Classifier guidance on the POST-step latents, gradient
                # normalized (reference :126-142). Uncond row of the embeds.
                uncond = prompt_embeds[0:1] if do_cfg else prompt_embeds
                if uncond_embeds_per_step is not None and do_cfg:
                    uncond = uncond_embeds_per_step[i][None]
                grad = jax.grad(clf_score)(lat, t, uncond)
                if self.normalize_gradient:
                    grad = grad / (jnp.linalg.norm(grad) + 1e-10)
                lat = lat - guidance_clf_scale * grad
            return (lat, dpm_state), None

        (final, dpm_state), _ = jax.lax.scan(body, (latents_in, dpm_state),
                                             (ts, next_ts, steps))
        return final, dpm_state

    # -- null-text optimization ----------------------------------------------

    def null_optimization(self, params: PipelineParams, pivot_latents: jnp.ndarray,
                          cond_embeds: jnp.ndarray, uncond_embeds: jnp.ndarray,
                          guidance_scale: float,
                          added_cond: Optional[SdxlCond] = None,
                          added_uncond: Optional[SdxlCond] = None,
                          num_inner_steps: int = 10, epsilon: float = 1e-5
                          ) -> jnp.ndarray:
        """Per-timestep Adam on the uncond embeddings so CFG sampling follows
        the inversion pivots (reference: _null_optimization, pipeline.py:124-219).
        pivot_latents: (S+1, 1, h, w, 4) from reverse_sample. Returns
        (S, L, D) optimized uncond embeddings.

        Per the reference: outer step i uses pivot pair (x_cur from the top,
        x_prev one below), lr = base_lr * (1 - i/100), inner early stop at
        loss < epsilon + i * 2e-5.
        """
        s = self.sched.num_inference_steps
        lat0 = pivot_latents[-1]
        # Step i consumes pivot pair (carry lat_cur, pivot_latents[s-i-1]):
        # the window method takes the per-step prev-pivots pre-gathered. The
        # index is CLIPPED like the dynamic gather it replaces, so a
        # truncated inversion (end_iteration < S) keeps the old repeat-last
        # behavior instead of a shape error.
        idx = jnp.clip(s - 1 - jnp.arange(s), 0, pivot_latents.shape[0] - 1)
        pivots_rev = pivot_latents[idx]
        _, _, uncond_list = self.null_optimization_steps(
            params, lat0, uncond_embeds, pivots_rev, cond_embeds,
            jnp.arange(s), guidance_scale, added_cond=added_cond,
            added_uncond=added_uncond, num_inner_steps=num_inner_steps,
            epsilon=epsilon)
        return uncond_list.squeeze(1) if uncond_list.ndim == 4 else uncond_list

    def null_optimization_steps(self, params: PipelineParams,
                                lat_cur: jnp.ndarray, uncond: jnp.ndarray,
                                pivots_rev: jnp.ndarray,
                                cond_embeds: jnp.ndarray, i_vals: jnp.ndarray,
                                guidance_scale: float,
                                added_cond: Optional[SdxlCond] = None,
                                added_uncond: Optional[SdxlCond] = None,
                                num_inner_steps: int = 10,
                                epsilon: float = 1e-5
                                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """NTO over an explicit outer-step window. ``i_vals`` are GLOBAL outer
        indices (lr ramp + early-stop threshold depend on them);
        ``pivots_rev[k]`` is the prev-pivot for step ``i_vals[k]`` (i.e.
        pivot_latents[s - i - 1]). Returns (lat_cur, uncond, uncond_list
        (K, L, D)) so a segmented driver can chain windows."""
        ts = self.sched.timesteps
        base_lr = 1e-1 if self.is_xl else 1e-2
        b1, b2, adam_eps = 0.9, 0.999, 1e-8

        def prev_step(eps, t, lat):
            return SCH.ddim_step(self.sched, eps, t, lat)

        def inner_loss(uncond, lat_cur, t, eps_cond, lat_prev):
            eps_u, _ = self._unet(params.unet, lat_cur, t, uncond, added_uncond)
            eps = eps_u + guidance_scale * (eps_cond - eps_u)
            rec = prev_step(eps, t, lat_cur)
            return jnp.mean((rec - lat_prev) ** 2)

        def outer_body(carry, x):
            lat_cur, uncond = carry
            i, lat_prev = x
            t = ts[i]
            eps_cond, _ = self._unet(params.unet, lat_cur, t, cond_embeds, added_cond)
            eps_cond = jax.lax.stop_gradient(eps_cond)
            lr = base_lr * (1.0 - i.astype(jnp.float32) / 100.0)
            thresh = epsilon + i.astype(jnp.float32) * 2e-5

            grad_fn = jax.value_and_grad(inner_loss)

            def cond_fn(state):
                _, m, v, j, loss = state
                return (j < num_inner_steps) & (loss >= thresh)

            def body_fn(state):
                u, m, v, j, _ = state
                loss, g = grad_fn(u, lat_cur, t, eps_cond, lat_prev)
                m = b1 * m + (1 - b1) * g
                v = b2 * v + (1 - b2) * g * g
                tt = (j + 1).astype(jnp.float32)
                mh = m / -jnp.expm1(tt * jnp.log(b1))
                vh = v / -jnp.expm1(tt * jnp.log(b2))
                u = u - lr * mh / (jnp.sqrt(vh) + adam_eps)
                return (u, m, v, j + 1, loss)

            state = (uncond, jnp.zeros_like(uncond), jnp.zeros_like(uncond),
                     jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf))
            uncond_opt, *_ = jax.lax.while_loop(cond_fn, body_fn, state)

            # Final CFG step with the optimized embeddings (reference :209-216).
            pair = jnp.concatenate([lat_cur, lat_cur], axis=0)
            embeds = jnp.concatenate([uncond_opt, cond_embeds], axis=0)
            added = None
            if self.is_xl and added_cond is not None:
                added = SdxlCond(
                    text_embeds=jnp.concatenate([added_uncond.text_embeds,
                                                 added_cond.text_embeds], axis=0),
                    time_ids=jnp.concatenate([added_uncond.time_ids,
                                              added_cond.time_ids], axis=0))
            eps_pair, _ = self._unet(params.unet, pair, t, embeds, added)
            eps_u, eps_c = jnp.split(eps_pair, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            lat_next = prev_step(eps, t, lat_cur)
            return (lat_next, uncond_opt), uncond_opt

        (lat_cur, uncond), uncond_list = jax.lax.scan(
            outer_body, (lat_cur, uncond), (i_vals, pivots_rev))
        return lat_cur, uncond, uncond_list


def rescale_noise_cfg(noise_cfg: jnp.ndarray, noise_pred_text: jnp.ndarray,
                      guidance_rescale: float = 0.0) -> jnp.ndarray:
    """Guidance rescale (reference: rescale_noise_cfg, pipeline.py:240-252;
    arXiv:2305.08891 §3.4)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg
