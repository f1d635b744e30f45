"""Diffusion dataset-editing orchestration.

Reference package `/root/reference/src/adapt_images/` (adapter.py, scoring.py,
output.py) + the `revert_and_sample` driver
(`src/pipelines/InversionResamplingDiffusionPipeline.py:74-122`):
score the original, compute the relative VA reference value, DDIM-invert,
optionally run NTO (recomputed only when the CFG scale changes), sample per
guidance setting, save + rescore each output.

Fixes vs the reference (documented, SURVEY §2.4): the shared GuidanceConfig's
reference_value is NOT mutated in place (the reference compounds the alpha
offset from image 2 onward — adapter.py:33-36); pivot latents are per-call
scan outputs, not an ever-growing list.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgie_tpu.config import AdaptConfig, GuidanceConfig
from rgie_tpu.diffusion.pipeline import (InversionResamplingPipeline,
                                         PipelineParams, SdxlCond)
from rgie_tpu.models.midu import ValenceArousalMidu
from rgie_tpu.ops import geometry as G
from rgie_tpu.utils.stats import print_score


@dataclasses.dataclass
class ImageScorer:
    """VA scoring through the latent-space midu classifier
    (reference: src/adapt_images/scoring.py:7-24)."""

    pipe: InversionResamplingPipeline
    params: PipelineParams
    embeds_fn: Callable[[str, str], jnp.ndarray]  # (prompt, negative) -> (1, L, D)
    added_cond_fn: Optional[Callable[[str, str], "SdxlCond"]] = None  # SDXL

    def __post_init__(self):
        empty = self.embeds_fn("", "")
        added = None
        if self.pipe.is_xl and self.added_cond_fn is not None:
            both = self.added_cond_fn("", "")
            added = type(both)(text_embeds=both.text_embeds[1:2],
                               time_ids=both.time_ids[1:2])

        def _score(params, image):
            latents = self.pipe.encode_image(params, image)
            t = self.pipe.sched.timesteps[-1]
            _, mid = self.pipe._unet(params.unet, latents, t, empty, added)
            clf = ValenceArousalMidu(model=self.pipe.midu_model, variables=params.midu)
            return clf.predict(mid)

        self._score_jit = jax.jit(_score)

    def score(self, image: jnp.ndarray) -> np.ndarray:
        """(1, H, W, 3) in [0,1] (already transform_image'd) -> (1, 2) VA."""
        return np.asarray(self._score_jit(self.params, image))

    def rec_error(self, orig: jnp.ndarray, adapted: jnp.ndarray) -> float:
        return float(jnp.mean(jnp.abs(adapted - orig)))

    print_score = staticmethod(print_score)


@dataclasses.dataclass
class OutputImageManager:
    """Saves each adapted image and rescores it
    (reference: src/adapt_images/output.py)."""

    scorer: ImageScorer
    output_path: str = "."
    image_name: Optional[str] = None
    orig_image_score: Optional[np.ndarray] = None
    orig_image: Optional[jnp.ndarray] = None

    def set_image_name(self, name: str):
        self.image_name = name

    def set_orig_image_score(self, score: np.ndarray):
        self.orig_image_score = score

    def set_orig_image(self, img: jnp.ndarray):
        self.orig_image = img

    def callback(self, adapted_image: jnp.ndarray, label: str = None):
        from PIL import Image

        out_dir = os.path.join(self.output_path, str(label))
        os.makedirs(out_dir, exist_ok=True)
        arr = np.clip(np.asarray(adapted_image[0]) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(out_dir, f"{self.image_name}.jpg"))

        score = self.scorer.score(adapted_image)
        self.scorer.print_score(score, "adapted", self.orig_image_score)
        rec = self.scorer.rec_error(self.orig_image, adapted_image)
        print("Reconstruction error: {:.4f}".format(rec))


def transform_image(image_hwc: np.ndarray, input_size: int) -> jnp.ndarray:
    """Resize(shorter)+CenterCrop+ToTensor (pipeline transform,
    InversionResamplingDiffusionPipeline.py:23-27), NHWC [0,1]."""
    from rgie_tpu.data.dataset import preprocess_image

    return jnp.asarray(preprocess_image(image_hwc, input_size, input_size))


@dataclasses.dataclass
class ImageAdapter:
    """Per-image adapt loop (reference: src/adapt_images/adapter.py:13-51 +
    revert_and_sample, InversionResamplingDiffusionPipeline.py:74-122)."""

    pipe: InversionResamplingPipeline
    params: PipelineParams
    scorer: ImageScorer
    embeds_fn: Callable[[str, str], jnp.ndarray]       # single-prompt embeds
    cfg_embeds_fn: Callable[[str, str], jnp.ndarray]   # (2, L, D) [uncond; cond]
    # SDXL only: (prompt, negative) -> SdxlCond with rows [uncond; cond]
    # (text_embeds + micro-conditioning time_ids, diff_utils.py:274-367).
    added_cond_fn: Optional[Callable[[str, str], "SdxlCond"]] = None
    input_size: int = 512

    def __post_init__(self):
        self._reverse_jit = jax.jit(self.pipe.reverse_sample,
                                    static_argnames=("end_iteration",))
        self._sample_jit = jax.jit(
            self.pipe.sample,
            static_argnames=("guidance_scale", "guidance_clf_scale",
                             "guidance_rescale", "start_iteration",
                             "midu_is_minimized"))
        self._nto_jit = jax.jit(self.pipe.null_optimization,
                                static_argnames=("guidance_scale", "num_inner_steps",
                                                 "epsilon"))

    def adapt(self, image_path: str, config: GuidanceConfig,
              output_manager: OutputImageManager, end_iteration: Optional[int],
              caption: str = "") -> Dict[str, jnp.ndarray]:
        from rgie_tpu.data.dataset import load_image_rgb

        image_name = os.path.basename(image_path).replace(".jpg", "")
        raw = load_image_rgb(image_path)
        image = transform_image(raw, self.input_size)

        orig_score = self.scorer.score(image)
        self.scorer.print_score(orig_score, "original")

        # Relative reference value — computed per image WITHOUT mutating the
        # shared config (reference bug: adapter.py:33-36 compounds it).
        reference_value = None
        if config.reference_value is not None:
            reference_value = jnp.clip(
                jnp.asarray(orig_score) + config.reference_value, 0.0, 1.0)

        output_manager.set_image_name(image_name)
        output_manager.set_orig_image_score(orig_score)
        output_manager.set_orig_image(image)

        outputs = self.revert_and_sample(
            image, caption, end_iteration,
            {config.resolved_label(): dataclasses.replace(config)},
            reference_value=reference_value,
            callback_outputs=output_manager.callback)
        return outputs

    def revert_and_sample(self, image: jnp.ndarray, caption: str,
                          end_iteration: Optional[int],
                          configs: Dict[str, GuidanceConfig],
                          reference_value=None,
                          callback_outputs=None) -> Dict[str, jnp.ndarray]:
        pipe = self.pipe
        s = pipe.sched.num_inference_steps
        end_it = end_iteration if end_iteration is not None else s
        start_iteration = 0 if s != pipe.sched.num_inference_steps else s - end_it

        # Null-text inversion uses empty prompts (pipeline.py:83-84).
        empty = self.embeds_fn("", "")
        added_empty = None
        if pipe.is_xl and self.added_cond_fn is not None:
            both = self.added_cond_fn("", "")
            added_empty = type(both)(text_embeds=both.text_embeds[1:2],
                                     time_ids=both.time_ids[1:2])
        latents = pipe.encode_image(self.params, image)
        noisy, pivots = self._reverse_jit(self.params, latents, empty,
                                          added=added_empty,
                                          end_iteration=end_it)

        outputs: Dict[str, jnp.ndarray] = {}
        nto_embeds = None
        nto_scale = -1.0
        for key, cfg in configs.items():
            prompt = cfg.prompt if not cfg.use_caption else (caption + " " + cfg.prompt)
            if cfg.is_nto and nto_scale != cfg.cfg_scale:
                nto_scale = cfg.cfg_scale
                cond = self.embeds_fn(caption, "")
                uncond = self.embeds_fn("", "")
                nto_added_c, nto_added_u = None, None
                if pipe.is_xl and self.added_cond_fn is not None:
                    both = self.added_cond_fn(caption, "")
                    nto_added_u = type(both)(text_embeds=both.text_embeds[0:1],
                                             time_ids=both.time_ids[0:1])
                    nto_added_c = type(both)(text_embeds=both.text_embeds[1:2],
                                             time_ids=both.time_ids[1:2])
                nto_embeds = self._nto_jit(self.params, pivots, cond, uncond,
                                           added_cond=nto_added_c,
                                           added_uncond=nto_added_u,
                                           guidance_scale=cfg.cfg_scale)
            elif not cfg.is_nto:
                nto_embeds = None
                nto_scale = -1.0

            embeds = self.cfg_embeds_fn(prompt, cfg.negative_prompt)
            added = None
            if pipe.is_xl and self.added_cond_fn is not None:
                added = self.added_cond_fn(prompt, cfg.negative_prompt)
            out_lat = self._sample_jit(
                self.params, noisy, embeds,
                added=added,
                guidance_scale=cfg.cfg_scale,
                guidance_clf_scale=cfg.clf_scale,
                uncond_embeds_per_step=nto_embeds,
                start_iteration=start_iteration,
                midu_is_minimized=not cfg.max,
                midu_reference_value=reference_value)
            img = pipe.decode_latents(self.params, out_lat)
            outputs[key] = img
            if callback_outputs is not None:
                callback_outputs(img, key)
        return outputs
