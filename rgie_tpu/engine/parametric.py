"""End-to-end parametric pixel-space editing (the flagship CPU-comparable
workload; reference entry point `/root/reference/src/optimize_image_param.py`).

One edited image = ONE XLA program: filter chain -> frozen VA regressor
(fwd+bwd) -> frozen CLIP (fwd+bwd) -> Adam update, scanned over N steps.
A batch of images is `vmap` over that program; chips come in by sharding the
batch axis (rgie_tpu.parallel.shard_batch).

Model weights are threaded through as jit ARGUMENTS (an ``EditModels``
pytree), never closed over: closures would embed ~450MB of ResNet+CLIP
constants into the HLO, which both bloats compile time and overflows remote
compile transports.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rgie_tpu.config import OptimizeConfig, ParamEditConfig
from rgie_tpu.engine.optimize import OptResult, optimize
from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
from rgie_tpu.models.clip import ClipImageEncoder, clip_loss
from rgie_tpu.ops import chain as CH


class EditModels(NamedTuple):
    """Weight pytree passed as a jit argument to every edit program."""

    regressor: Any                 # flax variables of the VA ResNet-50
    clip: Optional[Any] = None     # flax variables of the CLIP image tower
    dis: Optional[Any] = None      # flax variables of the pixel discriminator


class EditContext(NamedTuple):
    """Per-image constants of the objective (all traced as scan-invariant)."""

    image: jnp.ndarray          # (1, H, W, 3) in [0, 1]
    target: jnp.ndarray         # (1, D) VA target from alpha
    clip_features: jnp.ndarray  # (1, 512) precomputed normalized original features


def models_of(va_loss: ValenceArousalLoss,
              clip_encoder: Optional[ClipImageEncoder],
              dis_variables: Optional[Any] = None) -> EditModels:
    return EditModels(regressor=va_loss.regressor.variables,
                      clip=clip_encoder.variables if clip_encoder is not None else None,
                      dis=dis_variables)


def discriminator_realism_loss(dis_model: Any, dis_variables: Any,
                               edited: jnp.ndarray) -> jnp.ndarray:
    """BCE(dis(edited), real) — the NetWithCriterion term (reference:
    optimize_image_param.py:315-330, label=1.0, nn.BCELoss on the sigmoid
    multi-scale prediction).

    Divergence from the reference (documented per SURVEY §2.4 policy): the
    reference computes ``loss -= weight_dis * dis(image)`` on the UNEDITED
    input (objective_function_parametric:245-247) — a constant w.r.t. the
    optimized vector (zero gradient) with an inverted sign. The evident intent
    of NetWithCriterion(label=1.0) is a realism regularizer on the edit, so we
    score the EDITED image and ADD the BCE-to-real term.
    """
    p = dis_model.apply(dis_variables, edited)
    # torch nn.BCELoss clamps log terms at -100 (p in (0,1) from the sigmoid).
    return -jnp.mean(jnp.maximum(jnp.log(p), -100.0))


def _bind(va_loss: ValenceArousalLoss, clip_encoder: Optional[ClipImageEncoder],
          models: EditModels):
    """Rebind the (possibly traced) weight pytree onto the static model configs."""
    va = dataclasses.replace(
        va_loss, regressor=dataclasses.replace(va_loss.regressor,
                                               variables=models.regressor))
    enc = None
    if clip_encoder is not None and models.clip is not None:
        enc = dataclasses.replace(clip_encoder, variables=models.clip)
    return va, enc


def make_objective(va_loss: ValenceArousalLoss, clip_encoder: Optional[ClipImageEncoder],
                   cfg: ParamEditConfig, dis_model: Optional[Any] = None):
    """objective(x, ctx, models) -> scalar loss
    (reference: objective_function_parametric, optimize_image_param.py:237-259;
    the weight_dis > 0 realism term via NetWithCriterion, :315-330 — see
    discriminator_realism_loss for the documented divergence)."""
    use_dis = dis_model is not None and cfg.weight_dis > 0

    def objective(x: jnp.ndarray, ctx: EditContext, models: EditModels) -> jnp.ndarray:
        va, enc = _bind(va_loss, clip_encoder, models)
        out = CH.edit_image(ctx.image, x, input_size=cfg.crop_size, order=cfg.transforms)
        loss = cfg.weight_clf * va(out, target=ctx.target)
        if use_dis:
            loss = loss + cfg.weight_dis * discriminator_realism_loss(
                dis_model, models.dis, out)
        if enc is not None and cfg.weight_recon > 0:
            loss = loss + cfg.weight_recon * clip_loss(enc, ctx.clip_features, out)
        return loss

    if cfg.remat:
        # Recompute the frozen-model forwards during the backward pass instead
        # of saving ten-crop ResNet/CLIP activations across the scan step.
        objective = jax.checkpoint(objective)
    return objective


def make_single_edit(va_loss: ValenceArousalLoss, clip_encoder: Optional[ClipImageEncoder],
                     cfg: ParamEditConfig, dis_model: Optional[Any] = None):
    """Returns edit(models, image, alpha) -> (OptResult, edited_image). Jittable;
    ``models`` is the EditModels weight pytree."""
    objective = make_objective(va_loss, clip_encoder, cfg, dis_model)

    def edit(models: EditModels, image: jnp.ndarray,
             alpha: jnp.ndarray) -> Tuple[OptResult, jnp.ndarray]:
        va, enc = _bind(va_loss, clip_encoder, models)
        # Relative target (optimize_image.py:119-123), no-grad.
        va0 = jax.lax.stop_gradient(va.predict_loss_metric(image))
        target = jnp.clip(va0 + alpha, 0.0, 1.0)
        if enc is not None and cfg.weight_recon > 0:
            feats = jax.lax.stop_gradient(enc.embed_normalized(image))
        else:
            feats = jnp.zeros((image.shape[0], 1), image.dtype)
        ctx = EditContext(image=image, target=target, clip_features=feats)
        x0 = CH.pack_params(CH.init_params(image.dtype))
        result = optimize(lambda x: objective(x, ctx, models), x0, cfg.optimize)
        edited = CH.edit_image(image, result.best_x, input_size=cfg.crop_size,
                               order=cfg.transforms)
        return result, edited

    return edit


def make_batched_edit(va_loss: ValenceArousalLoss, clip_encoder: Optional[ClipImageEncoder],
                      cfg: ParamEditConfig, dis_model: Optional[Any] = None):
    """vmap the single edit over a leading batch axis: (B, H, W, 3), (B, D);
    weights are broadcast (in_axes=None).

    Each image is edited independently (the reference loops bs=1 on one GPU —
    adapt_images.py:68); here all B edits run in lockstep on-device and the
    batch axis shards across the mesh."""
    edit = make_single_edit(va_loss, clip_encoder, cfg, dis_model)

    def edit_one(models, image, alpha):
        result, edited = edit(models, image[None], alpha)
        return result, edited[0]

    return jax.vmap(edit_one, in_axes=(None, 0, 0))


def make_evaluate(va_loss: ValenceArousalLoss):
    """compare_emotions analog (reference: run_img_trans.py:361-386): VA
    before/after, delta, L1 reconstruction error. Returns a jittable
    fn(models, image, edited) -> dict."""

    def evaluate(models: EditModels, image: jnp.ndarray, edited: jnp.ndarray) -> dict:
        va, _ = _bind(va_loss, None, models)
        va_orig = va.predict_loss_metric(image)
        va_adapted = va.predict_loss_metric(edited)
        return {
            "va_original": va_orig,
            "va_adapted": va_adapted,
            "va_delta": va_adapted - va_orig,
            "rec_error": jnp.mean(jnp.abs(edited - image)),
        }

    return evaluate


def evaluate_edit(va_loss: ValenceArousalLoss, image: jnp.ndarray,
                  edited: jnp.ndarray) -> dict:
    """Convenience eager evaluation using the loss's own bound weights."""
    return make_evaluate(va_loss)(models_of(va_loss, None), image, edited)
