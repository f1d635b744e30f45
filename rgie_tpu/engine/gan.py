"""End-to-end MUNIT style-space editing.

Reference entry point `/root/reference/src/optimize_image_imaginaire.py`:
optimize the 8-dim style code of a frozen MUNIT autoencoder with Adam so the
decoded image hits a VA target while an L1 content-reconstruction term (via a
second encoder pass) preserves content. Here decode -> VA-regressor fwd+bwd ->
re-encode all fuse into the scanned step. Images are NHWC in [-1, 1]
(normalized like the reference's data_transforms, optimize_image_imaginaire.py:62-67).

As in rgie_tpu.engine.parametric, weights travel as jit arguments
(``GanEditModels``), never as closure constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rgie_tpu.config import GanEditConfig
from rgie_tpu.engine.optimize import OptResult, optimize
from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
from rgie_tpu.models.munit import MunitGenerator


class GanEditModels(NamedTuple):
    generator: Any   # flax variables of autoencoder_a
    regressor: Any   # flax variables of the VA ResNet-50
    dis: Optional[Any] = None  # flax variables of the MUNIT discriminator_a


class GanEditContext(NamedTuple):
    content: jnp.ndarray    # frozen content code (1, h, w, C)
    target: jnp.ndarray     # (1, D) VA target


def models_of(gen: MunitGenerator, va_loss: ValenceArousalLoss,
              dis_variables: Optional[Any] = None) -> GanEditModels:
    return GanEditModels(generator=gen.variables_a,
                         regressor=va_loss.regressor.variables,
                         dis=dis_variables)


def _bind(gen: MunitGenerator, va_loss: ValenceArousalLoss, models: GanEditModels):
    g = dataclasses.replace(gen, variables_a=models.generator)
    va = dataclasses.replace(
        va_loss, regressor=dataclasses.replace(va_loss.regressor,
                                               variables=models.regressor))
    return g, va


def make_objective(gen: MunitGenerator, va_loss: ValenceArousalLoss, cfg: GanEditConfig,
                   dis_model: Optional[Any] = None):
    """objective(style, ctx, models) (reference: objective_function_imaginaire,
    optimize_image_imaginaire.py:120-145): clf loss on the clamped decode plus
    L1 content reconstruction, plus — when ``weight_dis > 0`` and a
    discriminator is supplied — the reference's exact hinge term
    ``relu(-gan_loss(dis(img), real, gen-update))`` (:132-137). With the hinge
    generator loss being -mean(logits), the term resolves to
    relu(mean(logits)); we reproduce the formula as written (the reference's
    comment describes the opposite sign, but weight_dis defaults to 0 in the
    shipped config either way)."""
    use_dis = dis_model is not None and cfg.weight_dis > 0

    def objective(style: jnp.ndarray, ctx: GanEditContext,
                  models: GanEditModels) -> jnp.ndarray:
        g, va = _bind(gen, va_loss, models)
        img = g.decode_a(ctx.content, style[None])
        img = jnp.clip(img, -1.0, 1.0)
        loss = cfg.weight_clf * va(img, target=ctx.target)
        if use_dis:
            from rgie_tpu.losses.gan import gan_loss

            outs, _, _ = dis_model.apply(models.dis, img)
            dis_loss = gan_loss(outs, True, gan_mode="hinge", dis_update=False)
            loss = loss + cfg.weight_dis * jax.nn.relu(-dis_loss)
        if cfg.weight_recon > 0:
            content_new, _ = g.encode_a(img)
            loss = loss + cfg.weight_recon * jnp.mean(jnp.abs(content_new - ctx.content))
        return loss

    if cfg.remat:
        # Recompute decoder/regressor/encoder activations on backward instead
        # of saving them across the scanned Adam step (1024px headroom).
        objective = jax.checkpoint(objective)
    return objective


def make_single_edit(gen: MunitGenerator, va_loss: ValenceArousalLoss, cfg: GanEditConfig,
                     dis_model: Optional[Any] = None):
    """edit(models, image, alpha) -> (OptResult, edited). image (1,H,W,3) in [-1,1]."""
    objective = make_objective(gen, va_loss, cfg, dis_model)

    def edit(models: GanEditModels, image: jnp.ndarray,
             alpha: jnp.ndarray) -> Tuple[OptResult, jnp.ndarray]:
        g, va = _bind(gen, va_loss, models)
        content, style0 = g.encode_a(image)             # no-grad init (py:112-117)
        content = jax.lax.stop_gradient(content)
        style0 = jax.lax.stop_gradient(style0)
        va0 = jax.lax.stop_gradient(va.predict_loss_metric(image))
        target = jnp.clip(va0 + alpha, 0.0, 1.0)
        ctx = GanEditContext(content=content, target=target)
        result = optimize(lambda s: objective(s, ctx, models), style0[0], cfg.optimize)
        edited = jnp.clip(g.decode_a(content, result.best_x[None]), -1.0, 1.0)
        return result, edited

    return edit


def make_batched_edit(gen: MunitGenerator, va_loss: ValenceArousalLoss, cfg: GanEditConfig,
                      dis_model: Optional[Any] = None):
    edit = make_single_edit(gen, va_loss, cfg, dis_model)

    def edit_one(models, image, alpha):
        result, edited = edit(models, image[None], alpha)
        return result, edited[0]

    return jax.vmap(edit_one, in_axes=(None, 0, 0))


def to_unit_range(image: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1] for saving (reference: transform, optimize_image_imaginaire.py:178-179)."""
    return (image + 1.0) * 0.5
