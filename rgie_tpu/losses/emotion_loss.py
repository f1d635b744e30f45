"""Valence/arousal losses on the pixel-space regressor.

Reference: `/root/reference/src/baselines/losses/ValenceArousalLoss.py` and
`EmotionImageLoss.py`. Pure-function redesign: the loss closes over the frozen
regressor, targets are explicit arguments (no mutable ``is_minimized`` state),
and everything differentiates/jits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from rgie_tpu.models.emotion import EmotionRegressor

# Column indices into the regressor output: valence mean 0, arousal mean 1,
# valence std 2, arousal std 3 (ValenceArousalLoss.py:51).
OUTPUT_IXS = {"va": (0, 1), "valence": (0,), "arousal": (1,)}

# Untargeted defaults (ValenceArousalLoss.py:87,106 and guidance_scores.py:16-19):
# minimize -> neutral valence 0.5 / low arousal 0.0; maximize -> 1.0 / 1.0.
def default_target(loss_type: str, is_minimized: bool, dtype=jnp.float32) -> jnp.ndarray:
    if loss_type == "valence":
        return jnp.asarray([0.5 if is_minimized else 1.0], dtype)
    if loss_type == "arousal":
        return jnp.asarray([0.0 if is_minimized else 1.0], dtype)
    return jnp.asarray([0.5 if is_minimized else 1.0,
                        0.0 if is_minimized else 1.0], dtype)


@dataclasses.dataclass(frozen=True)
class ValenceArousalLoss:
    """loss(images, target) = mean(weight * (target - predicted)^2) summed over
    the selected VA components (ValenceArousalLoss.py:59-129)."""

    regressor: EmotionRegressor
    weight: float = 1.0
    loss_type: str = "va"           # va | valence | arousal
    is_minimized: bool = True

    @property
    def output_ixs(self) -> Tuple[int, ...]:
        return OUTPUT_IXS[self.loss_type]

    def predict_loss_metric(self, images: jnp.ndarray, key=None) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, len(ixs)) predicted VA (ValenceArousalLoss.py:131-138).
        Wrap in jax.lax.stop_gradient at call sites that need no-grad semantics."""
        out = self.regressor(images, key=key)
        return out[:, jnp.asarray(self.output_ixs)]

    def __call__(self, images: jnp.ndarray, target: Optional[jnp.ndarray] = None,
                 key=None) -> jnp.ndarray:
        predicted = self.predict_loss_metric(images, key=key)  # (B, D)
        if target is None:
            target = default_target(self.loss_type, self.is_minimized, predicted.dtype)
            target = jnp.broadcast_to(target, predicted.shape)
        err = target - predicted
        # For 'va' the per-sample error is val_err + ar_err (sum over D), then
        # mean over the batch (ValenceArousalLoss.py:72,114-129).
        per_sample = jnp.sum(err * err, axis=-1)
        return jnp.mean(self.weight * per_sample)


def condition_from_alpha(loss: ValenceArousalLoss, image: jnp.ndarray, alpha: float,
                         key=None) -> jnp.ndarray:
    """Relative target: clamp(VA(original) + alpha, 0, 1)
    (reference: optimize_image.py:119-123). Computed once per image outside
    the edit scan (no_grad in the reference)."""
    import jax

    condition = jax.lax.stop_gradient(loss.predict_loss_metric(image, key=key))
    return jnp.clip(condition + alpha, 0.0, 1.0)
