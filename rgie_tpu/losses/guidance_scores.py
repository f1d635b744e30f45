"""Guidance score functions on latent-space regressor outputs.

Reference: `/root/reference/src/guidance_classifier/guidance_scores.py`.
Targets: explicit ``reference_value``, else the untargeted defaults —
minimize -> (valence 0.5, arousal 0.0); maximize -> (1.0, 1.0).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def valence_arousal_score(predicted_va: jnp.ndarray, is_minimized: bool = True,
                          reference_value: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sum of squared errors to the VA target (guidance_scores.py:4-22)."""
    if reference_value is not None:
        target = jnp.broadcast_to(jnp.asarray(reference_value, predicted_va.dtype),
                                  predicted_va.shape)
    else:
        t = (0.5, 0.0) if is_minimized else (1.0, 1.0)
        target = jnp.broadcast_to(jnp.asarray(t, predicted_va.dtype), predicted_va.shape)
    err = target - predicted_va
    return jnp.sum(err * err)


def valence_score(predicted: jnp.ndarray, is_minimized: bool = True,
                  reference_value: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Squared error on the valence column (guidance_scores.py:49-73)."""
    pred = predicted[:, 0] if predicted.ndim > 1 and predicted.shape[1] > 1 else predicted.reshape(-1)
    if reference_value is not None:
        target = jnp.asarray(reference_value, pred.dtype)
    else:
        target = jnp.asarray(0.5 if is_minimized else 1.0, pred.dtype)
    err = (target - pred).squeeze()
    return err * err


def arousal_score(predicted: jnp.ndarray, is_minimized: bool = True,
                  reference_value: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Squared error on the arousal column (guidance_scores.py:25-46)."""
    pred = predicted[:, 1] if predicted.ndim > 1 and predicted.shape[1] > 1 else predicted.reshape(-1)
    if reference_value is not None:
        target = jnp.asarray(reference_value, pred.dtype)
    else:
        target = jnp.asarray(0.0 if is_minimized else 1.0, pred.dtype)
    err = (target - pred).squeeze()
    return err * err
