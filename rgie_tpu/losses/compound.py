"""Compound emotion vector (polarity, theta, intensity) from an 8-emotion
distribution.

Reference: `/root/reference/src/baselines/losses/CompoundEmotionVector.py`
("A Circular-Structured Representation for Visual Emotion Distribution
Learning"). Column order: Amusement Awe Contentment Excitement Anger Disgust
Fear Sadness.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# Angles of the 8 basic emotions (CompoundEmotionVector.py:6).
# numpy, not jnp: module-level device arrays would initialize the XLA
# backend at import, breaking jax.distributed.initialize in multi-host CLIs.
EMOTION_ANGLES = np.asarray([11.0, 7.0, 9.0, 5.0, 13.0, 15.0, 3.0, 1.0]) * 0.125 * math.pi


class CompoundEmotion(NamedTuple):
    polarity: jnp.ndarray
    theta: jnp.ndarray
    intensity: jnp.ndarray


def compute_compound_emotion_vector(emotions: jnp.ndarray,
                                    emo_type: Optional[jnp.ndarray] = None) -> CompoundEmotion:
    """(B, 8) distribution -> (polarity, theta, intensity)
    (CompoundEmotionVector.py:65-85)."""
    angles = EMOTION_ANGLES if emo_type is None else emo_type
    ex = jnp.sum(emotions * jnp.cos(angles), axis=1)
    ey = jnp.sum(emotions * jnp.sin(angles), axis=1)
    intensity = jnp.sqrt(ex * ex + ey * ey)
    theta_atan2 = jnp.arctan2(ey, ex)
    theta = jnp.remainder(theta_atan2, 2 * math.pi)
    polarity = (jnp.abs(theta_atan2) > math.pi / 2.0).astype(emotions.dtype)
    return CompoundEmotion(polarity=polarity, theta=theta, intensity=intensity)


def from_vector_or_distribution(emotions: jnp.ndarray,
                                emo_type: Optional[jnp.ndarray] = None) -> CompoundEmotion:
    """(B, 3) explicit (polarity, theta, intensity) or (B, 8) distribution
    (CompoundEmotionVector.py:50-63)."""
    if emotions.shape[1] == 3:
        return CompoundEmotion(emotions[:, 0], emotions[:, 1], emotions[:, 2])
    return compute_compound_emotion_vector(emotions, emo_type)
