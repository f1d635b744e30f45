"""Midu guidance classifiers: small CNNs reading UNet mid-block activations.

Reference: `/root/reference/src/guidance_classifier/MiduClassifier.py:122-161`
defines two torch Sequentials (SD and SDXL variants) scoring the 1280-channel
mid-block feature map. The reference taps that feature with a forward *hook*
(MiduClassifier.py:29,117-119) — JAX has no hooks, so our UNet returns the
mid-block activations as an explicit auxiliary output (designed in from day
one; see rgie_tpu.diffusion.unet) and the midu consumes them directly.

Channels-last; convs can shard over the 'model' mesh axis at scale.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rgie_tpu.losses.guidance_scores import valence_arousal_score


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


class MiduSDXL(nn.Module):
    """SDXL variant (MiduClassifier.py:124-143): 4x(conv3x3 + relu + maxpool)
    1280->512->256->128->64, flatten 64*2*2, linear 256->128->out.
    Expects (B, 32, 32, 1280) mid-block features."""

    num_outputs: int = 2

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((512, 256, 128, 64)):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = max_pool_2x2(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="dense_0")(x))
        return nn.Dense(self.num_outputs, name="dense_1")(x)


class MiduSD(nn.Module):
    """SD variant (MiduClassifier.py:144-160): conv 1280->256 + pool, conv
    256->128, adaptive-avg-pool to 2x2, linear 512->64->out. Expects
    (B, 8, 8, 1280) or (B, 16, 16, 1280) features."""

    num_outputs: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv_0")(x))
        x = max_pool_2x2(x)
        x = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="conv_1")(x))
        # AdaptiveAvgPool2d((2, 2)): mean over equal quadrants.
        b, h, w, c = x.shape
        x = x.reshape(b, 2, h // 2, 2, w // 2, c).mean(axis=(2, 4))
        x = x.reshape(b, -1)
        x = nn.relu(nn.Dense(64, name="dense_0")(x))
        return nn.Dense(self.num_outputs, name="dense_1")(x)


def create_midu(key, is_sdxl: bool = False, num_outputs: int = 2,
                feature_hw: Optional[int] = None):
    """Init a midu model. feature_hw defaults to 32 (SDXL @1024px) or 8
    (SD @512px with a 64x64 latent -> 8x8 mid block)."""
    model = MiduSDXL(num_outputs) if is_sdxl else MiduSD(num_outputs)
    hw = feature_hw if feature_hw is not None else (32 if is_sdxl else 8)
    variables = model.init(key, jnp.zeros((1, hw, hw, 1280)))
    return model, variables


@dataclasses.dataclass(frozen=True)
class ValenceArousalMidu:
    """VA scoring head over midu outputs (reference:
    `src/guidance_classifier/ValenceArousalMidu.py` — num_outputs=2; the loss
    is the squared error to the VA target, guidance_scores.py:4-22).

    ``features`` are the UNet mid-block activations in fp32 (the reference
    always upcasts, MiduClassifier.py:49)."""

    model: Any
    variables: Any
    is_minimized: bool = True
    reference_value: Optional[jnp.ndarray] = None

    def predict(self, features: jnp.ndarray) -> jnp.ndarray:
        return self.model.apply(self.variables, features.astype(jnp.float32))

    def score(self, features: jnp.ndarray) -> jnp.ndarray:
        """Guidance loss used inside classifier guidance (MiduClassifier.forward)."""
        predicted = self.predict(features)
        return valence_arousal_score(predicted, self.is_minimized, self.reference_value)

    def loss_and_outputs(self, features: jnp.ndarray, labels: jnp.ndarray):
        """Training objective (MiduClassifier.get_loss:52-64): MSE vs labels."""
        outputs = self.predict(features)
        return jnp.mean((outputs - labels) ** 2), outputs
