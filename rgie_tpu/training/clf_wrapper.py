"""Teacher-labeler wrapper: pixel-space VA regressor as the label source for
guidance-regressor training.

Reference: `/root/reference/src/clf/ClfWrapper.py` — wraps ValenceArousalLoss
(or the compound-emotion loss) and exposes ``get_label(images)``; used when
the training dataset has no VA annotations (train_guidance_clf.py:127,237).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from rgie_tpu.losses.emotion_loss import ValenceArousalLoss


@dataclasses.dataclass(frozen=True)
class ClfWrapper:
    """get_label(images) -> (B, D) no-grad teacher labels (ClfWrapper.py:33-41).
    ``images`` NHWC in [0,1] (normalize=True regressor) or [-1,1]."""

    loss: ValenceArousalLoss

    def get_label(self, images: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.stop_gradient(self.loss.predict_loss_metric(images))

    @property
    def num_outputs(self) -> int:
        return len(self.loss.output_ixs)


def create_teacher(key: jax.Array, loss_type: str = "va", normalize: bool = True,
                   model_path: str = None, **regressor_kwargs) -> ClfWrapper:
    """Build a teacher from a torch checkpoint when available, else random."""
    from rgie_tpu.models.emotion import EmotionRegressor, create_regressor

    if model_path is not None:
        import os

        if os.path.exists(model_path):
            from rgie_tpu.utils.torch_convert import (convert_resnet50,
                                                      load_torch_state_dict)

            variables = jax.tree.map(jnp.asarray,
                                     convert_resnet50(load_torch_state_dict(model_path)))
            reg = EmotionRegressor(variables=variables, normalize=normalize,
                                   **regressor_kwargs)
            return ClfWrapper(loss=ValenceArousalLoss(regressor=reg, loss_type=loss_type))
    reg = create_regressor(key, normalize=normalize, **regressor_kwargs)
    return ClfWrapper(loss=ValenceArousalLoss(regressor=reg, loss_type=loss_type))
