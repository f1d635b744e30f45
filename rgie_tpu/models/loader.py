"""Model loading dispatch for the pixel-space VA loss.

Reference: `ValenceArousalLoss.__init__`
(`/root/reference/src/baselines/losses/ValenceArousalLoss.py:29-57`): the
checkpoint PATH drives the architecture — "EmoNet" -> the valence-only EmoNet
loader; otherwise ResNet-50 with num_classes=4 + Sigmoid, modified by
"no_sigmoid" (drop sigmoid), "mse" (2 outputs, no sigmoid), "arousal_nll"
(2 outputs). Missing checkpoints fall back to random-weight stand-ins so the
pipelines run in zero-egress environments.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from rgie_tpu.losses.emotion_loss import ValenceArousalLoss


def load_va_loss(path_to_model: Optional[str], key: jax.Array, weight: float = 1.0,
                 loss_type: str = "va", is_minimized: bool = True,
                 is_input_range_0_1: bool = True, input_size: int = 480,
                 crop_size: int = 448) -> ValenceArousalLoss:
    """Build the VA loss with the reference's path-name dispatch."""
    path = str(path_to_model) if path_to_model else ""
    exists = bool(path) and os.path.exists(path)

    if "EmoNet" in path:
        from rgie_tpu.models.emonet import EmoNet, convert_emonet_checkpoint, create_emonet

        if exists:
            from rgie_tpu.utils.torch_convert import load_torch_state_dict

            variables = jax.tree.map(jnp.asarray, convert_emonet_checkpoint(
                load_torch_state_dict(path)))
            net = EmoNet(variables=variables, normalize_input=is_input_range_0_1)
        else:
            net = create_emonet(key, normalize_input=is_input_range_0_1)

        # EmoNet is itself a frozen dataclass with a `variables` field and the
        # regressor call signature, so the engine's weight rebinding works on
        # it directly; output = (valence, fake arousal) (EmoNet.py:92-96).
        return ValenceArousalLoss(regressor=net, weight=weight,
                                  loss_type="valence", is_minimized=is_minimized)

    num_classes = 4
    use_sigmoid = True
    if "no_sigmoid" in path:
        use_sigmoid = False
    if "mse" in path:
        num_classes = 2
        use_sigmoid = False
    if "arousal_nll" in path:
        num_classes = 2

    from rgie_tpu.models.emotion import EmotionRegressor, create_regressor

    if exists:
        from rgie_tpu.utils.torch_convert import convert_resnet50, load_torch_state_dict

        variables = jax.tree.map(jnp.asarray,
                                 convert_resnet50(load_torch_state_dict(path)))
        regressor = EmotionRegressor(variables=variables, num_classes=num_classes,
                                     normalize=is_input_range_0_1,
                                     input_size=input_size, crop_size=crop_size,
                                     use_sigmoid=use_sigmoid)
    else:
        regressor = create_regressor(key, num_classes=num_classes,
                                     normalize=is_input_range_0_1,
                                     input_size=input_size, crop_size=crop_size,
                                     use_sigmoid=use_sigmoid)
        if path:
            print(f"WARNING: {path} not found; random-weight regressor stand-in")

    return ValenceArousalLoss(regressor=regressor, weight=weight,
                              loss_type=loss_type, is_minimized=is_minimized)
