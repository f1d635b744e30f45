"""Offline VA prediction over saved images.

Reference: `/root/reference/src/analysis/predict_valence_arousal.py` and
`classifier_score_of_images.py` (lazy-global pixel regressor, transform
Resize(480)+CenterCrop(448)+0.5-normalize). Here the regressor is our Flax
pipeline; batched + jitted scoring.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

_SCORE_FN = None
_LOSS = None


def _build(model_id: str, model_path: Optional[str], key_seed: int = 0):
    import jax
    import jax.numpy as jnp

    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.emotion import EmotionRegressor, create_regressor

    if model_path is not None:
        from rgie_tpu.utils.torch_convert import convert_resnet50, load_torch_state_dict

        variables = jax.tree.map(jnp.asarray,
                                 convert_resnet50(load_torch_state_dict(model_path)))
        regressor = EmotionRegressor(variables=variables, normalize=False)
    else:
        regressor = create_regressor(jax.random.PRNGKey(key_seed), normalize=False)

    loss_type = "valence" if model_id == "emonet" else "va"
    return ValenceArousalLoss(regressor=regressor, loss_type=loss_type)


def get_classifier_score_of_images(image_paths: Sequence[str], model_id: str = "va",
                                   model_path: Optional[str] = None) -> np.ndarray:
    """Paths -> (N, 2) VA predictions (classifier_score_of_images.py:13-35).
    Images get the regressor transform (480/448, [-1,1]) on host; the ten-crop
    + ResNet run jitted."""
    global _SCORE_FN, _LOSS
    import jax
    import jax.numpy as jnp

    from rgie_tpu.data.dataset import load_image_rgb, preprocess_image

    if _LOSS is None:
        _LOSS = _build(model_id, model_path)
        _SCORE_FN = jax.jit(lambda imgs: _LOSS.predict_loss_metric(imgs))

    batch = np.concatenate([
        preprocess_image(load_image_rgb(p), 480, 448, normalize=True)
        for p in image_paths])
    return np.asarray(_SCORE_FN(jnp.asarray(batch)))


def predict_valence_arousal(image_path: str, model_path: Optional[str] = None) -> np.ndarray:
    """Single-image VA (predict_valence_arousal.py:12-27)."""
    return get_classifier_score_of_images([image_path], "va", model_path)[0]
