"""EmoNet: alternate valence-only ResNet-50 regressor.

Reference: `/root/reference/src/baselines/models/EmoNet.py` — ImageNet-style
normalization (0.485/0.456/0.406, 0.229/0.224/0.225), classic 10-crop at 224
from a 256-resize (4 corners + center, each mirrored), output padded with a
fake arousal column (EmoNet.py:92-96). Checkpoint key remap
(`last_linear` -> `fc`) handled in the converter.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rgie_tpu.models.resnet import resnet50
from rgie_tpu.ops import geometry as G

# numpy, not jnp: module-level device arrays would initialize the XLA
# backend at import, breaking jax.distributed.initialize in multi-host CLIs.
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def classic_ten_crop(images: jnp.ndarray, crop: int = 224) -> jnp.ndarray:
    """Classic TenCrop: 4 corners + center, each plus horizontal mirror
    (EmoNet.py:110-130; the reference's crop order is corners 0-3, center 4,
    mirrors 5-9). (B, 256, 256, C) -> (B*10, crop, crop, C)."""
    b = images.shape[0]
    size = images.shape[1]
    m = size - crop
    center = m // 2 + 1  # reference uses floor(m/2) + 1 (EmoNet.py:124)
    offsets = [(0, 0), (0, m), (m, 0), (m, m), (center, center)]
    crops = [images[:, y:y + crop, x:x + crop, :] for (y, x) in offsets]
    mirrored = [c[:, :, ::-1, :] for c in crops]
    all_crops = jnp.stack(crops + mirrored, axis=1)  # (B, 10, ...)
    return all_crops.reshape(b * 10, crop, crop, images.shape[-1])


@dataclasses.dataclass(frozen=True)
class EmoNet:
    """Valence regressor pipeline: optional [-1,1]->[0,1] denorm, resize 256,
    ten-crop 224, ImageNet normalize, ResNet-50(1 output), mean over crops,
    fake arousal column appended."""

    variables: Any
    normalize_input: bool = False  # True when inputs are [0,1] (applies 0.5-norm first)
    num_classes: int = 2           # (valence, fake arousal) output columns

    def __call__(self, images: jnp.ndarray, key=None) -> jnp.ndarray:
        x = images
        if self.normalize_input:
            x = (x - 0.5) / 0.5           # EmoNet.py:80-81: inserted 0.5-normalize
        x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)   # denorm (EmoNet.py:88-90, /255 folded)
        x = G.resize(x, (256, 256), antialias=True)
        x = classic_ten_crop(x, 224)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        model = resnet50(1)
        out = model.apply(self.variables, x, train=False)  # (B*10, 1)
        out = out.reshape(-1, 10).mean(axis=1)
        return jnp.stack([out, jnp.zeros_like(out)], axis=1)  # fake arousal


def create_emonet(key: jax.Array, normalize_input: bool = False) -> EmoNet:
    model = resnet50(1)
    variables = model.init(key, jnp.zeros((1, 224, 224, 3)))
    return EmoNet(variables=variables, normalize_input=normalize_input)


def convert_emonet_checkpoint(state_dict) -> Any:
    """EmoNet tar checkpoint -> flax variables (key remap per EmoNet.py:47-53)."""
    from rgie_tpu.utils.torch_convert import convert_resnet50

    sd = {".".join(k.split(".")[1:]): v for k, v in state_dict.items()}
    sd = {(k[len("model."):] if k.startswith("model.") else k): v for k, v in sd.items()}
    if "last_linear.weight" in sd:
        sd["fc.weight"] = sd.pop("last_linear.weight")
        sd["fc.bias"] = sd.pop("last_linear.bias")
    return convert_resnet50(sd)
