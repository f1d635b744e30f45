"""Pixel-space valence/arousal regressor: frozen ResNet-50 + ten-crop wrapper.

Reference: `/root/reference/src/baselines/models/EmotionPredictionModel.py:10-54`
builds nn.Sequential(Resize(480), ReplicateAndCrop(448) x10, resnet50(4),
MeanReplicatedCrops, Sigmoid). Here the same pipeline is a pure function whose
forward AND backward compile into the edit program. The ten crops are a
deterministic grid by default (documented deviation from the reference's
RandomCrop-in-the-loss-path — see rgie_tpu.ops.geometry.ten_crop_offsets);
pass ``key`` for stochastic parity.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from rgie_tpu.models.resnet import resnet50
from rgie_tpu.ops import geometry as G

#: Ten-crop-in-s2d-space toggle (env RGIE_TENCROP_S2D=0 disables). The
#: deterministic crop offsets at the production 480/448 geometry are all
#: EVEN, so space-to-depth runs ONCE per image before the crops and the stem
#: becomes a stride-1 4x4 conv on 12-channel tensors (StemConv.s2d_input) —
#: exact numerics (s2d-space pad zeros == per-crop image pad zeros). This is
#: the fix for both round-2 stem findings: the 3-channel stride-2 stem
#: transpose was the #1 op (7.7%), and the round-2 per-crop S2D attempt
#: (RGIE_STEM_S2D) regressed 1.8x because it transposed each 448px crop.
TENCROP_S2D = os.environ.get("RGIE_TENCROP_S2D", "1") == "1"

#: Ten-crop-in-s2d(4)-space + PHASE-FOLDED stem output (RGIE_TENCROP_S2D4=1).
#: Round-4 device trace: the s2d(2) stem's input gradient was still the #1 op
#: (4.2%, only 12 conv output channels = ~9% MXU lane utilization) and the
#: maxpool fwd+bwd another 4.1%. s2d(4) input (48ch) + folding the output's
#: 2x2 phases into channels (256ch at 112²) lifts both stem convs to dense
#: MXU shapes, and the maxpool becomes exact elementwise phase-maxes
#: (resnet.max_pool_phase_folded). Requires 4-aligned crop offsets (true at
#: 480/448: 0/8/16/24/32). OFF by default until device-measured faster.
TENCROP_S2D4 = os.environ.get("RGIE_TENCROP_S2D4", "0") == "1"


@dataclasses.dataclass(frozen=True)
class EmotionRegressor:
    """Frozen VA regressor pipeline. Images NHWC in [0,1] (normalize=True) or
    [-1,1] (normalize=False, the GAN path — optimize_image_imaginaire.py:57-58)."""

    variables: Any
    num_classes: int = 4
    input_size: int = 480
    crop_size: int = 448
    normalize: bool = True           # map [0,1] -> [-1,1] before the net
    num_replications: int = 10
    use_sigmoid: bool = True         # 'va_pred_all' checkpoints end in Sigmoid
    dtype: Any = jnp.float32

    def __call__(self, images: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, num_classes) mean prediction over crops."""
        x = G.resize_shorter_side(images.astype(self.dtype), self.input_size, antialias=True)
        h, w = x.shape[1], x.shape[2]
        fused4 = (TENCROP_S2D4 and key is None and
                  G.tencrop_offsets_even(h, w, self.crop_size,
                                         self.num_replications, block=4))
        fused = (not fused4 and TENCROP_S2D and key is None and
                 G.tencrop_offsets_even(h, w, self.crop_size,
                                        self.num_replications))
        model = resnet50(self.num_classes, self.dtype, stem_s2d_input=fused,
                         stem_s2d4=fused4)
        if fused4:
            if self.normalize:
                x = (x - 0.5) / 0.5
            x = G.space_to_depth(x, 4)
            x = G.replicate_and_crop_s2d(x, self.crop_size, h, w,
                                         self.num_replications, block=4)
        elif fused:
            if self.normalize:
                x = (x - 0.5) / 0.5
            x = G.space_to_depth(x, 2)
            x = G.replicate_and_crop_s2d(x, self.crop_size, h, w,
                                         self.num_replications)
        else:
            x = G.replicate_and_crop(x, self.crop_size, self.num_replications,
                                     key=key)
            if self.normalize:
                x = (x - 0.5) / 0.5
        out = model.apply(self.variables, x, train=False)
        out = G.mean_replicated(out, self.num_replications)
        if self.use_sigmoid:
            out = jax.nn.sigmoid(out)
        return out


def create_regressor(key: jax.Array, num_classes: int = 4, normalize: bool = True,
                     input_size: int = 480, crop_size: int = 448,
                     use_sigmoid: bool = True, dtype=jnp.float32) -> EmotionRegressor:
    """Random-weight regressor (stand-in for the external `va_pred_all`
    checkpoint, which lives outside the reference repo — SURVEY.md App. A).
    Real checkpoints load via rgie_tpu.utils.torch_convert."""
    model = resnet50(num_classes, dtype)
    variables = model.init(key, jnp.zeros((1, crop_size, crop_size, 3), dtype))
    return EmotionRegressor(variables=variables, num_classes=num_classes,
                            normalize=normalize, input_size=input_size,
                            crop_size=crop_size, use_sigmoid=use_sigmoid, dtype=dtype)
