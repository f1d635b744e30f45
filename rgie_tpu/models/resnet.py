"""Flax ResNet-50 (NHWC), the backbone of the pixel-space valence/arousal
regressor (reference: torchvision resnet50 at
`/root/reference/src/baselines/models/EmotionPredictionModel.py:24-27`).

Architecture matches torchvision exactly (bottleneck v1, downsample on conv2?
no — torchvision places stride on the 3x3 conv, i.e. ResNet v1.5) so that
torch checkpoints convert 1:1 (see rgie_tpu.utils.torch_convert). The frozen
regressor runs with `use_running_average=True`; the training-side variant
(reference: initialize_model, EmotionPredictionModel.py:57-72) updates batch
stats.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4, stride on the 3x3 conv — v1.5)."""

    features: int
    strides: int = 1
    downsample: bool = False
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.features, (3, 3), strides=(self.strides, self.strides),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if self.downsample:
            residual = self.conv(self.features * 4, (1, 1),
                                 strides=(self.strides, self.strides),
                                 use_bias=False, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


def max_pool_same_as_torch(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC.

    Uses XLA's native reduce_window; its select-and-scatter gradient measured
    FASTER on v5e than a hand-written 9-offset pad-sum VJP (8.9ms vs 46ms for
    the regressor's b10@224x64 pool) — don't hand-schedule what the compiler
    does better."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


#: Space-to-depth stem rewrite toggle (env RGIE_STEM_S2D=1). Default OFF:
#: it made the single-image f32 edit ~15%% faster (stem bwd 7.7%% -> ~1%%)
#: but the batch-8 bf16 edit step 1.8x SLOWER — the 6D (..,2,2,C) transposes
#: it inserts are lane-hostile on TPU and broke fusion of the ten-crop
#: concatenate's backward split (device trace: transpose(jvp())/split went
#: from fused to 57.6 ms/step). Measured both ways on-chip 2026-08.
S2D = os.environ.get("RGIE_STEM_S2D", "0") == "1"


class StemConv(nn.Module):
    """The 7x7/2 RGB stem conv, optionally (S2D flag above) rewritten via
    space-to-depth: zero-pad the kernel to 8x8, fold 2x2 input blocks into
    channels (C=3 -> 12), and run a DENSE stride-1 4x4 conv. Identical math
    (the added taps multiply zeros); turns the stem's input gradient from a
    3-channel stride-2 transposed conv into a stride-1 conv.

    With ``s2d_input=True`` the module instead CONSUMES an already
    space-to-depth input (B, H/2, W/2, 4*cin; channel order (row-phase,
    col-phase, cin) as produced by rgie_tpu.ops.geometry.space_to_depth) and
    runs the equivalent stride-1 4x4 conv whose s2d-space zero padding
    ((2,1),(2,1)) corresponds EXACTLY to the image-space pad-3 zeros — this
    is how the ten-crop regressor shares ONE s2d transpose across all ten
    crops (rgie_tpu.models.emotion) instead of transposing each 448px crop.

    Param tree matches nn.Conv ("kernel", HWIO 7x7x3xF) so torchvision
    checkpoints convert unchanged (utils.torch_convert.convert_resnet50)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    s2d_input: bool = False
    s2d4: bool = False  # s2d(4) input AND phase-folded output (see below)

    @nn.compact
    def __call__(self, x):
        if self.s2d4:
            return self._s2d4_call(x)
        cin = x.shape[-1] // 4 if self.s2d_input else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if self.s2d_input:
            # Top/left zero-pad the 7x7 taps to 8x8 so tap index = 2r+phase-1
            # (k8[0] multiplies the out-of-window row), then fold 2x2 phases
            # into channels in (row-phase, col-phase, cin) order.
            k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k4 = k8.reshape(4, 2, 4, 2, cin, self.features).transpose(
                0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, self.features)
            return jax.lax.conv_general_dilated(
                x, k4, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, _ = x.shape
        if h % 2 or w % 2 or not S2D:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # space-to-depth: pad (3,5) -> even extent covering every 8-wide window
        k8 = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, cin, self.features).transpose(
            0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, self.features)
        xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
        hp, wp = h + 8, w + 8
        xs = xp.reshape(b, hp // 2, 2, wp // 2, 2, cin).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * cin)
        y = jax.lax.conv_general_dilated(
            xs, k4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, :h // 2, :w // 2, :]

    def _s2d4_call(self, x):
        """s2d(4) input (B, H/4, W/4, 16*cin) -> PHASE-FOLDED output
        (B, H/4, W/4, 4*features), channel order (row-phase q_r, col-phase
        q_c, f) for the image-space output grid at stride 2.

        Motivation (round-4 device trace): the s2d(2) stem ran its input
        gradient as a conv with only 12 output channels — ~9% MXU lane
        utilization, the #1 op at 4.2% of step time. Folding BOTH sides
        (48 input channels, 256 output channels, 3x3 stride-1) lifts
        utilization ~4x on the same FLOPs. Exact numerics: output position
        o = 2m+q reads image rows 4m+2q-3+κ (κ the 7x7 tap); with input
        cell u = m+a-1 (pad 1) and phase φ, the tap is κ = 4a+φ-2q-1 —
        zero-padded outside [0,7), matching the image-space pad-3 zeros."""
        import numpy as np

        cin = x.shape[-1] // 16
        feats = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, feats))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        # κ+3 = 4a+φ-2q+2 ∈ [0, 14): pad the 7 taps to 14 with 3 front zeros.
        kp = jnp.pad(k, ((3, 4), (3, 4), (0, 0), (0, 0)))
        a = np.arange(3)[:, None, None]
        phi = np.arange(4)[None, :, None]
        q = np.arange(2)[None, None, :]
        idx = (4 * a + phi - 2 * q + 2).reshape(-1)      # (24,) order (a,φ,q)
        kk = kp[idx][:, idx]                             # (24, 24, cin, F)
        kk = kk.reshape(3, 4, 2, 3, 4, 2, cin, feats)
        #              a_r φr q_r a_c φc q_c
        kk = kk.transpose(0, 3, 1, 4, 6, 2, 5, 7)        # a_r a_c φr φc cin q_r q_c F
        kk = kk.reshape(3, 3, 16 * cin, 4 * feats)
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def max_pool_phase_folded(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) consuming a
    PHASE-FOLDED 224-grid (B, 112, 112, 2, 2, F) (StemConv s2d4 output
    reshaped), producing the standard (B, 112, 112, F).

    pooled[m] = max over image rows 2m-1, 2m, 2m+1 = max(phase1[m-1],
    phase0[m], phase1[m]) per dimension — separable, exact, and purely
    elementwise (the select backward fuses, replacing select_and_scatter)."""
    neg = jnp.asarray(-jnp.inf, x.dtype)
    r1 = x[:, :, :, 1]                                   # (B,h,w,2,F)
    r1_up = jnp.concatenate(
        [jnp.full_like(r1[:, :1], neg), r1[:, :-1]], axis=1)
    rows = jnp.maximum(jnp.maximum(x[:, :, :, 0], r1), r1_up)
    c1 = rows[:, :, :, 1]                                # (B,h,w,F)
    c1_left = jnp.concatenate(
        [jnp.full_like(c1[:, :, :1], neg), c1[:, :, :-1]], axis=2)
    return jnp.maximum(jnp.maximum(rows[:, :, :, 0], c1), c1_left)


class ResNet(nn.Module):
    """torchvision-compatible ResNet. stage_sizes=[3,4,6,3] => ResNet-50."""

    stage_sizes: Sequence[int]
    num_classes: int
    num_filters: int = 64
    dtype: jnp.dtype = jnp.float32
    stem_s2d_input: bool = False   # see StemConv.s2d_input
    stem_s2d4: bool = False        # see StemConv._s2d4_call

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        if self.stem_s2d4:
            # Phase-folded stem + elementwise maxpool (exact; see StemConv).
            x = StemConv(self.num_filters, dtype=self.dtype, s2d4=True,
                         name="conv1")(x)
            b, h, w, _ = x.shape
            x = x.reshape(b, h, w, 2, 2, self.num_filters)
            x = norm(name="bn1")(x)   # per-f stats broadcast over phases
            x = nn.relu(x)
            x = max_pool_phase_folded(x)
        else:
            x = StemConv(self.num_filters, dtype=self.dtype,
                         s2d_input=self.stem_s2d_input, name="conv1")(x)
            x = norm(name="bn1")(x)
            x = nn.relu(x)
            x = max_pool_same_as_torch(x)

        for i, block_count in enumerate(self.stage_sizes):
            features = self.num_filters * 2 ** i
            for j in range(block_count):
                strides = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(features=features, strides=strides,
                               downsample=(j == 0), conv=conv, norm=norm,
                               name=f"layer{i + 1}_{j}")(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


def resnet50(num_classes: int, dtype=jnp.float32,
             stem_s2d_input: bool = False, stem_s2d4: bool = False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes,
                  dtype=dtype, stem_s2d_input=stem_s2d_input,
                  stem_s2d4=stem_s2d4)


def init_resnet50(key, num_classes: int, input_size: int = 224, dtype=jnp.float32):
    model = resnet50(num_classes, dtype)
    variables = model.init(key, jnp.zeros((1, input_size, input_size, 3), dtype))
    return model, variables
