"""Discriminators (Flax, NHWC): the pixel-space multi-scale discriminator and
the MUNIT multi-resolution patch discriminator.

References:
  * `/root/reference/src/baselines/models/Discriminator.py` — n_scale conv
    towers + per-scale MLP logits, averaged then sigmoid (used by the optional
    weight_dis > 0 path of optimize_image_param.py:91-98).
  * `/root/reference/src/external/imaginaire/discriminators/multires_patch.py`
    — N patch discriminators at 0.5x downsampled scales (MUNIT config:
    patch_wise, 48 filters, max 1024, 5 layers, spectral — yaml:68-75).
Spectral norm realized at conversion time, as with the generator.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_KAIMING = nn.initializers.kaiming_normal()


def _reflect_pad(x, pad):
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def avg_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch avg_pool2d(kernel=3, stride=2, padding=1) with count_include_pad
    (the torch default) on NHWC."""
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    return summed / 9.0


def _linear_matrix_align_corners(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) interpolation matrix for align_corners=True bilinear."""
    if n_out == 1:
        m = jnp.zeros((1, n_in))
        return m.at[0, 0].set(1.0)
    coords = jnp.linspace(0.0, n_in - 1.0, n_out)
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.minimum(lo + 1, n_in - 1)
    frac = coords - lo
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in))
    m = m.at[rows, lo].add(1.0 - frac)
    return m.at[rows, hi].add(frac)


def bilinear_half(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=0.5, bilinear, align_corners=True) — torch
    parity (multires_patch.py:169-171), expressed as two matmuls so the resize
    rides the MXU instead of gather lanes (jax.image.resize uses half-pixel
    centers, which is the WRONG convention here)."""
    b, h, w, c = x.shape
    my = _linear_matrix_align_corners(h, h // 2).astype(x.dtype)
    mx = _linear_matrix_align_corners(w, w // 2).astype(x.dtype)
    out = jnp.einsum("oh,bhwc->bowc", my, x)
    return jnp.einsum("pw,bowc->bopc", mx, out)


class PixelDiscriminator(nn.Module):
    """Multi-scale pixel discriminator (Discriminator.py:5-120). Supported
    input sizes follow the reference: (480|620)x480 -> 6 conv layers / max
    1024 channels; (120|160)x120 -> 4 layers / max 256."""

    num_features: int = 64
    n_scale: int = 3
    size_w: int = 480
    size_h: int = 480

    def _arch(self) -> Tuple[int, int]:
        if self.size_w in (620, 480) and self.size_h == 480:
            return 6, 1024
        if self.size_w in (160, 120) and self.size_h == 120:
            return 4, 256
        raise ValueError("image input dimension not supported")

    @nn.compact
    def __call__(self, x):
        n_dis, max_channels = self._arch()
        logits = []
        im = x
        for scale in range(self.n_scale):
            h = im
            ch = self.num_features
            h = _reflect_pad(h, 1)
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding="VALID",
                        kernel_init=_KAIMING, name=f"s{scale}_conv0")(h)
            h = nn.leaky_relu(h, 0.2)
            for i in range(1, n_dis):
                out_ch = ch * 2
                h = _reflect_pad(h, 1)
                h = nn.Conv(out_ch, (4, 4), strides=(2, 2), padding="VALID",
                            kernel_init=_KAIMING, name=f"s{scale}_conv{i}")(h)
                h = nn.leaky_relu(h, 0.2)
                if ch < max_channels:
                    ch = ch * 2
            h = h.reshape(h.shape[0], -1)
            h = nn.leaky_relu(nn.Dense(128, name=f"s{scale}_fc0")(h), 0.2)
            logits.append(nn.Dense(1, name=f"s{scale}_fc1")(h))
            if scale != self.n_scale - 1:
                im = avg_pool_3x3_s2(im)
        # Mean of per-scale hinge logits, then sigmoid (Discriminator.py:70-76).
        return jax.nn.sigmoid(jnp.mean(jnp.stack(logits), axis=0))


class NLayerPatchDiscriminator(nn.Module):
    """Patch discriminator (multires_patch.py:244-313): stride-2 conv stack
    (last hidden layer stride 1) + 1-channel conv head; zero padding, CNA,
    leaky relu."""

    num_filters: int = 48
    num_layers: int = 5
    max_num_filters: int = 1024
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        pad = (self.kernel_size - 1) // 2
        padding = ((pad, pad), (pad, pad))
        features = []
        nf = self.num_filters
        x = nn.leaky_relu(nn.Conv(nf, (self.kernel_size,) * 2, strides=(2, 2),
                                  padding=padding, name="layer0")(x), 0.2)
        features.append(x)
        for n in range(self.num_layers):
            nf = min(nf * 2, self.max_num_filters)
            stride = 2 if n < self.num_layers - 1 else 1
            x = nn.leaky_relu(nn.Conv(nf, (self.kernel_size,) * 2,
                                      strides=(stride, stride), padding=padding,
                                      name=f"layer{n + 1}")(x), 0.2)
            features.append(x)
        out = nn.Conv(1, (3, 3), padding=((pad, pad), (pad, pad)),
                      name=f"layer{self.num_layers + 1}")(x)
        return out, features


class MultiResPatchDiscriminator(nn.Module):
    """N patch discriminators over bilinear-0.5x pyramids
    (multires_patch.py:103-172)."""

    num_discriminators: int = 3
    num_filters: int = 48
    num_layers: int = 5
    max_num_filters: int = 1024

    @nn.compact
    def __call__(self, x):
        outputs, features_all, inputs = [], [], []
        im = x
        for i in range(self.num_discriminators):
            inputs.append(im)
            out, feats = NLayerPatchDiscriminator(
                self.num_filters, self.num_layers, self.max_num_filters,
                name=f"dis_{i}")(im)
            outputs.append(out)
            features_all.append(feats)
            if i != self.num_discriminators - 1:
                im = bilinear_half(im)
        return outputs, features_all, inputs
