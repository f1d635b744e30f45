"""Flax Inception-v3 (NHWC) — the calibrated feature extractor for FID/KID/ISC.

Reference: `/root/reference/src/analysis/process_result_images.py:78-87` calls
torch_fidelity.calculate_metrics(isc=True, fid=True, kid=True), whose feature
extractor is the TF-ported Inception-v3 used by pytorch-fid: torchvision's
inception_v3 graph with three pooling quirks (the "FID variant"):

  * InceptionA/C/E branch_pool avg-pools with count_include_pad=False,
  * the LAST InceptionE block (Mixed_7c) uses a 3x3/1 MAX pool branch,
  * fc has 1008 outputs (TF class layout) used for the Inception Score.

``fid_variant=False`` gives the stock torchvision graph instead. Weights
convert 1:1 from either checkpoint's state_dict via
rgie_tpu.utils.torch_convert.convert_inception_v3 (torchvision naming —
pt_inception-2015-12-05 uses the same module names).

Input: (B, 299, 299, 3) in [-1, 1] (use ``preprocess`` for [0,1] images at
any resolution: bilinear resize to 299 then 2x-1, pytorch-fid conventions).
Returns (pool features (B, 2048), logits (B, num_classes)).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _avg_pool_3x3_s1(x: jnp.ndarray, count_include_pad: bool) -> jnp.ndarray:
    """torch F.avg_pool2d(x, 3, stride=1, padding=1[, count_include_pad])."""
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    if count_include_pad:
        return sums / 9.0
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    return sums / counts


def _max_pool(x: jnp.ndarray, window: int, stride: int,
              padding: int = 0) -> jnp.ndarray:
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1), (1, stride, stride, 1), pad)


class BasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv2d, dtype=self.dtype)
        b1 = c(64, name="branch1x1")(x)
        b5 = c(48, name="branch5x5_1")(x)
        b5 = c(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = c(64, name="branch3x3dbl_1")(x)
        b3 = c(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = c(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1(x, count_include_pad=not self.fid_variant)
        bp = c(self.pool_features, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv2d, dtype=self.dtype)
        b3 = c(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = c(64, name="branch3x3dbl_1")(x)
        bd = c(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = c(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv2d, dtype=self.dtype)
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = c(192, name="branch1x1")(x)
        b7 = c(c7, name="branch7x7_1")(x)
        b7 = c(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = c(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = c(c7, name="branch7x7dbl_1")(x)
        bd = c(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = c(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = c(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = c(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1(x, count_include_pad=not self.fid_variant)
        bp = c(192, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv2d, dtype=self.dtype)
        b3 = c(192, name="branch3x3_1")(x)
        b3 = c(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = c(192, name="branch7x7x3_1")(x)
        b7 = c(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = c(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = c(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """pool_mode: 'avg' (Mixed_7b; count_include_pad=False in the FID
    variant) or 'max' (Mixed_7c in the FID variant only)."""

    pool_mode: str = "avg"
    fid_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv2d, dtype=self.dtype)
        b1 = c(320, name="branch1x1")(x)
        b3 = c(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            c(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3),
            c(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = c(448, name="branch3x3dbl_1")(x)
        bd = c(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            c(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd),
            c(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, padding=1)
        else:
            bp = _avg_pool_3x3_s1(x, count_include_pad=not self.fid_variant)
        bp = c(192, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision inception_v3 graph (aux head omitted — eval only).

    num_classes=1008 matches the TF-ported FID checkpoint (torch_fidelity /
    pytorch-fid); torchvision ImageNet weights use 1000."""

    num_classes: int = 1008
    fid_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv2d, dtype=self.dtype)
        fv = self.fid_variant
        x = c(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = c(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = c(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = c(80, name="Conv2d_3b_1x1")(x)
        x = c(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, fid_variant=fv, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, fid_variant=fv, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, fid_variant=fv, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, fid_variant=fv, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, fid_variant=fv, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, fid_variant=fv, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, fid_variant=fv, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", fid_variant=fv, dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max" if fv else "avg", fid_variant=fv, dtype=self.dtype,
                       name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))            # adaptive avg pool to 1x1
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(feats.astype(jnp.float32))
        return feats.astype(jnp.float32), logits


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] images (B, H, W, 3) -> [-1,1] at 299px (pytorch-fid conventions:
    bilinear resize without antialias/corner alignment, then 2x-1)."""
    b = images.shape[0]
    x = jax.image.resize(images, (b, 299, 299, 3), method="bilinear")
    return x * 2.0 - 1.0


def create_inception(key: jax.Array, num_classes: int = 1008,
                     fid_variant: bool = True, dtype: Any = jnp.float32):
    model = InceptionV3(num_classes=num_classes, fid_variant=fid_variant,
                        dtype=dtype)
    variables = model.init(key, jnp.zeros((1, 299, 299, 3), dtype))
    return model, variables


def make_feature_extractor(model: InceptionV3, variables: Any,
                           batch_size: int = 32):
    """images (N, H, W, 3) [0,1] numpy -> ((N, 2048) features,
    (N, C) softmax probs), batched + jitted. Drop-in for
    analysis.fid.calculate_metrics's feature_extractor/prob_fn pair."""
    import numpy as np

    @jax.jit
    def run(imgs):
        feats, logits = model.apply(variables, preprocess(imgs))
        return feats, jax.nn.softmax(logits, axis=-1)

    def extract(images) -> Tuple[Any, Any]:
        fs, ps = [], []
        for i in range(0, len(images), batch_size):
            f, p = run(jnp.asarray(images[i:i + batch_size]))
            fs.append(np.asarray(f))
            ps.append(np.asarray(p))
        return np.concatenate(fs, axis=0), np.concatenate(ps, axis=0)

    return extract
