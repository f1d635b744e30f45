"""MUNIT autoencoder (Flax, NHWC) — the GAN backend of the editing framework.

Re-design of the vendored imaginaire generator
(`/root/reference/src/external/imaginaire/generators/munit.py` +
`generators/unit.py:166-238` ContentEncoder + `layers/{conv,residual,
activation_norm}.py`), specialized to the shipped `imagenet2imagenet.yaml`
hyper-parameters: latent 8, filters 64 (max 256), MLP 256x2, 4 pre-act
res blocks, style downsamples 4, content downsamples 3, instance norm,
spectral weight norm, reflect padding.

TPU-first decisions:
  * channels-last everywhere; reflect pads applied explicitly then VALID
    convs (fuses cleanly in XLA).
  * spectral norm is *realized into the kernels at checkpoint-conversion
    time* (inference-only editing, matching imaginaire's
    ``remove_weight_norms`` intent) — the forward graph is plain convs.
  * AdaIN = instance-norm (affine=False) + FiLM with per-layer Dense(style),
    an explicit conditional input instead of imaginaire's module-attribute
    plumbing (conv.py:130-149).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rgie_tpu.config import MunitGenConfig

_ORTHO = nn.initializers.orthogonal()  # imaginaire trainer init (yaml:37-39)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) on NHWC: normalize over (H, W) per channel."""
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True) (imaginaire default for 'instance',
    activation_norm.py:590-592)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return instance_norm(x, self.epsilon) * scale + bias


class AdaIN(nn.Module):
    """Adaptive instance norm (imaginaire AdaptiveNorm, activation_norm.py:20-129):
    x_norm * (1 + gamma) + beta with (gamma, beta) = Dense(style).chunk(2)."""

    features: int

    @nn.compact
    def __call__(self, x, style):
        y = nn.Dense(self.features * 2, kernel_init=_ORTHO, name="fc")(style)
        gamma, beta = jnp.split(y, 2, axis=-1)
        gamma = gamma[:, None, None, :]
        beta = beta[:, None, None, :]
        return instance_norm(x) * (1.0 + gamma) + beta


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class ConvBlock(nn.Module):
    """conv/norm/activation in a configurable order (imaginaire _BaseConvBlock
    order strings, conv.py:104-117). norm: none|instance|adaptive."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    order: str = "CNA"
    norm: str = "none"
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style: Optional[jnp.ndarray] = None):
        def conv(h):
            h = _reflect_pad(h, self.pad)
            return nn.Conv(self.features, (self.kernel, self.kernel),
                           strides=(self.stride, self.stride), padding="VALID",
                           kernel_init=_ORTHO, dtype=self.dtype, name="conv")(h)

        def norm(h):
            if self.norm == "instance":
                return InstanceNorm(name="norm")(h)
            if self.norm == "adaptive":
                return AdaIN(h.shape[-1], name="norm")(h, style)
            return h

        def act(h):
            if self.activation == "relu":
                return nn.relu(h)
            if self.activation == "tanh":
                return jnp.tanh(h)
            return h

        table = {"C": conv, "N": norm, "A": act}
        for op in self.order:
            x = table[op](x)
        return x


class ResBlock(nn.Module):
    """Two conv blocks + identity shortcut (imaginaire _BaseResBlock,
    residual.py:18-264). order 'NACNAC' == pre-act (the shipped config,
    yaml:67); 'CNACNA' also supported."""

    features: int
    order: str = "NACNAC"
    norm: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style: Optional[jnp.ndarray] = None):
        dx = ConvBlock(self.features, 3, 1, 1, order=self.order[0:3],
                       norm=self.norm, activation="relu", dtype=self.dtype,
                       name="conv_block_0")(x, style)
        dx = ConvBlock(self.features, 3, 1, 1, order=self.order[3:6],
                       norm=self.norm, activation="relu", dtype=self.dtype,
                       name="conv_block_1")(dx, style)
        return x + dx


class StyleEncoder(nn.Module):
    """(B, H, W, 3) -> (B, latent_dim) style code (munit.py:294-339)."""

    cfg: MunitGenConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nf = self.cfg.num_filters
        x = ConvBlock(nf, 7, 1, 3, activation="relu", dtype=self.dtype, name="layer_0")(x)
        for i in range(2):
            x = ConvBlock(nf * 2, 4, 2, 1, activation="relu", dtype=self.dtype,
                          name=f"layer_{i + 1}")(x)
            nf *= 2
        for i in range(self.cfg.num_downsamples_style - 2):
            x = ConvBlock(nf, 4, 2, 1, activation="relu", dtype=self.dtype,
                          name=f"layer_{i + 3}")(x)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        x = nn.Dense(self.cfg.latent_dim, kernel_init=_ORTHO, name="fc")(x)  # 1x1 conv
        return x


class ContentEncoder(nn.Module):
    """(B, H, W, 3) -> (B, H/2^d, W/2^d, C) content code (unit.py:166-238)."""

    cfg: MunitGenConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        order = "NACNAC" if cfg.pre_act else "CNACNA"
        nf = cfg.num_filters
        x = ConvBlock(nf, 7, 1, 3, norm="instance", activation="relu",
                      dtype=self.dtype, name="layer_0")(x)
        for i in range(cfg.num_downsamples_content):
            nf = min(nf * 2, cfg.max_num_filters)
            x = ConvBlock(nf, 4, 2, 1, norm="instance", activation="relu",
                          dtype=self.dtype, name=f"layer_{i + 1}")(x)
        for i in range(cfg.num_res_blocks):
            x = ResBlock(nf, order=order, norm="instance", dtype=self.dtype,
                         name=f"res_{i}")(x)
        return x

    @property
    def output_dim(self) -> int:
        return min(self.cfg.num_filters * 2 ** self.cfg.num_downsamples_content,
                   self.cfg.max_num_filters)


class StyleMLP(nn.Module):
    """style code -> AdaIN conditioning vector (munit.py:430-465)."""

    cfg: MunitGenConfig

    @nn.compact
    def __call__(self, style):
        nf = self.cfg.num_filters_mlp
        x = nn.relu(nn.Dense(nf, kernel_init=_ORTHO, name="linear_0")(style))
        for i in range(self.cfg.num_mlp_blocks - 2):
            x = nn.relu(nn.Dense(nf, kernel_init=_ORTHO, name=f"linear_{i + 1}")(x))
        x = nn.relu(nn.Dense(nf, kernel_init=_ORTHO,
                             name=f"linear_{self.cfg.num_mlp_blocks - 1}")(x))
        return x


def nearest_upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class Decoder(nn.Module):
    """(content, mlp(style)) -> image (munit.py:342-427): AdaIN res blocks,
    nearest-upsample convs (also AdaIN-conditioned), 7x7 output conv."""

    cfg: MunitGenConfig
    content_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, content, style_vec):
        cfg = self.cfg
        order = "NACNAC" if cfg.pre_act else "CNACNA"
        x = content
        for i in range(cfg.num_res_blocks):
            x = ResBlock(self.content_dim, order=order, norm="adaptive",
                         dtype=self.dtype, name=f"res_{i}")(x, style_vec)
        nf = self.content_dim
        for i in range(cfg.num_downsamples_content):
            x = nearest_upsample(x, 2)
            x = ConvBlock(nf // 2, 5, 1, 2, norm="adaptive", activation="relu",
                          dtype=self.dtype, name=f"up_{i}")(x, style_vec)
            nf //= 2
        # Output conv stays f32 (image-range output under mixed precision).
        x = ConvBlock(cfg.num_image_channels, 7, 1, 3, norm="none",
                      activation="none", dtype=jnp.float32, name="out")(x)
        return x


class AutoEncoder(nn.Module):
    """MUNIT autoencoder: encode -> (content, style); decode(content, style)
    (munit.py:159-291). Style is (B, latent_dim) (the reference's (B,8,1,1)
    squeezed)."""

    cfg: MunitGenConfig = MunitGenConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.style_encoder = StyleEncoder(self.cfg, self.dtype)
        self.content_encoder = ContentEncoder(self.cfg, self.dtype)
        content_dim = min(self.cfg.num_filters * 2 ** self.cfg.num_downsamples_content,
                          self.cfg.max_num_filters)
        self.decoder = Decoder(self.cfg, content_dim, self.dtype)
        self.mlp = StyleMLP(self.cfg)

    def encode(self, images):
        return self.content_encoder(images), self.style_encoder(images)

    def decode(self, content, style):
        return self.decoder(content, self.mlp(style))

    def __call__(self, images):
        content, style = self.encode(images)
        return self.decode(content, style)


@dataclasses.dataclass(frozen=True)
class MunitGenerator:
    """Bound generator with a/b domain autoencoders (munit.py:16-27). Editing
    only ever touches autoencoder_a.encode/decode (optimize_image_imaginaire.py:114,126)."""

    variables_a: Any
    variables_b: Any
    cfg: MunitGenConfig = MunitGenConfig()
    dtype: Any = jnp.float32

    def _model(self) -> AutoEncoder:
        return AutoEncoder(self.cfg, self.dtype)

    def encode_a(self, images):
        return self._model().apply(self.variables_a, images, method=AutoEncoder.encode)

    def decode_a(self, content, style):
        return self._model().apply(self.variables_a, content, style,
                                   method=AutoEncoder.decode)

    def encode_b(self, images):
        return self._model().apply(self.variables_b, images, method=AutoEncoder.encode)

    def decode_b(self, content, style):
        return self._model().apply(self.variables_b, content, style,
                                   method=AutoEncoder.decode)


def create_generator(key: jax.Array, cfg: MunitGenConfig = MunitGenConfig(),
                     image_size: int = 64, dtype=jnp.float32) -> MunitGenerator:
    """Random-weight generator (the real `imaginaire_munit_200000_s5.pt`
    checkpoint converts via rgie_tpu.utils.torch_convert)."""
    model = AutoEncoder(cfg, dtype)
    ka, kb = jax.random.split(key)
    dummy = jnp.zeros((1, image_size, image_size, cfg.num_image_channels))
    va = model.init(ka, dummy)
    vb = model.init(kb, dummy)
    return MunitGenerator(variables_a=va, variables_b=vb, cfg=cfg, dtype=dtype)
