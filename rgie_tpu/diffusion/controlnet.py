"""ControlNet for the SD/SDXL UNet: spatially-conditioned residual injection.

Reference: `/root/reference/src/pipelines/diff_utils.py:47-72` ships ControlNet
pipeline loaders (canny/depth SD + SDXL variants) — dead code in the reference
entry points, rebuilt here for surface parity. Architecture follows diffusers'
ControlNetModel: a trainable copy of the UNet's down + mid path whose inputs
are (noisy latents + an embedded control image) and whose outputs are
zero-initialized 1x1-conv residuals, one per UNet skip connection plus one for
the mid block. The host UNet consumes them via ``down_residuals`` /
``mid_residual`` (rgie_tpu.diffusion.unet.UNet2DCondition.__call__).

Zero convs make the module an exact no-op at init (residuals are all zeros),
so wiring it into a pipeline never perturbs an unconditioned edit.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rgie_tpu.diffusion.unet import (ResnetBlock, Transformer2D, Downsample,
                                     UNetConfig, timestep_embedding)


def _zero_conv(features: int, dtype, name: str):
    return nn.Conv(features, (1, 1), kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros, dtype=dtype, name=name)


class ControlNetConditioningEmbedding(nn.Module):
    """Control image (B, H, W, 3) in [0,1] -> (B, H/8, W/8, ch0) feature map
    (diffusers ControlNetConditioningEmbedding: 16-32-96-256 conv ladder with
    three stride-2 stages, zero conv out). Channel ladder scales down for tiny
    test configs (ch0 < 64)."""

    ch0: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cond):
        ladder = (16, 32, 96, 256) if self.ch0 >= 64 else (4, 4, 8, 8)
        x = nn.Conv(ladder[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(cond.astype(self.dtype))
        x = nn.silu(x)
        for i, (cin, cout) in enumerate(zip(ladder[:-1], ladder[1:])):
            x = nn.Conv(cin, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"block_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(cout, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"block_{2 * i + 1}")(x)
            x = nn.silu(x)
        return _zero_conv(self.ch0, self.dtype, "conv_out")(x)


class ControlNet(nn.Module):
    """Down + mid copy of UNet2DCondition emitting zero-conv residuals.

    __call__(latents, t, context, control_cond, added_*) ->
    (down_residuals: list, one per UNet skip entry, mid_residual)."""

    cfg: UNetConfig = UNetConfig()
    conditioning_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, control_cond,
                 added_text_embeds: Optional[jnp.ndarray] = None,
                 added_time_ids: Optional[jnp.ndarray] = None
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        temb = timestep_embedding(timesteps, ch0)
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_embed_0")(temb.astype(self.dtype))
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(temb))
        if cfg.addition_embed_type == "text_time":
            tids = timestep_embedding(added_time_ids.reshape(-1), cfg.addition_time_embed_dim)
            tids = tids.reshape(sample.shape[0], -1)
            add = jnp.concatenate([added_text_embeds, tids.astype(self.dtype)], axis=-1)
            add = nn.Dense(temb_dim, dtype=self.dtype, name="add_embed_0")(add)
            add = nn.Dense(temb_dim, dtype=self.dtype, name="add_embed_2")(nn.silu(add))
            temb = temb + add

        context = encoder_hidden_states.astype(self.dtype)
        x = nn.Conv(ch0, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(sample.astype(self.dtype))
        x = x + ControlNetConditioningEmbedding(ch0, dtype=self.dtype,
                                                name="cond_embedding")(control_cond)

        residuals = [_zero_conv(ch0, self.dtype, "zero_conv_0")(x)]
        zi = 1
        for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types,
                                                 cfg.block_out_channels)):
            heads = cfg.attention_head_dim[bi]
            for li in range(cfg.layers_per_block):
                x = ResnetBlock(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"down_{bi}_res_{li}")(x, temb)
                if btype == "CrossAttnDownBlock2D":
                    x = Transformer2D(out_ch, heads, out_ch // heads,
                                      cfg.transformer_layers_per_block[bi],
                                      cfg.norm_num_groups, dtype=self.dtype,
                                      name=f"down_{bi}_attn_{li}")(x, context)
                residuals.append(_zero_conv(out_ch, self.dtype, f"zero_conv_{zi}")(x))
                zi += 1
            if bi < len(cfg.block_out_channels) - 1:
                x = Downsample(out_ch, dtype=self.dtype, name=f"down_{bi}_downsample")(x)
                residuals.append(_zero_conv(out_ch, self.dtype, f"zero_conv_{zi}")(x))
                zi += 1

        mid_ch = cfg.block_out_channels[-1]
        heads = cfg.attention_head_dim[-1]
        x = ResnetBlock(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_res_0")(x, temb)
        x = Transformer2D(mid_ch, heads, mid_ch // heads,
                          cfg.transformer_layers_per_block[-1],
                          cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_attn")(x, context)
        x = ResnetBlock(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_res_1")(x, temb)
        mid_residual = _zero_conv(mid_ch, self.dtype, "zero_conv_mid")(x)

        s = self.conditioning_scale
        return [r * s for r in residuals], mid_residual * s


def create_controlnet(key, cfg: UNetConfig, sample_hw: int = 8,
                      context_len: int = 8, image_hw: Optional[int] = None,
                      conditioning_scale: float = 1.0, dtype=jnp.float32):
    """Init a ControlNet for the given UNet config. image_hw defaults to
    8x the latent resolution (the VAE downsample factor of SD/SDXL)."""
    model = ControlNet(cfg, conditioning_scale=conditioning_scale, dtype=dtype)
    image_hw = image_hw if image_hw is not None else sample_hw * 8
    sample = jnp.zeros((1, sample_hw, sample_hw, cfg.in_channels), dtype)
    ctx = jnp.zeros((1, context_len, cfg.cross_attention_dim), dtype)
    cond = jnp.zeros((1, image_hw, image_hw, 3), dtype)
    kwargs = {}
    if cfg.addition_embed_type == "text_time":
        kwargs = dict(added_text_embeds=jnp.zeros((1, cfg.addition_pooled_dim), dtype),
                      added_time_ids=jnp.zeros((1, 6), dtype))
    variables = model.init(key, sample, jnp.zeros((1,), jnp.int32), ctx, cond, **kwargs)
    return model, variables


def controlled_unet_apply(unet, unet_vars, controlnet, cn_vars,
                          latents, t, context, control_cond, **added):
    """One UNet forward with ControlNet conditioning — the functional analog of
    diffusers' StableDiffusionControlNetPipeline UNet step (reference loaders:
    diff_utils.py:47-72). Returns (eps, mid_features)."""
    down_res, mid_res = controlnet.apply(cn_vars, latents, t, context,
                                         control_cond, **added)
    return unet.apply(unet_vars, latents, t, context,
                      down_residuals=down_res, mid_residual=mid_res, **added)
