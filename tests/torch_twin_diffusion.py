"""PyTorch twins of the diffusion stack with DIFFUSERS state-dict naming.

The reference's flagship loads diffusers `from_pretrained` checkpoints
(`/root/reference/src/pipelines/InversionResamplingStableDiffusionPipeline.py:17-21`,
`...XLPipeline.py:15-20`). diffusers is not installed on the build host, so
these twins hand-build the PUBLIC diffusers architectures (UNet2DConditionModel
with use_linear_projection=True, AutoencoderKL) in plain torch with the exact
diffusers parameter naming — their `state_dict()` is what a real checkpoint
looks like to `rgie_tpu.utils.torch_convert.convert_unet_diffusers` /
`convert_vae_diffusers`. Forward math mirrors diffusers semantics (GroupNorm
eps 1e-5 for UNet resnets / 1e-6 for Transformer2D norms and the whole VAE,
exact-erf GEGLU, [cos|sin] sinusoidal timesteps).

The text-encoder twin is the real `transformers.CLIPTextModel` (installed),
driven with a tiny config.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from rgie_tpu.diffusion.unet import UNetConfig
from rgie_tpu.diffusion.vae import VaeConfig


def timestep_embedding_t(timesteps: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / half
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TwinTimeEmbedding(nn.Module):
    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TwinResnet(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TwinAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim))

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        m = context.shape[1]
        q = self.to_q(x).view(b, n, self.heads, self.dim_head)
        k = self.to_k(context).view(b, m, self.heads, self.dim_head)
        v = self.to_v(context).view(b, m, self.heads, self.dim_head)
        attn = torch.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(self.dim_head)
        attn = attn.softmax(dim=-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, -1)
        return self.to_out(out)


class TwinGEGLU(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Linear(dim, dim * 8)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TwinFeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.Sequential(TwinGEGLU(dim), nn.Identity(),
                                 nn.Linear(dim * 4, dim))

    def forward(self, x):
        return self.net(x)


class TwinBasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads, dim_head):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = TwinAttention(dim, dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = TwinAttention(dim, context_dim, heads, dim_head)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = TwinFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class TwinTransformer2D(nn.Module):
    def __init__(self, channels, context_dim, heads, dim_head, depth, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, channels)
        self.transformer_blocks = nn.ModuleList(
            [TwinBasicTransformerBlock(channels, context_dim, heads, dim_head)
             for _ in range(depth)])
        self.proj_out = nn.Linear(channels, channels)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, context)
        y = self.proj_out(y)
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class TwinDownsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TwinVaeDownsample(nn.Module):
    """diffusers VAE Downsample2D: asymmetric (0,1) pad then VALID stride-2."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TwinUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Block(nn.Module):
    """Container matching diffusers down/up/mid block child naming."""

    def __init__(self, resnets, attentions=None, downsamplers=None, upsamplers=None):
        super().__init__()
        self.resnets = nn.ModuleList(resnets)
        if attentions is not None:
            self.attentions = nn.ModuleList(attentions)
        if downsamplers is not None:
            self.downsamplers = nn.ModuleList(downsamplers)
        if upsamplers is not None:
            self.upsamplers = nn.ModuleList(upsamplers)


class TwinUNet(nn.Module):
    """diffusers UNet2DConditionModel twin driven by our UNetConfig.
    Returns (eps, mid_block_features) like rgie_tpu's UNet2DCondition."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, ch0, 3, padding=1)
        self.time_embedding = TwinTimeEmbedding(ch0, temb_dim)
        if cfg.addition_embed_type == "text_time":
            in_dim = cfg.addition_pooled_dim + 6 * cfg.addition_time_embed_dim
            self.add_embedding = TwinTimeEmbedding(in_dim, temb_dim)

        n = len(cfg.block_out_channels)
        self.down_blocks = nn.ModuleList()
        in_ch = ch0
        for bi, (btype, out_ch) in enumerate(zip(cfg.down_block_types,
                                                 cfg.block_out_channels)):
            heads = cfg.attention_head_dim[bi]
            resnets, attns = [], []
            for li in range(cfg.layers_per_block):
                resnets.append(TwinResnet(in_ch, out_ch, temb_dim, g))
                in_ch = out_ch
                if btype == "CrossAttnDownBlock2D":
                    attns.append(TwinTransformer2D(
                        out_ch, cfg.cross_attention_dim, heads, out_ch // heads,
                        cfg.transformer_layers_per_block[bi], g))
            downs = [TwinDownsample(out_ch)] if bi < n - 1 else None
            self.down_blocks.append(_Block(
                resnets, attns if attns else None, downsamplers=downs))

        mid_ch = cfg.block_out_channels[-1]
        heads = cfg.attention_head_dim[-1]
        self.mid_block = _Block(
            [TwinResnet(mid_ch, mid_ch, temb_dim, g),
             TwinResnet(mid_ch, mid_ch, temb_dim, g)],
            [TwinTransformer2D(mid_ch, cfg.cross_attention_dim, heads,
                               mid_ch // heads,
                               cfg.transformer_layers_per_block[-1], g)])

        rev_channels = tuple(reversed(cfg.block_out_channels))
        rev_heads = tuple(reversed(cfg.attention_head_dim))
        rev_tf = tuple(reversed(cfg.transformer_layers_per_block))
        # Skip-channel bookkeeping mirrors diffusers: the skip stack holds the
        # conv_in map, each down resnet output, and each downsample output.
        skip_chs = [ch0]
        for bi, out_ch in enumerate(cfg.block_out_channels):
            skip_chs += [out_ch] * cfg.layers_per_block
            if bi < n - 1:
                skip_chs.append(out_ch)
        self.up_blocks = nn.ModuleList()
        x_ch = mid_ch
        for bi, (btype, out_ch) in enumerate(zip(cfg.up_block_types, rev_channels)):
            resnets, attns = [], []
            for li in range(cfg.layers_per_block + 1):
                skip = skip_chs.pop()
                resnets.append(TwinResnet(x_ch + skip, out_ch, temb_dim, g))
                x_ch = out_ch
                if btype == "CrossAttnUpBlock2D":
                    attns.append(TwinTransformer2D(
                        out_ch, cfg.cross_attention_dim, rev_heads[bi],
                        out_ch // rev_heads[bi], rev_tf[bi], g))
            ups = [TwinUpsample(out_ch)] if bi < n - 1 else None
            self.up_blocks.append(_Block(
                resnets, attns if attns else None, upsamplers=ups))

        self.conv_norm_out = nn.GroupNorm(g, cfg.block_out_channels[0], eps=1e-5)
        self.conv_out = nn.Conv2d(cfg.block_out_channels[0], cfg.out_channels,
                                  3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states,
                added_text_embeds=None, added_time_ids=None):
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        temb = self.time_embedding(
            timestep_embedding_t(timesteps, cfg.block_out_channels[0]))
        if cfg.addition_embed_type == "text_time":
            tids = timestep_embedding_t(added_time_ids.reshape(-1),
                                        cfg.addition_time_embed_dim)
            tids = tids.reshape(sample.shape[0], -1)
            temb = temb + self.add_embedding(
                torch.cat([added_text_embeds, tids], dim=-1))

        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", [])) or [None] * len(blk.resnets)
            for res, attn in zip(blk.resnets, attns):
                x = res(x, temb)
                if attn is not None:
                    x = attn(x, encoder_hidden_states)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, encoder_hidden_states)
        x = self.mid_block.resnets[1](x, temb)
        mid_features = x

        for blk in self.up_blocks:
            attns = list(getattr(blk, "attentions", [])) or [None] * len(blk.resnets)
            for res, attn in zip(blk.resnets, attns):
                x = res(torch.cat([x, skips.pop()], dim=1), temb)
                if attn is not None:
                    x = attn(x, encoder_hidden_states)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)

        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x, mid_features


# ---------------------------------------------------------------------------
# VAE twin (diffusers AutoencoderKL naming)
# ---------------------------------------------------------------------------


class TwinVaeAttention(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.Sequential(nn.Linear(ch, ch))

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = (q @ k.transpose(1, 2) / math.sqrt(c)).softmax(dim=-1)
        y = self.to_out(attn @ v)
        return x + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


class TwinVaeEncoder(nn.Module):
    def __init__(self, cfg: VaeConfig):
        super().__init__()
        g = cfg.norm_num_groups
        chs = cfg.block_out_channels
        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_ch = chs[0]
        for bi, ch in enumerate(chs):
            resnets = []
            for _ in range(cfg.layers_per_block):
                resnets.append(TwinResnet(in_ch, ch, None, g, eps=1e-6))
                in_ch = ch
            downs = [TwinVaeDownsample(ch)] if bi < len(chs) - 1 else None
            self.down_blocks.append(_Block(resnets, downsamplers=downs))
        mid = chs[-1]
        self.mid_block = _Block(
            [TwinResnet(mid, mid, None, g, eps=1e-6),
             TwinResnet(mid, mid, None, g, eps=1e-6)],
            [TwinVaeAttention(mid, g)])
        self.conv_norm_out = nn.GroupNorm(g, mid, eps=1e-6)
        self.conv_out = nn.Conv2d(mid, 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TwinVaeDecoder(nn.Module):
    def __init__(self, cfg: VaeConfig):
        super().__init__()
        g = cfg.norm_num_groups
        chs = cfg.block_out_channels
        mid = chs[-1]
        self.conv_in = nn.Conv2d(cfg.latent_channels, mid, 3, padding=1)
        self.mid_block = _Block(
            [TwinResnet(mid, mid, None, g, eps=1e-6),
             TwinResnet(mid, mid, None, g, eps=1e-6)],
            [TwinVaeAttention(mid, g)])
        self.up_blocks = nn.ModuleList()
        in_ch = mid
        for bi, ch in enumerate(reversed(chs)):
            resnets = []
            for _ in range(cfg.layers_per_block + 1):
                resnets.append(TwinResnet(in_ch, ch, None, g, eps=1e-6))
                in_ch = ch
            ups = [TwinUpsample(ch)] if bi < len(chs) - 1 else None
            self.up_blocks.append(_Block(resnets, upsamplers=ups))
        self.conv_norm_out = nn.GroupNorm(g, chs[0], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[0], cfg.in_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TwinVAE(nn.Module):
    """diffusers AutoencoderKL twin. encode() returns the SCALED posterior
    mean (deterministic mode, like our AutoencoderKL.encode without a key)."""

    def __init__(self, cfg: VaeConfig):
        super().__init__()
        self.cfg = cfg
        self.encoder = TwinVaeEncoder(cfg)
        self.decoder = TwinVaeDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)

    def encode(self, images):
        moments = self.quant_conv(self.encoder(images))
        mean = moments.chunk(2, dim=1)[0]
        return self.cfg.scaling_factor * mean

    def decode(self, latents):
        return self.decoder(self.post_quant_conv(latents / self.cfg.scaling_factor))


# ---------------------------------------------------------------------------
# HF CLIPTextModel twin (the real transformers implementation, tiny config)
# ---------------------------------------------------------------------------


def make_hf_text_twin(width=32, layers=2, heads=2, vocab=100,
                      hidden_act="quick_gelu", proj_dim=None, seed=0):
    """Tiny transformers CLIPTextModel(WithProjection). EOS pooling uses the
    argmax-token path, so test token rows must keep the EOS id maximal."""
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=vocab, hidden_size=width, intermediate_size=width * 4,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=77, hidden_act=hidden_act,
        projection_dim=proj_dim or width,
        # EOS = the top id of the tiny vocab: HF pools the FIRST eos position,
        # our tower pools argmax(tokens) — identical when EOS is the max id
        # and appears once (CLIP's real framing).
        bos_token_id=vocab - 2, eos_token_id=vocab - 1)
    torch.manual_seed(seed)
    model = (CLIPTextModelWithProjection if proj_dim else CLIPTextModel)(cfg)
    return model.eval()
