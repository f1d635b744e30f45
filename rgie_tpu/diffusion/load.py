"""Load a local diffusers-format checkpoint directory into the TPU pipeline.

The reference calls `from_pretrained("stabilityai/sd-turbo")` /
`("stabilityai/stable-diffusion-xl-base-1.0")`
(`/root/reference/src/pipelines/InversionResamplingStableDiffusionPipeline.py:17-21`,
`...XLPipeline.py:15-20`). This is the zero-egress analog: point it at an
already-downloaded diffusers snapshot directory

    <root>/unet/diffusion_pytorch_model.safetensors
    <root>/vae/diffusion_pytorch_model.safetensors
    <root>/text_encoder/model.safetensors
    <root>/text_encoder_2/model.safetensors        (SDXL)
    <root>/tokenizer/merges.txt                    (used for real BPE)

and it converts every tower through `rgie_tpu.utils.torch_convert`
(`convert_unet_diffusers` / `convert_vae_diffusers` / `convert_clip_text_hf`
— each torch-twin parity-tested in tests/test_diffusion_parity.py) into the
Flax trees the pipeline consumes. `.bin` (torch pickle) checkpoints are
accepted where safetensors are absent.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from rgie_tpu.diffusion.unet import UNetConfig
from rgie_tpu.diffusion.vae import VaeConfig


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """One weights file (safetensors or torch .bin) -> numpy state dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        try:
            return dict(load_file(path))
        except Exception:
            # bf16/fp16 tensors: go through torch for dtype support.
            from safetensors.torch import load_file as load_torch

            return {k: v.float().numpy() for k, v in load_torch(path).items()}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.float().numpy() for k, v in obj.items() if hasattr(v, "shape")}


def _find_weights(subdir: str) -> Optional[str]:
    if not os.path.isdir(subdir):
        return None
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors",
                 "diffusion_pytorch_model.bin", "pytorch_model.bin",
                 "diffusion_pytorch_model.fp16.safetensors",
                 "model.fp16.safetensors"):
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    return None


def _read_config(subdir: str) -> Dict[str, Any]:
    p = os.path.join(subdir, "config.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def unet_config_from_json(cfg: Dict[str, Any]) -> UNetConfig:
    """diffusers unet/config.json -> UNetConfig (falls back to SD2.1 fields)."""
    d = UNetConfig()
    if not cfg:
        return d
    return UNetConfig(
        in_channels=cfg.get("in_channels", d.in_channels),
        out_channels=cfg.get("out_channels", d.out_channels),
        block_out_channels=tuple(cfg.get("block_out_channels", d.block_out_channels)),
        down_block_types=tuple(cfg.get("down_block_types", d.down_block_types)),
        up_block_types=tuple(cfg.get("up_block_types", d.up_block_types)),
        layers_per_block=cfg.get("layers_per_block", d.layers_per_block),
        transformer_layers_per_block=tuple(
            cfg["transformer_layers_per_block"]
            if isinstance(cfg.get("transformer_layers_per_block"), (list, tuple))
            else [cfg.get("transformer_layers_per_block", 1)]
            * len(cfg.get("block_out_channels", d.block_out_channels))),
        attention_head_dim=tuple(
            cfg["attention_head_dim"]
            if isinstance(cfg.get("attention_head_dim"), (list, tuple))
            else [cfg.get("attention_head_dim", 8)]
            * len(cfg.get("block_out_channels", d.block_out_channels))),
        cross_attention_dim=cfg.get("cross_attention_dim", d.cross_attention_dim),
        addition_embed_type=cfg.get("addition_embed_type"),
        addition_time_embed_dim=cfg.get("addition_time_embed_dim",
                                        d.addition_time_embed_dim) or d.addition_time_embed_dim,
        projection_class_embeddings_input_dim=cfg.get(
            "projection_class_embeddings_input_dim",
            d.projection_class_embeddings_input_dim) or d.projection_class_embeddings_input_dim,
        norm_num_groups=cfg.get("norm_num_groups", d.norm_num_groups),
    )


def vae_config_from_json(cfg: Dict[str, Any], is_xl: bool) -> VaeConfig:
    d = VaeConfig.sdxl() if is_xl else VaeConfig.sd()
    if not cfg:
        return d
    return VaeConfig(
        in_channels=cfg.get("in_channels", d.in_channels),
        latent_channels=cfg.get("latent_channels", d.latent_channels),
        block_out_channels=tuple(cfg.get("block_out_channels", d.block_out_channels)),
        layers_per_block=cfg.get("layers_per_block", d.layers_per_block),
        norm_num_groups=cfg.get("norm_num_groups", d.norm_num_groups),
        scaling_factor=cfg.get("scaling_factor", d.scaling_factor),
    )


class DiffusersCheckpoint:
    """Converted contents of one diffusers snapshot directory.

    ``text_cfg``/``text2_cfg`` are the raw ``text_encoder*/config.json``
    dicts (ADVICE r3: SD1.x towers use hidden_act=quick_gelu while
    SD2.x/sd-turbo use gelu — hardcoding per role silently mis-activates
    every transformer block; derive from the checkpoint instead)."""

    def __init__(self, unet_cfg: UNetConfig, unet_vars: Any,
                 vae_cfg: VaeConfig, vae_vars: Any,
                 text_vars: Any, text2_vars: Any = None,
                 merges_path: Optional[str] = None,
                 text_cfg: Optional[Dict[str, Any]] = None,
                 text2_cfg: Optional[Dict[str, Any]] = None):
        self.unet_cfg = unet_cfg
        self.unet_vars = unet_vars
        self.vae_cfg = vae_cfg
        self.vae_vars = vae_vars
        self.text_vars = text_vars
        self.text2_vars = text2_vars
        self.merges_path = merges_path
        self.text_cfg = text_cfg or {}
        self.text2_cfg = text2_cfg or {}

    @property
    def is_xl(self) -> bool:
        return self.unet_cfg.addition_embed_type == "text_time"

    @property
    def text_act(self) -> str:
        # HF CLIPTextConfig's default hidden_act is quick_gelu (CLIP ViT-L,
        # i.e. SD1.x / SDXL tower 1); SD2.x OpenCLIP configs say "gelu".
        return self.text_cfg.get("hidden_act", "quick_gelu")

    @property
    def text2_act(self) -> str:
        # SDXL tower 2 (OpenCLIP bigG) ships hidden_act="gelu".
        return self.text2_cfg.get("hidden_act", "gelu")


def load_diffusers_checkpoint(root: str, dtype=None) -> DiffusersCheckpoint:
    """Convert a local diffusers snapshot dir. ``dtype`` (e.g. jnp.bfloat16)
    casts UNet/VAE weights at load; text towers stay f32 (they run once per
    edit). Missing towers are returned as None rather than raising, so a
    UNet-only dir still serves midu feature extraction."""
    import jax.numpy as jnp

    from rgie_tpu.utils.torch_convert import (convert_clip_text_hf,
                                              convert_unet_diffusers,
                                              convert_vae_diffusers)

    import jax

    def to_jnp(tree, dt=None):
        return jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), dt), tree)

    unet_cfg = unet_config_from_json(_read_config(os.path.join(root, "unet")))
    is_xl = unet_cfg.addition_embed_type == "text_time"
    vae_cfg = vae_config_from_json(_read_config(os.path.join(root, "vae")), is_xl)

    unet_vars = vae_vars = text_vars = text2_vars = None
    p = _find_weights(os.path.join(root, "unet"))
    if p:
        unet_vars = to_jnp(convert_unet_diffusers(load_state_dict_file(p), unet_cfg), dtype)
    p = _find_weights(os.path.join(root, "vae"))
    if p:
        vae_vars = to_jnp(convert_vae_diffusers(load_state_dict_file(p), vae_cfg), dtype)
    p = _find_weights(os.path.join(root, "text_encoder"))
    if p:
        text_vars = to_jnp(convert_clip_text_hf(load_state_dict_file(p)))
    p = _find_weights(os.path.join(root, "text_encoder_2"))
    if p:
        text2_vars = to_jnp(convert_clip_text_hf(load_state_dict_file(p)))

    merges = os.path.join(root, "tokenizer", "merges.txt")
    merges_path = merges if os.path.exists(merges) else None
    if merges_path and not os.environ.get("RGIE_CLIP_BPE_PATH"):
        # Register the checkpoint's own vocab so tokenize() uses real BPE.
        os.environ["RGIE_CLIP_BPE_PATH"] = merges_path
        import rgie_tpu.diffusion.text_encoder as TE

        TE._BPE = None  # drop a cached hash-fallback decision
    return DiffusersCheckpoint(unet_cfg, unet_vars, vae_cfg, vae_vars,
                               text_vars, text2_vars, merges_path,
                               text_cfg=_read_config(os.path.join(root, "text_encoder")),
                               text2_cfg=_read_config(os.path.join(root, "text_encoder_2")))
