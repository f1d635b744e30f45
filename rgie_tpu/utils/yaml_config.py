"""YAML -> config loading for MUNIT-style run configs.

Reference: `/root/reference/src/external/imaginaire/config.py:19-207` (AttrDict
+ Config with deep trainer/gen/dis/data defaults) and the shipped
`imagenet2imagenet.yaml`. Here YAML maps onto the typed dataclasses in
rgie_tpu.config; unknown keys are preserved in an attribute-dict for
forward-compat (the reference warns on unused generator kwargs,
generators/munit.py:211-214).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

from rgie_tpu.config import GanEditConfig, MunitDisConfig, MunitGenConfig


class AttrDict(dict):
    """Recursive attribute dict (imaginaire config.py:19-73)."""

    def __getattr__(self, key):
        try:
            v = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return AttrDict(v) if isinstance(v, dict) and not isinstance(v, AttrDict) else v

    def __setattr__(self, key, value):
        self[key] = value


def load_yaml(path: str) -> AttrDict:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    return _to_attrdict(data)


def _to_attrdict(obj):
    if isinstance(obj, dict):
        return AttrDict({k: _to_attrdict(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_to_attrdict(v) for v in obj]
    return obj


def recursive_update(base: Dict[str, Any], update: Dict[str, Any]) -> Dict[str, Any]:
    """(imaginaire config.py:226-238)"""
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            recursive_update(base[k], v)
        else:
            base[k] = v
    return base


_GEN_KEY_MAP = {
    "latent_dim": "latent_dim",
    "num_filters": "num_filters",
    "max_num_filters": "max_num_filters",
    "num_filters_mlp": "num_filters_mlp",
    "num_res_blocks": "num_res_blocks",
    "num_mlp_blocks": "num_mlp_blocks",
    "num_downsamples_style": "num_downsamples_style",
    "num_downsamples_content": "num_downsamples_content",
    "num_image_channels": "num_image_channels",
    "content_norm_type": "content_norm_type",
    "style_norm_type": "style_norm_type",
    "decoder_norm_type": "decoder_norm_type",
    "pre_act": "pre_act",
}


def munit_gen_config_from_yaml(path: str) -> MunitGenConfig:
    """Parse a `gen:` block like imagenet2imagenet.yaml:54-67 into our typed
    config (weight_norm_type is realized at conversion, so it's dropped)."""
    cfg = load_yaml(path)
    gen = cfg.get("gen", {})
    kwargs = {dst: gen[src] for src, dst in _GEN_KEY_MAP.items() if src in gen}
    if kwargs.get("style_norm_type") == "none":
        kwargs["style_norm_type"] = "none"
    return MunitGenConfig(**kwargs)


def munit_dis_config_from_yaml(path: str) -> MunitDisConfig:
    cfg = load_yaml(path)
    dis = cfg.get("dis", {})
    return MunitDisConfig(
        patch_wise=dis.get("patch_wise", True),
        num_filters=dis.get("num_filters", 48),
        max_num_filters=dis.get("max_num_filters", 1024),
        num_layers=dis.get("num_layers", 5),
    )
