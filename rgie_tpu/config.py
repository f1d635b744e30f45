"""Configuration tree for rgie_tpu.

Replaces the reference's three ad-hoc config systems (dataclasses at
``src/adapt_images/config.py``, hand-edited module constants in the entry
points, and the imaginaire YAML->AttrDict at
``src/external/imaginaire/config.py``) with one dataclass tree plus
environment-overridable paths (the analog of ``src/paths.py:7-15``, minus the
hard-coded user directories).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Paths (reference: src/paths.py) — overridable via environment variables.
# ---------------------------------------------------------------------------

PROJECT_ROOT = Path(__file__).resolve().parent.parent
ARTIFACTS_DIR = Path(os.environ.get("RGIE_ARTIFACTS_DIR", PROJECT_ROOT / "artifacts"))
MODELS_DIR = Path(os.environ.get("RGIE_MODELS_DIR", ARTIFACTS_DIR / "models"))
DATA_DIR = Path(os.environ.get("RGIE_DATA_DIR", ARTIFACTS_DIR / "data"))
OUT_DIR = Path(os.environ.get("RGIE_OUT_DIR", ARTIFACTS_DIR / "out"))


# ---------------------------------------------------------------------------
# Parametric / GAN editing configs
# (reference: src/optimize_image_param.py:30-59, src/optimize_image_imaginaire.py:30-54)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class OptimizeConfig:
    """Per-image Adam optimization settings (reference: src/baselines/optimize_image.py:56-97)."""

    num_steps: int = 300
    learning_rate: float = 0.05
    lr_rampup_length: float = 0.05
    lr_rampdown_length: float = 0.25
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8


@dataclasses.dataclass(frozen=True)
class ParamEditConfig:
    """Parametric pixel-space editing (reference: src/optimize_image_param.py:28-118)."""

    optimize: OptimizeConfig = dataclasses.field(default_factory=OptimizeConfig)
    weight_clf: float = 0.15
    weight_recon: float = 1.0
    weight_dis: float = 0.0
    input_size: int = 480
    crop_size: int = 480
    output_size: int = 1024
    # Rematerialize the objective's frozen-model activations (ten-crop 448px
    # ResNet-50 + CLIP) in the differentiated scan step: one extra forward
    # buys ~the models' activation footprint, unlocking larger image batches
    # (SURVEY §7.3 memory cliff).
    remat: bool = False
    # alpha offsets applied to the original image's VA prediction to form the
    # per-image target (reference: src/optimize_image_param.py:34-42).
    adaptations: Tuple[Tuple[str, float], ...] = (
        ("pos_01", 0.1),
        ("pos_02", 0.2),
        ("neg_01", -0.1),
        ("neg_02", -0.1),
        ("neutral", 0.0),
    )
    # Op order of the active filter chain (reference: src/optimize_image_param.py:227).
    transforms: Tuple[str, ...] = (
        "exposure", "saturation", "tone", "color", "contrast", "sharp", "blur", "scale",
    )


@dataclasses.dataclass(frozen=True)
class GanEditConfig:
    """MUNIT style-space editing (reference: src/optimize_image_imaginaire.py:29-54)."""

    optimize: OptimizeConfig = dataclasses.field(
        default_factory=lambda: OptimizeConfig(num_steps=300, learning_rate=0.05)
    )
    weight_clf: float = 0.2
    weight_recon: float = 1.0
    weight_dis: float = 0.0
    input_size: int = 1024
    crop_size: int = 1024
    # Rematerialize the objective (decode -> VA -> re-encode) on backward:
    # required headroom for 1024px edits at useful batch (SURVEY §7.3).
    remat: bool = False
    adaptations: Tuple[Tuple[str, float], ...] = (
        ("pos_01", 0.1),
        ("pos_02", 0.2),
        ("neg_01", -0.1),
        ("neg_02", -0.1),
        ("neutral", 0.0),
    )


# ---------------------------------------------------------------------------
# MUNIT generator / discriminator hyper-parameters
# (reference: src/external/imaginaire/imagenet2imagenet.yaml:54-75)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MunitGenConfig:
    latent_dim: int = 8
    num_filters: int = 64
    max_num_filters: int = 256
    num_filters_mlp: int = 256
    num_res_blocks: int = 4
    num_mlp_blocks: int = 2
    num_downsamples_style: int = 4
    num_downsamples_content: int = 3
    num_image_channels: int = 3
    content_norm_type: str = "instance"
    style_norm_type: str = "none"
    decoder_norm_type: str = "instance"
    pre_act: bool = True


@dataclasses.dataclass(frozen=True)
class MunitDisConfig:
    patch_wise: bool = True
    num_filters: int = 48
    max_num_filters: int = 1024
    num_layers: int = 5
    num_scales: int = 3
    num_image_channels: int = 3


# ---------------------------------------------------------------------------
# Diffusion editing configs (reference: src/adapt_images/config.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AdaptConfig:
    """Diffusion inversion/resampling settings (reference: src/adapt_images/config.py:3-11).

    Note: the reference's ``end_iteration: int = num_inversion_steps`` binds at
    class-definition time; here it defaults to ``None`` meaning "use
    num_inversion_steps" (the evident intent).
    """

    num_inversion_steps: int = 50
    num_inference_steps: int = 50
    end_iteration: Optional[int] = None
    normalize_gradient: bool = True
    scheduler_type: str = "ddim"
    save_orig: bool = False
    is_xl: bool = True

    def resolved_end_iteration(self) -> int:
        return self.end_iteration if self.end_iteration is not None else self.num_inversion_steps


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Classifier(-free) guidance settings (reference: src/adapt_images/config.py:13-23)."""

    clf_scale: float = 0.2
    reference_value: Optional[float] = None
    prompt: str = ""
    negative_prompt: str = ""
    cfg_scale: float = 2.0
    use_caption: bool = True
    is_nto: bool = True
    max: bool = False
    label: Optional[str] = None

    def resolved_label(self) -> str:
        # The reference bakes the *default* clf_scale into the label at class
        # creation time (quirk, SURVEY §2.4); we compute it per instance.
        return self.label if self.label is not None else f"CG_CFG_{self.cfg_scale:g}_{self.clf_scale:g}"


# ---------------------------------------------------------------------------
# Guidance-regressor training (reference: src/clf/train_guidance_clf.py:42-176)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainGuidanceConfig:
    setting: str = "va"           # va | valence | arousal
    input_type: str = "midu"      # midu | latents
    is_sdxl: bool = False
    image_size: int = 512
    batch_size: int = 8
    learning_rate: float = 1e-5
    weight_decay: float = 5e-5
    num_epochs: int = 100
    num_train_timesteps: int = 1000
    seed: int = 0


# ---------------------------------------------------------------------------
# Parallelism
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. Per-image edits are embarrassingly parallel, so the
    primary axis is ``data`` (batch of images over ICI/DCN); ``model`` is used
    for channel-sharded regressor/generator layers at large resolutions."""

    data_axis: str = "data"
    model_axis: str = "model"
    # (data, model) mesh shape; None = put all devices on the data axis.
    shape: Optional[Tuple[int, int]] = None
