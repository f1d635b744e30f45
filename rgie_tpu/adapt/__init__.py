"""Diffusion dataset-editing orchestration (adapter, scorer, output manager)."""

from rgie_tpu.adapt.adapter import (
    ImageAdapter,
    ImageScorer,
    OutputImageManager,
    transform_image,
)
