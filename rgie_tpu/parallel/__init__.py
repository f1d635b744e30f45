"""Mesh/sharding layer: data-parallel batched edits, model-parallel layers."""

from rgie_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    pad_to_multiple,
    model_sharding,
    replicate,
    replicated,
    shard_batch,
    shard_model,
)
