"""Mesh/sharding layer: data-parallel batched edits, model-parallel layers."""

from rgie_tpu.parallel.distributed import (
    all_processes_barrier,
    create_hybrid_mesh,
    global_from_local,
    init_distributed,
    is_main_process,
    local_rows,
    process_info,
)
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
