"""Device mesh + sharding utilities.

The reference's entire distributed backend is a dormant NCCL wrapper
(`/root/reference/src/external/imaginaire/utils/distributed.py:12-117` — never
initialized by any entry point). Here scaling is first-class: per-image edits
are embarrassingly parallel, so the primary mesh axis is ``data`` (image batch
over ICI/DCN); ``model`` shards wide channels of the regressor/generator when
activations at 1024px exceed per-chip HBM. Collectives are XLA-inserted from
NamedSharding constraints (psum/all_gather ride ICI), replacing the
reference's dist_all_reduce_tensor/dist_all_gather_tensor helpers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(shape: Optional[Tuple[int, int]] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh. Default: all devices on the data axis — the right
    layout for batched per-image editing."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over data; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place every array in a pytree with its leading axis sharded on data."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(batch: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad the leading axis to a multiple of the mesh data size (static shapes
    under jit). Returns (padded, original_length)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem:
        pad = np.repeat(batch[-1:], rem, axis=0)
        batch = np.concatenate([batch, pad], axis=0)
    return batch, n


def model_sharding(x: jax.Array, mesh: Mesh) -> NamedSharding:
    """Output-channel (last-axis) sharding over ``model`` for one weight
    array, replicating anything small or non-divisible. Conv kernels (HWIO)
    and Dense kernels (I, O) both carry output features last, so this single
    rule tensor-parallelizes a whole flax params tree; XLA GSPMD propagates
    the shardings and inserts the collectives (the scaling-book recipe — no
    manual psum/all_gather)."""
    m = mesh.shape[MODEL_AXIS]
    if m > 1 and x.ndim >= 1 and x.shape[-1] % m == 0 and x.shape[-1] >= 2 * m:
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [MODEL_AXIS])))
    return NamedSharding(mesh, P())


def shard_model(tree, mesh: Mesh):
    """Place a params pytree with weights sharded over the ``model`` axis.

    This is how a model that cannot EXECUTE on one chip (e.g. the SDXL-1024
    edit program: 5.2 GB of bf16 UNet weights plus 128x128-latent grad
    activations crash a single 16 GB v5e worker) fits a pod slice: per-chip
    weight memory drops by the model-axis size while the batch axis keeps
    scaling on ``data``."""
    return jax.tree.map(lambda x: jax.device_put(x, model_sharding(x, mesh)), tree)


def all_mean(x, axis_name: str = DATA_AXIS):
    """Global mean across the data axis inside shard_map code — the analog of
    the reference's dist_all_reduce_tensor (distributed.py:92-105)."""
    return jax.lax.pmean(x, axis_name)
