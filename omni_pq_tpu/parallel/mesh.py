"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL DDP stack (train.py:771-799, SURVEY.md §2.3).

Design: a 1-D 'data' mesh. Parameters/optimizer state are replicated
(NamedSharding(P())), batches are sharded on their leading axis
(NamedSharding(P('data'))). Inside one jitted train step XLA then inserts the
gradient all-reduce over ICI automatically — the role of DDP's backward hook
— and BatchNorm statistics are computed over the *global* batch, which is
exactly SyncBatchNorm semantics (pq_transformer.py:194) with no extra code.
A 'model' axis of size 1 is kept in the mesh as the hook for tensor
parallelism (not needed for this 17.9M-param model, SURVEY.md §2.3).

Multi-host: call jax.distributed.initialize() before make_mesh(); each host
feeds its local shard via jax.make_array_from_process_local_data.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, model_axis: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_axis == 0
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Put every leaf of a batch dict on the mesh, sharded on axis 0."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / train state) across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def per_host_batch_size(global_batch: int) -> int:
    """Each host feeds global_batch / process_count scenes."""
    n = jax.process_count()
    assert global_batch % n == 0
    return global_batch // n
