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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-controller bring-up — the reference's init_process_group
    equivalent (train.py:775-776, backend='nccl' -> ICI/DCN here).

    Must run before any JAX device access. With no arguments JAX reads the
    cluster env (TPU pod metadata / JAX_COORDINATOR_ADDRESS etc.)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_batch(batch: Any, mesh: Mesh) -> Any:
    """Each process feeds its LOCAL slice of the global batch; leaves become
    global jax.Arrays sharded on 'data' (the DistributedSampler + DDP input
    path, train.py:260,283). Single-process: identical to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)


def gather_scenes(tree: Any) -> Any:
    """Fetch every leaf to host numpy as the FULL global batch: global
    device arrays are allgathered across processes (DCN), per-host numpy
    label arrays are concatenated on axis 0. Single-process: np.asarray."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True)),
        tree)
