"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel (main.py:532, PL
`accelerator="ddp"`). The TPU-native equivalent: a 1-D `data` mesh over all
chips; the batch is sharded on axis 0, parameters are replicated, and the
SPMD partitioner inserts the gradient psum over ICI — no NCCL/process-group
plumbing. A second `model` axis is reserved for tensor-parallel extensions
(unused at this model scale, per SURVEY.md §2.4).

Multi-host: call jax.distributed.initialize() before make_mesh(); the mesh
spans all global devices and batches must be per-host shards of the global
batch (jax.make_array_from_process_local_data).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices)
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-local batch dict onto the mesh, sharded along axis 0."""
    sh = batch_sharding(mesh)

    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
