"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel (main.py:532, PL
`accelerator="ddp"`). The TPU-native equivalent: a 1-D `data` mesh over all
chips; the batch is sharded on axis 0, parameters are replicated, and the
SPMD partitioner inserts the gradient psum over ICI — no NCCL/process-group
plumbing. A second `model` axis is reserved for tensor-parallel extensions
(unused at this model scale, per SURVEY.md §2.4).

Multi-host (DCN): call `distributed_init()` (or pass --multihost to main.py)
before make_mesh(); the mesh then spans all global devices. Each process
loads its own 1/process_count slice of the global batch (data.DataLoader
shards deterministically by process_index) and `shard_batch` assembles the
global jax.Array from the process-local shards via
jax.make_array_from_process_local_data. The global batch size — and hence
the LR scale — is independent of the number of hosts.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     require_cluster: bool = False) -> None:
    """Idempotent jax.distributed.initialize for multi-host (DCN) runs.

    With no arguments, JAX auto-detects the coordinator from the cluster
    environment (TPU pod metadata / SLURM / env vars) — the standard path on
    Cloud TPU pods. Replaces the reference's implicit torch.distributed
    process-group setup inside PyTorch Lightning DDP (main.py:532).

    Must run before any JAX call that initializes the XLA backend (so the
    idempotence guard is jax.distributed.is_initialized, NOT process_count,
    which would itself initialize the backend and break initialize()).
    """
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError as e:  # auto-detect found no cluster environment
        if (require_cluster or coordinator_address is not None
                or num_processes is not None or process_id is not None):
            # ANY explicit argument (or an explicit --multihost request)
            # means the caller expected a cluster — swallowing would leave
            # every host believing it is process 0 (same logdir, wrong
            # global batch/LR) instead of failing loudly
            raise
        print(f"distributed_init: staying single-process ({e})")


def is_main_process() -> bool:
    """True on the process that owns host-side artifacts (metrics, images).
    Equivalent of the reference's PL rank_zero_only guards (main.py:318,329)."""
    return jax.process_index() == 0


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model != 0:
            # silently idling len % n_model chips would contradict the
            # printed jax.device_count() for the whole run (--tp is
            # user-reachable); an explicit n_data may still subset devices
            raise ValueError(
                f"model-parallel degree {n_model} does not divide the "
                f"device count {len(devices)}; pick a divisor or pass "
                "n_data explicitly to subset devices"
            )
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"got {len(devices)}")
    if jax.process_count() > 1:
        # the devices list is process-major, so the (n_data, n_model)
        # reshape puts each model group on n_model CONSECUTIVE devices: a
        # model axis crossing a host boundary breaks shard_batch's
        # rows-per-process math (each process would need rows it does not
        # load). Require TP to fit within a host.
        per_host = len(devices) // jax.process_count()
        if n_model > per_host or per_host % n_model:
            raise ValueError(
                f"model-parallel degree {n_model} must fit within one "
                f"host's {per_host} devices under multi-host (the "
                "process-sharded data loader feeds each host distinct "
                "batch rows)")
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, force_global: bool = False,
                replicated_keys: Sequence[str] = ()):
    """Place a batch dict onto the mesh, sharded along axis 0.

    Single-process: a plain device_put with a NamedSharding. Multi-process:
    `batch` is this process's slice of the global batch (global_batch /
    process_count rows, produced by DataLoader's process sharding) and the
    global jax.Array is assembled across hosts with
    jax.make_array_from_process_local_data. `force_global` exercises the
    multi-process assembly path in single-process tests.

    `replicated_keys`: top-level batch keys whose arrays are NOT batch-major
    (a PRNG key, a conditioning template) — they replicate instead of being
    sharded/concatenated along 'data'. Without this, a multi-process run
    would silently concatenate a replicated-intent leaf process_count times
    into a bogus global array.
    """
    multiproc = jax.process_count() > 1 or force_global

    def put(x, replicate_leaf=False):
        spec = (P() if replicate_leaf or getattr(x, "ndim", 0) < 1
                else P("data"))
        sharding = NamedSharding(mesh, spec)
        if not multiproc:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        if spec == P():  # replicated: every process supplies the full value
            return jax.make_array_from_process_local_data(sharding, x, x.shape)
        nproc = jax.process_count()
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    if replicated_keys and isinstance(batch, dict):
        import functools

        return {
            k: jax.tree.map(
                functools.partial(put, replicate_leaf=k in replicated_keys), v)
            for k, v in batch.items()
        }
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
