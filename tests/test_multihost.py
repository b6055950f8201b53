"""Multi-host (DCN) plumbing, exercised single-process.

The real multi-process path needs a TPU pod; here we verify the pieces that
can diverge: the global-array assembly in shard_batch (forced through
jax.make_array_from_process_local_data) and the deterministic per-process
slicing in DataLoader (the DistributedSampler equivalent, reference
main.py:532 DDP semantics).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsml_thesis_tpu.data.datasets import DataLoader, SyntheticDataset
from dsml_thesis_tpu.parallel import distributed_init, is_main_process, make_mesh
from dsml_thesis_tpu.parallel.mesh import shard_batch


def test_shard_batch_global_assembly_matches_device_put():
    mesh = make_mesh()
    batch = {
        "image": np.random.RandomState(0).randn(8, 4, 4, 3).astype(np.float32),
        "label": np.arange(8, dtype=np.int32),
        "scalar": np.float32(3.5),
    }
    a = shard_batch(mesh, batch)
    b = shard_batch(mesh, batch, force_global=True)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding, k
    # sharded along the data axis, scalar replicated
    assert b["image"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert not b["scalar"].sharding.spec


def test_dataloader_process_shards_are_disjoint_and_complete():
    spec = {"x": ((2,), "float32")}
    ds = SyntheticDataset(spec=spec, length=16, seed=0)
    full = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=1,
                      process_index=0, process_count=1)
    p0 = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=1,
                    process_index=0, process_count=2)
    p1 = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=1,
                    process_index=1, process_count=2)
    gb = list(full._batches())
    b0 = list(p0._batches())
    b1 = list(p1._batches())
    assert len(gb) == len(b0) == len(b1) == 2
    for g, a, b in zip(gb, b0, b1):
        assert len(a) == len(b) == 4
        np.testing.assert_array_equal(np.concatenate([a, b]), g)
        assert not set(a) & set(b)


def test_dataloader_drops_ragged_tail_multiprocess():
    spec = {"x": ((2,), "float32")}
    ds = SyntheticDataset(spec=spec, length=10, seed=0)
    p0 = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False,
                    num_workers=1, process_index=0, process_count=2)
    batches = list(p0._batches())
    assert len(batches) == 1  # the 2-item tail cannot shard over 2 processes
    assert len(p0) == 1  # __len__ agrees with iteration
    single = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False,
                        num_workers=1, process_index=0, process_count=1)
    assert len(list(single._batches())) == len(single) == 2  # tail kept


def test_dataloader_defaults_process_index_zero():
    spec = {"x": ((2,), "float32")}
    ds = SyntheticDataset(spec=spec, length=8, seed=0)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1,
                    process_count=2)  # index omitted -> 0
    assert dl.process_index == 0
    assert len(next(iter(dl._batches()))) == 2


def test_dataloader_early_break_releases_producer():
    """Breaking out of iteration mid-epoch (validate(max_batches=1)) must not
    leave the producer thread blocked on the bounded queue forever."""
    import threading
    import time

    spec = {"x": ((2,), "float32")}
    ds = SyntheticDataset(spec=spec, length=64, seed=0)
    before = threading.active_count()
    for _ in range(5):
        for i, _b in enumerate(DataLoader(ds, batch_size=4, shuffle=False,
                                          num_workers=1, prefetch=1)):
            if i == 0:
                break
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1  # producers exited


def test_distributed_init_single_process_noop():
    """In a FRESH process (backend not yet initialized), the auto-detect path
    stays single-process without raising; a late call (backend already up, as
    in this pytest process) raises RuntimeError instead of silently degrading
    to N independent replicas on a pod."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from dsml_thesis_tpu.parallel import distributed_init;"
         "distributed_init();"
         "print('pc', jax.process_count())"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "pc 1" in out.stdout, out.stderr

    with pytest.raises(RuntimeError):
        distributed_init()  # backend already initialized in this process
    assert is_main_process()


def test_dataloader_surfaces_worker_exceptions():
    """A dataset error must re-raise in the consumer, not hang q.get()."""
    class Boom(SyntheticDataset):
        def __getitem__(self, i):
            if i == 3:
                raise ValueError("corrupt example")
            return super().__getitem__(i)

    ds = Boom(spec={"x": ((2,), "float32")}, length=8, seed=0)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="corrupt example"):
        for _ in dl:
            pass


def test_dataset_item_rng_reproducible_and_epoch_varying():
    """Per-item draws are deterministic under threading and vary by epoch."""
    from dsml_thesis_tpu.data.datasets import _item_rng

    a = _item_rng(7, 0, 5).randint(1000)
    b = _item_rng(7, 0, 5).randint(1000)
    c = _item_rng(7, 1, 5).randint(1000)
    assert a == b
    assert a != c or _item_rng(7, 1, 6).randint(1000) != a


def test_mesh_and_init_guards(monkeypatch):
    """Explicit-intent failures raise instead of degrading silently:
    device overcommit, TP crossing a host boundary, distributed_init with
    any explicit argument (or require_cluster) finding no cluster."""
    import jax

    from dsml_thesis_tpu.parallel import distributed_init, make_mesh

    with pytest.raises(ValueError, match="needs 12 devices"):
        make_mesh(n_data=4, n_model=3)

    from dsml_thesis_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="fit within one host"):
        # 8 virtual devices / 2 "hosts" = 4 per host; TP 8 would cross
        make_mesh(n_model=8)
    monkeypatch.undo()

    # backend already initialized -> RuntimeError (locked above); explicit
    # args must NOT be swallowed into single-process mode
    with pytest.raises(RuntimeError):
        distributed_init(process_id=3)
    with pytest.raises(RuntimeError):
        distributed_init(require_cluster=True)


def test_shard_batch_replicated_keys():
    """replicated_keys leaves replicate (P()) instead of sharding along
    'data' — e.g. a shape-(2,) PRNG key must not be row-split."""
    import jax
    import jax.numpy as jnp

    from dsml_thesis_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    batch = {"image": np.zeros((8, 4, 4, 3), np.float32),
             "key": np.asarray(jax.random.PRNGKey(0))}
    out = shard_batch(mesh, batch, replicated_keys=("key",))
    assert "data" in str(out["image"].sharding.spec)
    assert out["key"].sharding.spec == jax.sharding.PartitionSpec()
    np.testing.assert_array_equal(np.asarray(out["key"]),
                                  np.asarray(jax.random.PRNGKey(0)))
