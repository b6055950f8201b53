"""Multi-host (DCN) plumbing, exercised single-process.

The real multi-process path needs a TPU pod; here we verify the pieces that
can diverge: the global-array assembly in shard_batch (forced through
jax.make_array_from_process_local_data) and the deterministic per-process
slicing in DataLoader (the DistributedSampler equivalent, reference
main.py:532 DDP semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np

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
    single = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False,
                        num_workers=1, process_index=0, process_count=1)
    assert len(list(single._batches())) == 2  # tail kept single-process


def test_distributed_init_single_process_noop():
    distributed_init()  # auto-detect path: stays single-process, no raise
    assert jax.process_count() == 1
    assert is_main_process()
