"""Tensor parallelism (parallel/tp.py): Megatron-style attention sharding
over the mesh `model` axis. Beyond the reference (DDP-only, main.py:532) —
TP on a dp x tp mesh must produce the same numbers as pure DP.
"""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from test_ldm import TINY_MEAD_CFG


def _config(batch=8):
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    spec_node = {
        "target": "dsml_thesis_tpu.data.SyntheticDataset",
        "params": {
            "spec": {
                "image": [[16, 16, 3], "float32"],
                "masked_image": [[16, 16, 3], "float32"],
                "identity": [[16, 16, 3], "float32"],
                "class_label": [[], "int32"],
                "audio": [[5, 32], "float32"],
            },
            "length": 16,
        },
    }
    cfg["data"] = {"params": {
        "batch_size": batch, "num_workers": 1,
        "train": spec_node, "validation": spec_node,
    }}
    cfg["model"]["base_learning_rate"] = 1e-5
    return cfg


def test_leaf_spec_rules():
    from dsml_thesis_tpu.parallel.tp import TP_RULES, leaf_spec
    from jax.tree_util import tree_map_with_path

    tree = {"unet": {"mid_attn": {"block_0": {"attn1": {
        "to_q": {"kernel": np.zeros((8, 16))},
        "to_out": {"kernel": np.zeros((16, 8)), "bias": np.zeros((8,))},
    }}}, "conv_in": {"kernel": np.zeros((3, 3, 3, 8))}}}
    specs = tree_map_with_path(lambda p, x: leaf_spec(p), tree)
    a = specs["unet"]["mid_attn"]["block_0"]["attn1"]
    assert a["to_q"]["kernel"] == P(None, "model")
    assert a["to_out"]["kernel"] == P("model", None)
    assert a["to_out"]["bias"] == P()
    assert specs["unet"]["conv_in"]["kernel"] == P()
    assert len(TP_RULES) == 2


def test_shard_state_places_attention_on_model_axis():
    from dsml_thesis_tpu.parallel import make_mesh
    from dsml_thesis_tpu.parallel.tp import shard_state

    mesh = make_mesh(n_model=2)
    tree = {"attn1": {"to_q": {"kernel": jnp.zeros((8, 16))},
                      "to_out": {"kernel": jnp.zeros((16, 8))}},
            "other": jnp.zeros((4, 4)),
            # head-count not divisible by model axis -> falls back replicated
            "attn2": {"to_q": {"kernel": jnp.zeros((8, 15))}}}
    out = shard_state(mesh, tree)
    assert out["attn1"]["to_q"]["kernel"].sharding.spec == P(None, "model")
    assert out["attn1"]["to_out"]["kernel"].sharding.spec == P("model", None)
    assert out["other"].sharding.spec == P()
    assert out["attn2"]["to_q"]["kernel"].sharding.spec == P()


def test_spec_fits_head_boundary():
    """m | H*D is not enough: with a num_heads/dim_head hint the TP rule must
    refuse a split that lands mid-head (H=3, D=8, m=2: 24 % 2 == 0 but a
    shard would own head0 + half of head1)."""
    from dsml_thesis_tpu.parallel import make_mesh
    from dsml_thesis_tpu.parallel.tp import shard_state

    mesh = make_mesh(n_model=2)
    tree = {"attn1": {"to_q": {"kernel": jnp.zeros((8, 24))}}}
    # no hint: packed-dim check only (legacy behavior) -> sharded
    out = shard_state(mesh, tree)
    assert out["attn1"]["to_q"]["kernel"].sharding.spec == P(None, "model")
    # H=3 heads (num_heads hint): not divisible by m=2 -> replicated
    out = shard_state(mesh, tree, num_heads=3)
    assert out["attn1"]["to_q"]["kernel"].sharding.spec == P()
    # dim_head hint: H = 24/8 = 3, same refusal
    out = shard_state(mesh, tree, dim_head=8)
    assert out["attn1"]["to_q"]["kernel"].sharding.spec == P()
    # H=4 heads via dim_head=6 divides m=2 -> sharded
    out = shard_state(mesh, tree, dim_head=6)
    assert out["attn1"]["to_q"]["kernel"].sharding.spec == P(None, "model")


def test_make_mesh_rejects_non_divisor_tp():
    """--tp that doesn't divide the device count must fail loudly instead of
    silently idling chips (mesh.py make_mesh)."""
    from dsml_thesis_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(n_model=3)  # 8 virtual devices
    # explicit n_data still allows deliberate subsetting
    mesh = make_mesh(n_data=2, n_model=3)
    assert mesh.shape == {"data": 2, "model": 3}


def test_tp_trainer_scopes_attention_mesh(tmp_path):
    """Trainer on a multi-device mesh must scope its flash shard_map routing
    to its own traces (ops.attention.attention_mesh), not clobber the
    process env or other models' dispatch."""
    import os

    from dsml_thesis_tpu.training.trainer import Trainer

    before = os.environ.get("DSML_FLASH_ATTN")
    t = Trainer(_config(), str(tmp_path), seed=0, max_steps=1, tp=2)
    assert os.environ.get("DSML_FLASH_ATTN") == before

    # the mesh scope is active exactly while the trainer's programs trace
    from dsml_thesis_tpu.ops import attention

    seen = []

    def probe(x):
        seen.append(attention._ATTN_MESH)
        return x + 1

    t._jit(probe)(jnp.zeros(()))
    assert seen == [t.mesh]
    assert attention._ATTN_MESH is None  # restored after the trace


def test_flash_attention_shard_map_matches_reference():
    """Under an attention_mesh scope the flash kernel runs per-shard via
    shard_map (batch over data, heads over model) — same numbers and same
    gradients as the reference jnp attention."""
    from dsml_thesis_tpu.ops.attention import (
        attention_mesh,
        attention_reference,
        multi_head_attention,
    )
    from dsml_thesis_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=2, n_model=4)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    # B=2 divides data=2, H=8 divides model=4, N=256 clears the flash gate
    q = jax.random.normal(kq, (2, 8, 256, 32))
    k = jax.random.normal(kk, (2, 8, 256, 32))
    v = jax.random.normal(kv, (2, 8, 256, 32))

    def flash(q, k, v):
        return multi_head_attention(q, k, v, use_pallas=True, interpret=True)

    with attention_mesh(mesh):
        out = jax.jit(flash)(q, k, v)
        gq, gk, gv = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(flash(q, k, v) ** 2), argnums=(0, 1, 2)
        ))(q, k, v)
    ref = attention_reference(q, k, v)
    rq, rk, rv = jax.grad(
        lambda q, k, v: jnp.sum(attention_reference(q, k, v) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    for g, r in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)

    # indivisible heads AND batch: dispatch must fall back to the XLA path
    # (no shard_map island) and still be correct
    q3 = q[:1, :3]
    with attention_mesh(mesh):
        out3 = jax.jit(flash)(q3, k[:1, :3], v[:1, :3])
    np.testing.assert_allclose(
        np.asarray(out3),
        np.asarray(attention_reference(q3, k[:1, :3], v[:1, :3])),
        atol=2e-5, rtol=2e-5)


def test_fsdp_spec_axis_choice():
    from dsml_thesis_tpu.parallel import make_mesh
    from dsml_thesis_tpu.parallel.tp import fsdp_spec

    mesh = make_mesh(n_data=4, n_model=2)
    # large 2-D leaf: largest divisible axis shards over data
    assert fsdp_spec(np.zeros((512, 256)), mesh) == P("data", None)
    # conv kernel: spatial dims (3) not divisible, Cout wins over Cin
    assert fsdp_spec(np.zeros((3, 3, 128, 256)), mesh) == P(None, None, None, "data")
    # small leaf stays replicated (all-gather latency > bytes saved)
    assert fsdp_spec(np.zeros((64, 64)), mesh) == P()
    # TP base occupies an axis; FSDP fills the remaining one -> 2-D sharding
    assert fsdp_spec(np.zeros((512, 256)), mesh, base=P(None, "model")) \
        == P("data", "model")
    # no divisible free axis: base passes through untouched
    assert fsdp_spec(np.zeros((510, 255)), mesh, base=P(None, "model")) \
        == P(None, "model")


def test_fsdp_train_step_matches_dp(tmp_path, monkeypatch):
    """ZeRO-3 placement (params/moments/EMA sharded over `data`) must be a
    pure memory-layout change: same loss and updated params as replicated DP."""
    from dsml_thesis_tpu.parallel import shard_batch
    from dsml_thesis_tpu.training.trainer import Trainer

    # the tiny test model's leaves are all below the production threshold
    monkeypatch.setenv("DSML_FSDP_MIN_ELEMS", "128")
    cfg = _config()
    rng = jax.random.PRNGKey(7)

    results = {}
    for name, fsdp in (("dp", False), ("fsdp", True)):
        t = Trainer(cfg, str(tmp_path / name), seed=0, max_steps=1, fsdp=fsdp)
        batch = next(iter(t.train_data))
        state = t.init_state(batch)
        leaves = jax.tree_util.tree_leaves(state.params)
        n_sharded = sum(1 for x in leaves if "data" in str(x.sharding.spec))
        if fsdp:
            assert n_sharded > 0, "fsdp placed nothing on the data axis"
        else:
            assert n_sharded == 0
        sb = shard_batch(t.mesh, {k: np.asarray(v) for k, v in batch.items()})
        new_state, metrics = t._train_step(state, sb, rng)
        results[name] = (
            float(metrics["train/loss"]),
            np.asarray(new_state.params["unet"]["mid_attn"]["block_0"]
                       ["attn1"]["to_q"]["kernel"]),
        )

    np.testing.assert_allclose(results["fsdp"][0], results["dp"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results["fsdp"][1], results["dp"][1],
                               rtol=1e-4, atol=1e-6)


def test_tp_train_step_matches_dp(tmp_path):
    """One train step on a 4x2 dp x tp mesh == the same step on an 8-way DP
    mesh: loss and updated params agree (GSPMD inserts the to_out psum)."""
    from dsml_thesis_tpu.parallel import shard_batch
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    rng = jax.random.PRNGKey(7)

    results = {}
    for name, tp in (("dp", 1), ("tp", 2)):
        t = Trainer(cfg, str(tmp_path / name), seed=0, max_steps=1, tp=tp)
        batch = next(iter(t.train_data))
        state = t.init_state(batch)
        if tp > 1:
            q = state.params["unet"]["mid_attn"]["block_0"]["attn1"]["to_q"]["kernel"]
            assert q.sharding.spec == P(None, "model")
        sb = shard_batch(t.mesh, {k: np.asarray(v) for k, v in batch.items()})
        new_state, metrics = t._train_step(state, sb, rng)
        results[name] = (
            float(metrics["train/loss"]),
            np.asarray(new_state.params["unet"]["mid_attn"]["block_0"]
                       ["attn1"]["to_out"]["kernel"]),
            np.asarray(new_state.params["unet"]["mid_attn"]["block_0"]
                       ["attn1"]["to_q"]["kernel"]),
        )

    np.testing.assert_allclose(results["tp"][0], results["dp"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results["tp"][1], results["dp"][1],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(results["tp"][2], results["dp"][2],
                               rtol=1e-4, atol=1e-6)
