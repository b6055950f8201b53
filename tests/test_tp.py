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
