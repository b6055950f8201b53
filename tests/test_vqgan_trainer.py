"""VQGAN first-stage trainer end-to-end: fit + validation + monitored
checkpoints (reference VQModel.validation_step autoencoder.py:165-196 and the
val_rec_loss-embedded checkpoint names, main.py:588-599)."""
import json
import os

import numpy as np


def _config(batch=8):
    spec_node = {
        "target": "dsml_thesis_tpu.data.SyntheticDataset",
        "params": {"spec": {"image": [[16, 16, 3], "float32"]}, "length": 16},
    }
    return {
        "model": {
            "base_learning_rate": 1e-4,
            "target": "ldm.models.autoencoder.VQModel",
            "params": {
                "embed_dim": 3, "n_embed": 16,
                "ddconfig": {
                    "double_z": False, "z_channels": 3, "resolution": 16,
                    "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": [1, 2],
                    "num_res_blocks": 1, "attn_resolutions": [8],
                    "dropout": 0.0,
                },
                "lossconfig": {"params": {
                    "disc_start": 0, "disc_num_layers": 1, "disc_ndf": 32,
                }},
            },
        },
        "data": {"params": {"batch_size": batch, "num_workers": 2,
                            "train": spec_node, "validation": spec_node}},
        "lightning": {"modelcheckpoint": {"params": {"save_top_k": 1}}},
    }


def test_vqgan_trainer_fit_val_topk(tmp_path):
    from dsml_thesis_tpu.training.vqgan_trainer import VQGANTrainer

    t = VQGANTrainer(_config(), str(tmp_path / "run"), seed=0, max_steps=2)
    state = t.fit(epochs=1, log_every=1, image_every=1, val_max_batches=1)
    assert int(state.step) == 2

    lines = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(l["split"] == "train" and "train/total_loss" in l for l in lines)
    val = [l for l in lines if l["split"] == "val"]
    assert val and {"val/rec_loss", "val/aeloss", "val/quant_loss",
                    "val/disc_loss"} <= set(val[0])
    assert np.isfinite(val[0]["val/rec_loss"])

    ckpts = os.listdir(tmp_path / "run" / "checkpoints")
    assert "last" in ckpts
    named = [c for c in ckpts if c.startswith("step=")]
    assert len(named) == 1 and "val_rec_loss=" in named[0]

    # reconstruction grids written
    imgs = os.listdir(tmp_path / "run" / "images")
    assert any(f.startswith("recon_step") and f.endswith(".npy") for f in imgs)


def test_vqgan_trainer_fsdp_step_matches_dp(tmp_path, monkeypatch):
    """--fsdp on the first-stage trainers is a pure memory-layout change:
    same losses as replicated DP, with params actually placed on `data`."""
    import jax

    from dsml_thesis_tpu.training.vqgan_trainer import VQGANTrainer

    monkeypatch.setenv("DSML_FSDP_MIN_ELEMS", "128")
    results = {}
    for name, fsdp in (("dp", False), ("fsdp", True)):
        t = VQGANTrainer(_config(), str(tmp_path / name), seed=0,
                         max_steps=1, fsdp=fsdp)
        state = t.fit(epochs=1, log_every=1)
        leaves = jax.tree_util.tree_leaves(state.ae_params)
        n_sharded = sum(1 for x in leaves if "data" in str(x.sharding.spec))
        assert (n_sharded > 0) == fsdp
        lines = [json.loads(l) for l in
                 open(tmp_path / name / "metrics.jsonl")]
        results[name] = [l for l in lines if l["split"] == "train"][0]
    np.testing.assert_allclose(results["fsdp"]["train/total_loss"],
                               results["dp"]["train/total_loss"],
                               rtol=1e-5, atol=1e-6)


def test_vqgan_trainer_resume_roundtrip(tmp_path):
    """The shared main.py resume interface works for VQGAN runs:
    init_state(first_batch_dict) + restore_checkpoint('last')."""
    import jax

    from dsml_thesis_tpu.training.vqgan_trainer import VQGANTrainer

    t1 = VQGANTrainer(_config(), str(tmp_path / "run"), seed=0, max_steps=2)
    s2 = t1.fit(epochs=1, log_every=1, val_max_batches=1)

    t2 = VQGANTrainer(_config(), str(tmp_path / "run"), seed=9, max_steps=4)
    first = next(iter(t2.train_data))
    t2.init_state(first)  # batch dict, like main.py's resume path
    restored = t2.restore_checkpoint("last")
    ref, got = jax.device_get(s2), jax.device_get(restored)
    assert int(got.step) == int(ref.step) == 2
    la, lb = jax.tree.leaves(ref.ae_params), jax.tree.leaves(got.ae_params)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
