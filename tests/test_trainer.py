"""Trainer harness end-to-end on synthetic data (tiny model, 8-dev CPU mesh)."""
import json
import os

import numpy as np
import pytest
import yaml

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
        "batch_size": batch, "num_workers": 2,
        "train": spec_node, "validation": spec_node,
    }}
    cfg["model"]["base_learning_rate"] = 1e-5
    return cfg


def test_trainer_fit_val_checkpoint(tmp_path):
    from dsml_thesis_tpu.training.trainer import Trainer

    # fix spec lists -> tuples for SyntheticDataset
    cfg = _config()
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=3)
    state = trainer.fit(epochs=2, log_every=1, val_max_batches=1)
    assert int(state.step) == 3  # max_steps honored mid-epoch

    # metrics written
    lines = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(l["split"] == "train" for l in lines)
    assert any("val_loss_ema" in l for l in lines if l["split"] == "val")

    # LR scaling: accumulate(1) * global batch 8 * base 1e-5 — the reference's
    # effective-batch rule (accum x n_gpu x per-gpu-bs), chip-count invariant
    # since batch_size here is the global batch
    np.testing.assert_allclose(trainer.lr, 8 * 1e-5, rtol=1e-6)

    # checkpoint round-trip
    assert os.path.isdir(tmp_path / "run" / "checkpoints" / "last")
    before = np.asarray(
        np.ravel(np.asarray(
            list(state.params["unet"].values())[0]["kernel"]
            if "kernel" in list(state.params["unet"].values())[0]
            else 0
        ))
    ) if False else None  # structural restore check below
    restored = trainer.restore_checkpoint("last")
    assert int(restored.step) == 3


def test_resume_roundtrips_opt_and_ema_state(tmp_path):
    """Mid-run resume restores params, AdamW moments, and EMA shadows exactly,
    and training continues from the restored step (VERDICT r1 item 6)."""
    import jax

    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config(batch=8)
    t1 = Trainer(cfg, str(tmp_path / "a"), seed=0, max_steps=2)
    s2 = t1.fit(epochs=1, log_every=1, val_max_batches=1)
    t1.save_checkpoint("mid")

    # fresh trainer in a new logdir restores the checkpoint bit-for-bit
    t2 = Trainer(cfg, str(tmp_path / "a"), seed=99, max_steps=4)
    first = next(iter(t2.train_data))
    t2.init_state(first)
    restored = t2.restore_checkpoint("mid")

    ref = jax.device_get(s2)
    got = jax.device_get(restored)
    assert int(got.step) == int(ref.step) == 2
    for name, a, b in (
        ("params", ref.params, got.params),
        ("ema", ref.ema_params, got.ema_params),
        ("opt", ref.opt_state, got.opt_state),
    ):
        la = jax.tree.leaves(a)
        lb = jax.tree.leaves(b)
        assert len(la) == len(lb), name
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # EMA shadows cover only trainable groups (no frozen first stage copy)
    assert "first_stage" in got.params
    assert "first_stage" not in got.ema_params
    assert set(got.ema_params) <= set(got.params)

    # training continues from the restored state
    s4 = t2.fit(epochs=10, log_every=1, val_max_batches=1)
    assert int(s4.step) == 4


def test_topk_checkpoints_with_metric_names(tmp_path):
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config(batch=8)
    cfg["lightning"] = {"modelcheckpoint": {"params": {"save_top_k": 2}}}
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=1)
    trainer.fit(epochs=1, log_every=1, val_max_batches=1)
    # synthesize more val scores to exercise the top-k window
    trainer.save_topk_checkpoint(0.5, "val_loss_ema", 10)
    trainer.save_topk_checkpoint(0.1, "val_loss_ema", 20)
    trainer.save_topk_checkpoint(0.3, "val_loss_ema", 30)
    names = sorted(os.listdir(tmp_path / "run" / "checkpoints"))
    kept = [n for n in names if n.startswith("step=")]
    assert len(kept) == 2
    assert any("val_loss_ema=0.10000" in n for n in kept)
    assert any("val_loss_ema=0.30000" in n for n in kept)


def test_restore_legacy_full_ema_checkpoint(tmp_path):
    """Round-1 checkpoints shadowed the FULL tree in ema_params; restoring
    them falls back to the legacy template and strips to trainable groups."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config(batch=8)
    t = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=1)
    first = next(iter(t.train_data))
    t.init_state(first)

    legacy = jax.device_get(t._state).replace(
        ema_params=jax.tree.map(jnp.copy, jax.device_get(t._state.params))
    )
    path = tmp_path / "run" / "checkpoints" / "legacy"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path.resolve()), legacy, force=True)
    ckptr.wait_until_finished()

    restored = t.restore_checkpoint("legacy")
    assert "first_stage" not in restored.ema_params
    assert set(restored.ema_params) <= set(restored.params)


def test_lightning_trainer_yaml_keys(tmp_path):
    """A verbatim reference-style YAML fully specifies the run: max_steps,
    check_val_every_n_epoch, limit_val_batches come from lightning.trainer
    (reference main.py:671-706 Trainer.from_argparse_args + config)."""
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    cfg["lightning"] = {"trainer": {
        "max_steps": 3, "check_val_every_n_epoch": 2, "limit_val_batches": 1,
    }}
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0)  # no CLI max_steps
    assert trainer.max_steps == 3
    state = trainer.fit(epochs=2, log_every=1)
    assert int(state.step) == 3  # YAML max_steps honored

    lines = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    # epoch 0 skipped (check_val_every_n_epoch=2): exactly one val record,
    # after the second epoch
    vals = [l for l in lines if l["split"] == "val"]
    assert len(vals) == 1

    # CLI max_steps still wins over YAML when given
    t2 = Trainer(cfg, str(tmp_path / "run2"), seed=0, max_steps=1)
    assert t2.max_steps == 1


def test_ragged_tail_eval_exact(tmp_path):
    """The final ragged val batch is padded + masked, not dropped: metrics
    cover the full split and are invariant to the padding content
    (reference full-set validation, ddpm.py:356-363)."""
    import jax
    import jax.numpy as jnp

    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    # 12 samples at global batch 8 -> one full batch + a 4-sample tail
    cfg["data"]["params"]["validation"]["params"]["length"] = 12
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=1)
    state = trainer.fit(epochs=1, log_every=1)

    val = trainer.validate(jax.random.PRNGKey(7))
    assert np.isfinite(val["val_loss"])

    # invariance: zero out the padding rows instead of edge-repeating them —
    # a correct mask makes the metric identical
    batches = list(trainer.val_data)
    assert len(batches) == 2 and batches[1]["image"].shape[0] == 4
    from dsml_thesis_tpu.parallel import shard_batch

    def eval_padded(pad_value):
        jb = {k: np.asarray(v) for k, v in batches[1].items()
              if isinstance(v, np.ndarray)}
        jb = {k: np.concatenate(
            [v, np.full((4,) + v.shape[1:], pad_value, v.dtype)], axis=0)
            for k, v in jb.items()}
        jb["_sample_weights"] = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
        sb = shard_batch(trainer.mesh, jb)
        m = trainer._eval_step(
            state, sb, jax.random.fold_in(jax.random.PRNGKey(7), 1))
        return float(m["val_loss"])

    np.testing.assert_allclose(eval_padded(0), eval_padded(1), rtol=1e-5)


def test_p_losses_sample_weights_match_subset():
    """Weighted p_losses over [real | padding] rows equals unweighted
    p_losses over the real rows alone."""
    import jax.numpy as jnp

    from dsml_thesis_tpu.diffusion import make_schedule
    from dsml_thesis_tpu.diffusion.gaussian import p_losses

    sched = make_schedule(timesteps=10, linear_start=0.0015, linear_end=0.02)
    rs = np.random.RandomState(0)
    eps = jnp.asarray(rs.randn(6, 4, 4, 2).astype(np.float32))
    x0 = jnp.asarray(rs.randn(6, 4, 4, 2).astype(np.float32))
    noise = jnp.asarray(rs.randn(6, 4, 4, 2).astype(np.float32))
    t = jnp.asarray(rs.randint(0, 10, 6))

    w = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    loss_w, aux_w = p_losses(sched, eps, x0, noise, t,
                             original_elbo_weight=0.1, sample_weights=w)
    loss_s, aux_s = p_losses(sched, eps[:4], x0[:4], noise[:4], t[:4],
                             original_elbo_weight=0.1)
    np.testing.assert_allclose(float(loss_w), float(loss_s), rtol=1e-6)
    np.testing.assert_allclose(float(aux_w["loss_simple"]),
                               float(aux_s["loss_simple"]), rtol=1e-6)


def test_save_topk_mode_max():
    """mode='max' keeps the HIGHEST scores (a future PSNR monitor) and the
    disk-rebuild sort follows the mode (VERDICT r2: _rebuild_topk_from_disk
    implicitly assumed lower-is-better)."""
    from dsml_thesis_tpu.training.checkpointing import save_topk

    saved, topk = [], []
    for s in (1.0, 3.0, 2.0, 5.0, 0.5):
        save_topk(topk, 2, s, f"step={len(saved):08d}-psnr={s:.5f}",
                  saved.append, "/nonexistent", mode="max")
    assert [s for s, _ in topk] == [5.0, 3.0]
    # 0.5 was never serialized (cannot enter top-2)
    assert not any("0.50000" in n for n in saved)

    # min mode unchanged
    topk2, saved2 = [], []
    for s in (1.0, 3.0, 2.0, 0.5):
        save_topk(topk2, 2, s, f"n{s}", saved2.append, "/nonexistent")
    assert [s for s, _ in topk2] == [0.5, 1.0]


def test_max_steps_counts_optimizer_steps_under_accum(tmp_path):
    """Lightning's max_steps counts OPTIMIZER steps (global_step): with
    accumulate_grad_batches=2, max_steps=2 must run 4 micro-batches (the
    micro-step counter divides down), not stop after 2."""
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    cfg["lightning"] = {"trainer": {
        "max_steps": 2, "accumulate_grad_batches": 2, "limit_val_batches": 0,
    }}
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0)
    state = trainer.fit(epochs=10, log_every=100)
    assert int(state.step) == 4  # 2 optimizer steps x accum 2 micro-batches


def test_limit_test_batches_independent_of_val_limit(tmp_path):
    """limit_val_batches must not truncate the TEST split (Lightning has a
    separate limit_test_batches, default = the full split), and 0/0.0
    means 'disable the split', not 'one batch'."""
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    cfg["data"]["params"]["test"] = cfg["data"]["params"]["validation"]
    cfg["lightning"] = {"trainer": {"limit_val_batches": 1}}
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=1)
    trainer.fit(epochs=1, log_every=100, val_max_batches=0)

    # val resolves to the YAML limit; test resolves to the FULL split
    assert trainer._resolve_val_batches(None, trainer.test_data) == 1
    seen = {}
    orig = trainer.validate

    def spy(rng, max_batches=None, data=None, limit=None):
        seen["limit"] = limit
        return orig(rng, max_batches=max_batches, data=data, limit=limit)

    trainer.validate = spy
    trainer.test()
    assert seen["limit"] == 1.0  # full split, not the val limit
    assert trainer._resolve_val_batches(
        None, trainer.test_data, lim=seen["limit"]) == len(trainer.test_data)

    # 0 and 0.0 both disable instead of running one noisy batch
    assert trainer._resolve_val_batches(None, trainer.val_data, lim=0) == 0
    assert trainer._resolve_val_batches(None, trainer.val_data, lim=0.0) == 0


def test_topk_names_sanitized_and_negative_scores_parse(tmp_path):
    """'/'-bearing monitors embed flat in checkpoint dir names, and the
    resume rebuild parses negative scores."""
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=1)
    trainer.fit(epochs=1, log_every=100, val_max_batches=0)
    trainer.save_topk_checkpoint(-0.5, "val/loss_simple_ema", step=7)
    trainer.wait_for_checkpoints()
    names = os.listdir(tmp_path / "run" / "checkpoints")
    assert "step=00000007-val_loss_simple_ema=-0.50000" in names
    # rebuild sees the negative-score checkpoint
    trainer._topk = []
    trainer._rebuild_topk_from_disk()
    assert any(s == -0.5 for s, _ in trainer._topk)


def test_resume_continues_epoch_count(tmp_path):
    """A restored run re-enters at the epoch its step count implies instead
    of training max_epochs ADDITIONAL epochs."""
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config(batch=8)  # len 16 / bs 8 = 2 steps per epoch
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0)
    trainer.fit(epochs=2, log_every=100, val_max_batches=0)  # 4 steps
    trainer.save_checkpoint("last", wait=True)

    t2 = Trainer(cfg, str(tmp_path / "run"), seed=0)
    t2.init_state(next(iter(t2.train_data)))
    t2.restore_checkpoint("last")
    assert int(t2._state.step) == 4
    state = t2.fit(epochs=3, log_every=100, val_max_batches=0)
    # epochs 0-1 already done -> only epoch 2 runs: 2 more steps, not 6
    assert int(state.step) == 6


def test_step_profiler_window_is_exact(monkeypatch, tmp_path):
    """StepProfiler under the trainer's call pattern (maybe_start(k) before
    dispatching step k, maybe_stop(k) after) captures EXACTLY num_steps
    dispatched steps, and a run resumed past start_step still profiles."""
    import jax

    from dsml_thesis_tpu.training.profiling import StepProfiler

    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append("start"))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append("stop"))

    def drive(sp, first_step, n_iters):
        traced, step = [], first_step
        for _ in range(n_iters):
            sp.maybe_start(step + 1)
            if sp._active:
                traced.append(step + 1)
            step += 1
            sp.maybe_stop(step)
        return traced

    sp = StepProfiler(str(tmp_path), start_step=3, num_steps=5)
    assert drive(sp, 0, 20) == [3, 4, 5, 6, 7]
    assert calls == ["start", "stop"]
    # once closed, it never re-opens
    assert not sp._active and sp._done

    calls.clear()
    sp2 = StepProfiler(str(tmp_path), start_step=50, num_steps=4)
    assert drive(sp2, 200, 10) == [201, 202, 203, 204]  # resumed past window
    assert calls == ["start", "stop"]


def test_save_topk_lightning_sentinels():
    """save_top_k=0 disables monitored checkpointing; save_top_k=-1 keeps
    every checkpoint (both Lightning-legal; both used to IndexError)."""
    from dsml_thesis_tpu.training.checkpointing import save_topk

    saved, topk = [], []
    for s in (1.0, 3.0):
        save_topk(topk, 0, s, f"n{s}", saved.append, "/nonexistent")
    assert saved == [] and topk == []

    saved, topk = [], []
    for s in (1.0, 3.0, 2.0, 0.5):
        save_topk(topk, -1, s, f"n{s}", saved.append, "/nonexistent")
    assert len(saved) == 4  # everything kept
    assert [s for s, _ in topk] == [0.5, 1.0, 2.0, 3.0]


def test_max_steps_without_max_epochs_spans_epochs(tmp_path):
    """A run configured ONLY with max_steps must train to the step limit
    across as many epochs as needed (Lightning), not stop after one epoch;
    max_epochs=0 trains nothing."""
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config(batch=8)  # 2 steps/epoch
    cfg["lightning"] = {"trainer": {"max_steps": 5, "limit_val_batches": 0}}
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0)
    state = trainer.fit(log_every=100)  # epochs unset anywhere
    assert int(state.step) == 5  # 2.5 epochs' worth, not 2

    cfg2 = _config(batch=8)
    cfg2["lightning"] = {"trainer": {"max_epochs": 0}}
    t2 = Trainer(cfg2, str(tmp_path / "run2"), seed=0)
    assert t2.fit(log_every=100) is None  # no state: nothing trained


def test_resume_of_completed_run_exits_immediately(tmp_path):
    """Resuming a run whose step count already satisfies max_epochs must
    exit without retraining the final epoch past the schedule."""
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config(batch=8)  # 2 steps/epoch
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0)
    trainer.fit(epochs=2, log_every=100, val_max_batches=0)  # 4 steps
    trainer.save_checkpoint("last", wait=True)

    t2 = Trainer(cfg, str(tmp_path / "run"), seed=0)
    t2.init_state(next(iter(t2.train_data)))
    t2.restore_checkpoint("last")
    state = t2.fit(epochs=2, log_every=100, val_max_batches=0)
    assert int(state.step) == 4  # unchanged: empty epoch range


def test_resume_advances_loader_shuffle_epoch(tmp_path):
    """The resumed loader must draw NEW shuffle permutations, not replay
    epochs 0..N-1's orders (continuous-run fidelity)."""
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config(batch=8)
    trainer = Trainer(cfg, str(tmp_path / "run"), seed=0)
    trainer.fit(epochs=2, log_every=100, val_max_batches=0)
    trainer.save_checkpoint("last", wait=True)

    t2 = Trainer(cfg, str(tmp_path / "run"), seed=0)
    t2.init_state(next(iter(t2.train_data)))
    t2.restore_checkpoint("last")
    t2.fit(epochs=3, log_every=100, val_max_batches=0)
    # continuous run: epoch counter ends at 3 (+1 init peek); the old
    # behavior left it at the init peek's 1 + 1 = 2
    assert t2.train_data.epoch >= 3


def test_logger_backend_csv_and_wandb_fallback(tmp_path):
    """lightning.logger selects the backend (reference main.py:552-576):
    TestTubeLogger -> csv next to metrics.jsonl; WandbLogger without wandb
    installed degrades to csv instead of crashing."""
    import csv

    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    cfg["lightning"] = {"logger": {
        "target": "pytorch_lightning.loggers.TestTubeLogger", "params": {}}}
    t = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=2)
    t.fit(epochs=1, log_every=1)
    csv_path = tmp_path / "run" / "metrics.csv"
    assert csv_path.exists()
    rows = list(csv.reader(open(csv_path)))
    assert rows[0] == ["step", "split", "metric", "value"]
    assert any(r[1] == "train" for r in rows[1:])
    # jsonl spine still written
    assert (tmp_path / "run" / "metrics.jsonl").exists()

    cfg2 = _config()
    cfg2["lightning"] = {"logger": {
        "target": "pytorch_lightning.loggers.WandbLogger",
        "params": {"offline": True}}}
    # force the wandb-absent path regardless of the environment: a None
    # sys.modules entry makes `import wandb` raise ImportError
    import sys
    import unittest.mock

    with unittest.mock.patch.dict(sys.modules, {"wandb": None}):
        t2 = Trainer(cfg2, str(tmp_path / "run2"), seed=0, max_steps=1)
        assert type(t2._ext_logger).__name__ == "CsvBackend"

    # an unrecognized logger target degrades to csv instead of aborting the
    # run before step 0 (reference main.py instantiates arbitrary targets)
    cfg3 = _config()
    cfg3["lightning"] = {"logger": {
        "target": "pytorch_lightning.loggers.CometLogger", "params": {}}}
    t3 = Trainer(cfg3, str(tmp_path / "run3"), seed=0, max_steps=1)
    assert type(t3._ext_logger).__name__ == "CsvBackend"


def test_model_ckpt_path_warm_start(tmp_path):
    """Model-level `ckpt_path` (reference ddpm.py:104/186 init_from_ckpt,
    the tune-config warm-start surface): a new Trainer whose model params
    name a saved checkpoint must start from those weights, not random."""
    import jax

    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    t1 = Trainer(cfg, str(tmp_path / "run1"), seed=0, max_steps=2)
    t1.fit(epochs=1, log_every=1, val_max_batches=1)
    t1.save_checkpoint("warm", wait=True)
    ck = str(tmp_path / "run1" / "checkpoints" / "warm")

    cfg2 = _config()
    cfg2["model"]["params"]["ckpt_path"] = ck
    t2 = Trainer(cfg2, str(tmp_path / "run2"), seed=1, max_steps=1)
    t2.fit(epochs=1, log_every=1, val_max_batches=0)

    # after ONE step from the warm start vs TWO steps of run1: the unet
    # trees must be close (one small step apart), and nothing like a fresh
    # seed-1 random init (which differs at O(weight-scale))
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(t1._state.params["unet"])])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(t2._state.params["unet"])])
    assert np.max(np.abs(a - b)) < 5e-3  # a couple of 1e-5-lr steps apart

    # EMA shadows carry over too (reference init_from_ckpt restores the
    # LitEma buffers): t2's shadows must track t1's, not a fresh copy of
    # the seed-1 raw init
    ea = np.concatenate([np.asarray(x).ravel() for x in
                         jax.tree.leaves(t1._state.ema_params["unet"])])
    eb = np.concatenate([np.asarray(x).ravel() for x in
                         jax.tree.leaves(t2._state.ema_params["unet"])])
    assert np.max(np.abs(ea - eb)) < 5e-3

    cfg3 = _config()
    t3 = Trainer(cfg3, str(tmp_path / "run3"), seed=1, max_steps=1)
    t3.fit(epochs=1, log_every=1, val_max_batches=0)
    c = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(t3._state.params["unet"])])
    assert np.max(np.abs(c - b)) > 1e-2  # fresh init is far away


def test_model_ckpt_path_missing_file_fails_loudly(tmp_path):
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = _config()
    cfg["model"]["params"]["ckpt_path"] = str(tmp_path / "nope.ckpt")
    t = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=1)
    # the trainer refuses BEFORE any loader/backend import touches the
    # path, so this holds on torch-less hosts too
    with pytest.raises(FileNotFoundError, match="ckpt_path"):
        t.fit(epochs=1, log_every=1, val_max_batches=0)
