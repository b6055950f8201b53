"""Training-step tests: optimizer masking, EMA, LR schedules, 8-way DP mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import yaml

from dsml_thesis_tpu.config import build_model
from dsml_thesis_tpu.parallel import make_mesh, shard_batch, replicate
from dsml_thesis_tpu.training import (
    TrainState,
    build_lr_multiplier,
    create_train_state,
    ema_update,
    lambda_linear,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

from test_ldm import TINY_MEAD_CFG


def _tiny(batch_size=2):
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    batch = {
        "image": jnp.ones((batch_size, 16, 16, 3)) * 0.1,
        "masked_image": jnp.zeros((batch_size, 16, 16, 3)),
        "identity": jnp.zeros((batch_size, 16, 16, 3)),
        "class_label": jnp.zeros((batch_size,), jnp.int32),
        "audio": jnp.zeros((batch_size, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    return ldm, params, batch


def test_train_step_updates_only_trainable():
    ldm, params, batch = _tiny()
    tx = make_optimizer(ldm, params, base_lr=1e-3)
    state = create_train_state(ldm, params, tx)
    step = jax.jit(make_train_step(ldm, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["train/loss"]))
    # frozen first stage unchanged
    for old, new in zip(
        jax.tree.leaves(state.params["first_stage"]),
        jax.tree.leaves(new_state.params["first_stage"]),
    ):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    # unet changed
    diffs = [
        float(jnp.abs(o - n).max())
        for o, n in zip(
            jax.tree.leaves(state.params["unet"]),
            jax.tree.leaves(new_state.params["unet"]),
        )
    ]
    assert max(diffs) > 0


def test_ema_warmup_decay():
    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    out = ema_update(e, p, num_updates=1, decay=0.9999)
    # warmup: d = min(0.9999, 2/11)
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(out["w"]), 1 - d, rtol=1e-6)


def test_lambda_linear_schedule_matches_reference_formula():
    # reference config style: 1 cycle, warmup 100
    sched = lambda_linear([100], [0.1], [1.0], [0.01], [1000])
    # warmup point n=50: f = (1-0.01)/100*50 + 0.01
    np.testing.assert_allclose(float(sched(50)), (1 - 0.01) / 100 * 50 + 0.01, rtol=1e-5)
    # linear decay point n=500: f = 0.1 + 0.9*(1000-500)/1000
    np.testing.assert_allclose(float(sched(500)), 0.1 + 0.9 * 0.5, rtol=1e-5)


def test_build_lr_multiplier_from_config_node():
    node = {
        "target": "ldm.lr_scheduler.LambdaLinearScheduler",
        "params": {
            "warm_up_steps": [100], "cycle_lengths": [10000000000000],
            "f_start": [1e-6], "f_max": [1.0], "f_min": [1.0],
        },
    }
    sched = build_lr_multiplier(node)
    np.testing.assert_allclose(float(sched(0)), 1e-6, rtol=1e-4)
    np.testing.assert_allclose(float(sched(1000)), 1.0, rtol=1e-5)


def test_eval_step_reports_ema_monitor():
    ldm, params, batch = _tiny()
    tx = make_optimizer(ldm, params, base_lr=1e-3)
    state = create_train_state(ldm, params, tx)
    metrics = jax.jit(make_eval_step(ldm))(state, batch, jax.random.PRNGKey(0))
    assert "val_loss_ema" in metrics and "val_loss" in metrics
    # at init ema == params → identical losses
    np.testing.assert_allclose(
        float(metrics["val_loss"]), float(metrics["val_loss_ema"]), rtol=1e-6
    )


def test_data_parallel_8way_mesh_step():
    """Full DP train step over the virtual 8-device mesh; replicated params,
    sharded batch; result matches across devices."""
    assert len(jax.devices()) == 8, "conftest must force 8 virtual cpu devices"
    ldm, params, _ = _tiny(batch_size=8)
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    batch = {
        "image": jnp.arange(8 * 16 * 16 * 3, dtype=jnp.float32).reshape(8, 16, 16, 3)
        / 1e4,
        "masked_image": jnp.zeros((8, 16, 16, 3)),
        "identity": jnp.zeros((8, 16, 16, 3)),
        "class_label": jnp.arange(8, dtype=jnp.int32) % 8,
        "audio": jnp.zeros((8, 5, 32)),
    }
    tx = make_optimizer(ldm, params, base_lr=1e-3)
    state = create_train_state(ldm, params, tx)
    state = replicate(mesh, state)
    sbatch = shard_batch(mesh, batch)
    step = jax.jit(make_train_step(ldm, tx))
    new_state, metrics = step(state, sbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train/loss"]))
    # params stay replicated (no divergence across the mesh)
    w = jax.tree.leaves(new_state.params["unet"])[0]
    assert np.isfinite(np.asarray(w)).all()


def test_unet_dropout_active_in_training_loss():
    """A configured unet dropout must actually fire during training_loss
    (deterministic=False + a 'dropout' rng reaches the UNet): two different
    outer rngs give different losses even with IDENTICAL t/noise draws —
    and eval/sampling (apply_model default) stays deterministic."""
    import copy

    cfg = yaml.safe_load(TINY_MEAD_CFG)
    cfg = copy.deepcopy(cfg)
    cfg["model"]["params"]["unet_config"]["params"]["dropout"] = 0.5
    ldm = build_model(cfg["model"])
    batch = {
        "image": jnp.ones((2, 16, 16, 3)) * 0.1,
        "masked_image": jnp.zeros((2, 16, 16, 3)),
        "identity": jnp.zeros((2, 16, 16, 3)),
        "class_label": jnp.zeros((2,), jnp.int32),
        "audio": jnp.zeros((2, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    # EVERY residual/output conv is zero-init at random init (reference
    # zero_module), which makes the whole untrained UNet an identity chain
    # whose dropout sites all feed zero convs — architecturally inert until
    # trained. Randomize every zero kernel so the probe can see the masks.
    def wake(tree, key):
        for k, v in tree.items():
            if isinstance(v, dict):
                key = wake(v, key)
            elif k == "kernel" and float(jnp.abs(v).max()) == 0.0:
                key, sub = jax.random.split(key)
                tree[k] = jax.random.normal(sub, v.shape) * 0.1
        return key

    wake(params["unet"], jax.random.PRNGKey(9))

    # isolate the dropout stream: same t/noise/cond keys, different k_drop.
    # training_loss splits rng into 5 keys with k_drop last — drive
    # apply_model directly so only the dropout key varies. Inputs must be
    # NON-constant: GroupNorm of a constant field is exactly zero at init
    # (beta=0), and dropout masks of zeros are invisible.
    cond = ldm.encode_conditioning(params, batch, training=False)
    t = jnp.array([3, 7], jnp.int32)
    x_t = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 3))

    e1 = ldm.apply_model(params, x_t, t, cond, deterministic=False,
                         rng=jax.random.PRNGKey(1))
    e2 = ldm.apply_model(params, x_t, t, cond, deterministic=False,
                         rng=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(e1) - np.asarray(e2)).max() > 1e-6, \
        "dropout rng had no effect — the mask is inert in training"

    # eval path (default deterministic=True) is rng-free and repeatable
    d1 = ldm.apply_model(params, x_t, t, cond)
    d2 = ldm.apply_model(params, x_t, t, cond)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_remat_modes_are_value_identical(monkeypatch):
    """DSML_REMAT full/dots/none is a memory/recompute trade only — the
    loss and gradients must match bitwise-insensitively across modes."""
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    cfg["model"]["params"]["unet_config"]["params"]["use_checkpoint"] = True
    outs = {}
    for mode in ("full", "dots", "none"):
        monkeypatch.setenv("DSML_REMAT", mode)
        ldm = build_model(cfg["model"])
        batch = {
            "image": jnp.ones((2, 16, 16, 3)) * 0.1,
            "masked_image": jnp.zeros((2, 16, 16, 3)),
            "identity": jnp.zeros((2, 16, 16, 3)),
            "class_label": jnp.zeros((2,), jnp.int32),
            "audio": jnp.zeros((2, 5, 32)),
        }
        params = ldm.init_params(jax.random.PRNGKey(0), batch)
        loss, grads = jax.value_and_grad(
            lambda p: ldm.training_loss(p, batch, jax.random.PRNGKey(1))[0]
        )(params)
        gnorm = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(g.astype(jnp.float32) ** 2), grads, 0.0)
        outs[mode] = (float(loss), float(gnorm))
    for mode in ("dots", "none"):
        np.testing.assert_allclose(outs[mode][0], outs["full"][0], rtol=1e-6)
        np.testing.assert_allclose(outs[mode][1], outs["full"][1], rtol=1e-5)


def test_opt_bf16_first_moment(monkeypatch):
    """DSML_OPT_BF16_M=1 stores Adam's mu in bf16 (nu stays fp32) and the
    step still updates trainable params."""
    monkeypatch.setenv("DSML_OPT_BF16_M", "1")
    ldm, params, batch = _tiny()
    tx = make_optimizer(ldm, params, base_lr=1e-3)
    state = create_train_state(ldm, params, tx)
    mus, nus = [], []

    def collect(node):
        if hasattr(node, "mu"):
            mus.extend(jax.tree_util.tree_leaves(node.mu))
            nus.extend(jax.tree_util.tree_leaves(node.nu))

    jax.tree_util.tree_map(
        collect, state.opt_state,
        is_leaf=lambda n: hasattr(n, "mu"))
    assert mus and all(m.dtype == jnp.bfloat16 for m in mus)
    assert all(n.dtype == jnp.float32 for n in nus)
    step = make_train_step(ldm, tx)
    new_state, aux = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["train/loss"]))
