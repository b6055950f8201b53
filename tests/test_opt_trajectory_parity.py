"""N-step optimizer-trajectory lockstep vs the torch reference.

Locks the TRAINING-LOOP semantics (not the loss chain — that's
test_training_loss_parity.py): N optimizer steps of AdamW + LambdaLinear
warmup + LitEma on both sides from shared weights/data/noise. This is
exactly where decay-mask choices, scheduler step timing (LambdaLR steps
AFTER the optimizer, so optimizer step k uses lambda(k)), and the EMA
warmup decay min(0.9999,(1+n)/(10+n)) interplay would silently diverge.

What can be exact IS exact; what cannot be gets a calibrated bound:
  - per-step LR sequence: exact (rtol 1e-6) — locks LambdaLR timing.
  - step-0 gradients: <= 1e-4 leaf-relative — locks the backward chain.
  - unused embedding rows (zero grad inside a grad-bearing tensor): both
    sides must follow the pure decoupled-decay recurrence
    p_n = p_0 * prod(1 - lr_k*wd) EXACTLY — locks torch-AdamW's
    decay-on-everything default (ddpm.py:1372 passes ONE param group with
    torch defaults, weight_decay=0.01, no mask) and the lr threading.
  - LitEma vs ema_update over an identical scalar trajectory: exact —
    locks the warmup-decay formula min(0.9999,(1+n)/(10+n)).
  - 20-step end state: bounded, not exact. Adam normalizes fp-noise
    gradients to full +-lr steps (at t=1, m_hat/sqrt(v_hat) = sign(g) for
    ANY nonzero g), so ~1e-6-relative grad noise on near-zero-grad leaves
    amplifies chaotically. Measured on this config: max ~3.9e-3,
    mean ~1.6e-4 — bounds set at 2x that. A systematic semantic error
    (wrong decay target, shifted schedule, wrong EMA decay) trips the
    exact sub-checks above long before it hides inside these bounds.

Known, deliberate divergence: torch skips params whose .grad is None
(zero_grad(set_to_none=True)), so a tensor UNTOUCHED by the graph in a
step (e.g. the CFG uncond embedding under training=False) receives no
decay that step; optax applies decoupled decay to every trainable leaf
every step. Under real training the uncond embedding is exercised almost
every batch (p_uncond=0.2 per sample), making the difference vanishingly
small; decay-always is the sane functional continuation.

Reference surface:
  - face_reenactment/ldm/models/diffusion/ddpm.py:1363-1384
    (configure_optimizers: ONE AdamW group over model+cond params,
    LambdaLR with interval 'step')
  - face_reenactment/ldm/modules/ema.py:5-45 (LitEma, updated
    on_train_batch_end, ddpm.py:365-367)
  - face_reenactment/main.py:686-701 (learning_rate set externally)
"""
import copy

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import install_reference_path, reference_available
from test_training_loss_parity import TINY_MODEL_CFG

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference tree not mounted"),
]

N_STEPS = 20
BASE_LR = 1e-3
WD = 0.01  # torch.optim.AdamW default, reference passes none (ddpm.py:1372)
SCHED_CFG = {
    "target": "ldm.lr_scheduler.LambdaLinearScheduler",
    "params": {
        # warmup covers steps 0-4, the linear-decay branch steps 5-19: both
        # branches and the warmup->decay boundary are inside the window
        "warm_up_steps": [5], "cycle_lengths": [100],
        "f_start": [1e-6], "f_max": [1.0], "f_min": [0.1],
    },
}


def _diff_stats(a, b):
    d = np.concatenate([
        np.abs(np.asarray(x) - np.asarray(y)).ravel()
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))])
    return float(d.max()), float(d.mean())


def test_adamw_ema_scheduler_trajectory_lockstep():
    install_reference_path()
    from ldm.util import instantiate_from_config

    cfg_params = copy.deepcopy(TINY_MODEL_CFG["params"])
    cfg_params["scheduler_config"] = copy.deepcopy(SCHED_CFG)
    cfg = {"target": TINY_MODEL_CFG["target"], "params": cfg_params}

    torch.manual_seed(0)
    ref = instantiate_from_config(cfg)
    ref.eval()  # dropout is 0 everywhere in the tiny cfg; eval() pins it
    ref.device = torch.device("cpu")
    ref.learning_rate = BASE_LR  # main.py:686-701 sets this externally

    # the reference's OWN optimizer/scheduler construction
    opts, scheds = ref.configure_optimizers()
    opt, sched = opts[0], scheds[0]["scheduler"]
    assert isinstance(opt, torch.optim.AdamW)
    assert opt.param_groups[0]["weight_decay"] == WD

    # shared per-step data: fixed z (first stage frozen), varying t/noise
    rs = np.random.RandomState(7)
    x = rs.randn(2, 16, 16, 3).astype(np.float32) * 0.3
    labels = np.array([1, 4])
    ts = rs.randint(0, cfg_params["timesteps"], size=(N_STEPS, 2))
    noises = rs.randn(N_STEPS, 2, 3, 8, 8).astype(np.float32)

    with torch.no_grad():
        z_t = ref.get_first_stage_encoding(
            ref.encode_first_stage(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    z_np = z_t.numpy()

    # ---- ours: converted initial weights, the real train_step path -------
    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.convert import load_reference_ldm_checkpoint_from_sd
    from dsml_thesis_tpu.diffusion import p_losses, q_sample
    from dsml_thesis_tpu.training.train_state import (
        create_train_state, make_optimizer, make_train_step)

    ldm = build_model(cfg)
    params = load_reference_ldm_checkpoint_from_sd(ref.state_dict(), ldm, cfg)

    class _FixedNoiseLoss:
        """training_loss with t/noise delivered via the batch: the loss
        chain is already oracle-locked; this isolates the optimizer."""

        def training_loss(self, p, batch, rng):
            cond = ldm.encode_conditioning(
                p, {"class_label": batch["class_label"]}, training=False)
            x_t = q_sample(ldm.schedule, batch["z"], batch["t"],
                           batch["noise"])
            eps = ldm.apply_model(p, x_t, batch["t"], cond)
            loss, _ = p_losses(
                ldm.schedule, eps, batch["z"], batch["noise"], batch["t"],
                parameterization=ldm.parameterization,
                loss_type=ldm.loss_type,
                l_simple_weight=ldm.l_simple_weight,
                original_elbo_weight=ldm.original_elbo_weight,
            )
            return loss, {"loss": loss}

    def _batch(i):
        return {
            "z": jnp.asarray(z_np.transpose(0, 2, 3, 1)),
            "t": jnp.asarray(ts[i], jnp.int32),
            "noise": jnp.asarray(noises[i].transpose(0, 2, 3, 1)),
            "class_label": jnp.asarray(labels),
        }

    tx = make_optimizer(ldm, params, BASE_LR,
                        scheduler_config=cfg_params["scheduler_config"])
    state = create_train_state(ldm, params, tx)
    loss_mod = _FixedNoiseLoss()
    train_step = jax.jit(make_train_step(loss_mod, tx))

    # ---- step-0 gradient parity (locks the backward chain) ---------------
    g_ours = jax.grad(
        lambda p: loss_mod.training_loss(p, _batch(0), None)[0])(params)
    opt.zero_grad()
    c0 = ref.cond_stage_model(
        {"class_label": torch.from_numpy(labels)}, training=False)
    l0, _ = ref.p_losses(z_t, c0, torch.from_numpy(ts[0]),
                         noise=torch.from_numpy(noises[0]))
    l0.backward()
    gsd = {k: (p.grad.detach().clone() if p.grad is not None
               else torch.zeros_like(p)) for k, p in ref.named_parameters()}
    # buffers are missing from named_parameters; the converter only needs
    # the param entries it maps, so overlay grads onto a full-sd skeleton
    sd0 = {k: torch.zeros_like(v) for k, v in ref.state_dict().items()}
    sd0.update(gsd)
    g_ref = load_reference_ldm_checkpoint_from_sd(sd0, ldm, cfg)
    for a, b in zip(jax.tree.leaves(g_ours["unet"]),
                    jax.tree.leaves(g_ref["unet"])):
        a, b = np.asarray(a), np.asarray(b)
        assert np.max(np.abs(a - b)) <= 1e-4 * max(np.max(np.abs(b)), 1e-3)
    opt.zero_grad()

    # ---- lockstep ---------------------------------------------------------
    losses_ref, losses_ours, lrs_ref = [], [], []
    rng = jax.random.PRNGKey(0)
    for i in range(N_STEPS):
        opt.zero_grad()
        c = ref.cond_stage_model(
            {"class_label": torch.from_numpy(labels)}, training=False)
        loss_t, _ = ref.p_losses(z_t, c, torch.from_numpy(ts[i]),
                                 noise=torch.from_numpy(noises[i]))
        loss_t.backward()
        lrs_ref.append(float(opt.param_groups[0]["lr"]))
        opt.step()
        sched.step()          # Lightning 'interval': 'step', after opt
        ref.model_ema(ref.model)  # on_train_batch_end (ddpm.py:365-367)
        losses_ref.append(float(loss_t.detach()))

        state, metrics = train_step(state, _batch(i), rng)
        losses_ours.append(float(metrics["train/loss"]))

    # per-step LR sequence: locks LambdaLR step timing (step k = lambda(k))
    from dsml_thesis_tpu.training.lr_scheduler import build_lr_multiplier
    mult = build_lr_multiplier(cfg_params["scheduler_config"])
    lrs_ours = [BASE_LR * float(mult(n)) for n in range(N_STEPS)]
    np.testing.assert_allclose(lrs_ours, lrs_ref, rtol=1e-6)

    # per-step losses stay in lockstep (the trajectory, not just step 0)
    np.testing.assert_allclose(losses_ours, losses_ref, rtol=5e-3)

    # unused embedding rows ride the pure decoupled-decay recurrence on
    # BOTH sides (zero grad rows inside the grad-bearing class-embedding
    # tensor): p_n = p_0 * prod(1 - lr_k * wd), exactly
    emb0 = np.asarray(params["cond/class_label"]["embedding"]["embedding"])
    emb_ours = np.asarray(
        state.params["cond/class_label"]["embedding"]["embedding"])
    emb_ref = ref.cond_stage_model.embedding.weight.detach().numpy()
    unused = [r for r in range(emb0.shape[0]) if r not in set(labels)]
    decay_prod = float(np.prod([1.0 - lr * WD for lr in lrs_ref]))
    np.testing.assert_allclose(
        emb_ours[unused], emb0[unused] * decay_prod, rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(
        emb_ref[unused], emb0[unused] * decay_prod, rtol=2e-6, atol=1e-7)
    # ...and the used rows actually trained
    assert np.max(np.abs(emb_ours[list(labels)] - emb0[list(labels)])) > 1e-4

    # 20-step end state: chaos-calibrated bounds (see module docstring)
    sd_after = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    ref_after = load_reference_ldm_checkpoint_from_sd(sd_after, ldm, cfg)
    mx, mean = _diff_stats(state.params["unet"], ref_after["unet"])
    assert mx < 1.5e-2 and mean < 8e-4, (mx, mean)
    mx, mean = _diff_stats(state.params["cond/class_label"]["embedding"],
                           ref_after["cond/class_label"]["embedding"])
    assert mx < 1.5e-2, mx
    # the frozen first stage must not have moved at all on either side
    mx, _ = _diff_stats(state.params["first_stage"], params["first_stage"])
    assert mx == 0.0

    # EMA shadows: copy_to overlays torch's shadow buffers onto the model,
    # then the same converter maps them into our tree layout
    ref.model_ema.copy_to(ref.model)
    ref_ema = load_reference_ldm_checkpoint_from_sd(ref.state_dict(), ldm, cfg)
    mx, mean = _diff_stats(state.ema_params["unet"], ref_ema["unet"])
    assert mx < 1.5e-2 and mean < 8e-4, (mx, mean)
    # shadows lag the raw params (warmup decay < 1, so they are distinct)
    mx, _ = _diff_stats(state.ema_params["unet"], state.params["unet"])
    assert mx > 1e-5

    # sanity: training actually moved things
    mx, _ = _diff_stats(state.params["unet"], params["unet"])
    assert mx > 1e-3


def test_litema_warmup_formula_exact_lockstep():
    """ema_update vs the reference LitEma over an IDENTICAL parameter
    trajectory: the warmup decay min(0.9999,(1+n)/(10+n)) and the
    shadow -= (1-d)*(shadow-p) recurrence must agree bit-for-bit-ish
    (fp32 tolerance), including far past the warmup crossover."""
    install_reference_path()
    from ldm.modules.ema import LitEma

    from dsml_thesis_tpu.training.ema import ema_update

    torch.manual_seed(1)
    m = torch.nn.Linear(4, 3)
    ema_t = LitEma(m, decay=0.9999)

    rs = np.random.RandomState(11)
    shadow = {"w": jnp.asarray(m.weight.detach().numpy()),
              "b": jnp.asarray(m.bias.detach().numpy())}
    for n in range(40):
        w = rs.randn(3, 4).astype(np.float32)
        b = rs.randn(3).astype(np.float32)
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(w))
            m.bias.copy_(torch.from_numpy(b))
        ema_t(m)
        shadow = ema_update(shadow, {"w": jnp.asarray(w), "b": jnp.asarray(b)},
                            num_updates=n + 1, decay=0.9999)

    buf = dict(ema_t.named_buffers())
    np.testing.assert_allclose(np.asarray(shadow["w"]),
                               buf["weight"].numpy(), atol=1e-7)
    np.testing.assert_allclose(np.asarray(shadow["b"]),
                               buf["bias"].numpy(), atol=1e-7)
    # the warmup decay was actually active (n small => d = (1+n)/(10+n))
    assert float(ema_t.num_updates) == 40
