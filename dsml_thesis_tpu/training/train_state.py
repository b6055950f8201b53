"""Train state + the pjit-able train/eval steps.

Replaces the reference's PL Trainer spine (main.py:671-753 + ddpm.py
training_step/validation_step/configure_optimizers/on_train_batch_end):
  - AdamW via optax, frozen groups masked with set_to_zero
    (first stage + non-trainable cond stages, ddpm.py:501-527)
  - LR = multiplier-schedule × base_lr (ddpm.py:1373-1384)
  - EMA of the trainable groups after each step (ddpm.py:365-367)
  - validation evaluates the loss twice — raw and EMA weights —
    giving val_loss / val_loss_ema (ddpm.py:356-363)

The returned step functions are pure; jit them with batch sharded over the
`data` mesh axis and state replicated, and the partitioner inserts the
gradient psum over ICI.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..flags import env_flag
from ..models.ldm import LatentDiffusion
from .ema import ema_update


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # EMA shadows of the TRAINABLE groups only — duplicating the frozen first
    # stage would waste a large fraction of HBM at 256px (3 copies + EMA
    # bandwidth every step) for parameters that never change
    ema_params: Any

    def ema_full(self) -> Dict:
        """Full param tree with EMA weights swapped in for trainable groups
        (the reference's ema_scope, ddpm.py:171-184)."""
        return {**self.params, **self.ema_params}


def make_optimizer(
    ldm: LatentDiffusion,
    params: Dict,
    base_lr: float,
    scheduler_config: Optional[dict] = None,
    weight_decay: float = 0.01,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    if scheduler_config is not None:
        from .lr_scheduler import build_lr_multiplier

        mult = build_lr_multiplier(scheduler_config)
        lr = lambda n: base_lr * mult(n)
    else:
        lr = base_lr
    # torch.optim.AdamW defaults (ddpm.py:1371): betas (0.9, 0.999), wd 0.01
    # DSML_OPT_BF16_M=1: keep the first Adam moment in bf16 (halves one of
    # the two optimizer-state HBM streams; m is noise-dominated so bf16
    # rounding is benign — v stays fp32, its dynamic range matters)
    mu_dtype = "bfloat16" if env_flag("DSML_OPT_BF16_M", False) else None
    tx = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay,
                     mu_dtype=mu_dtype)
    labels = ldm.trainable_filter(params)
    # sub-module freeze declarations (e.g. wav2vec2's conv extractor inside
    # a trainable cond stage): stop_gradient zeroes their grads, but AdamW's
    # DECOUPLED weight decay would still shrink them every step — label the
    # frozen sub-trees set_to_zero at leaf level, like torch skipping
    # requires_grad=False params outright
    frozen_subs = (ldm.frozen_subpaths()
                   if hasattr(ldm, "frozen_subpaths") else {})

    def _mark(sub, base: bool, frozen, prefix=""):
        if isinstance(sub, dict):
            return {k: _mark(v, base, frozen, f"{prefix}{k}/")
                    for k, v in sub.items()}
        path = prefix.rstrip("/")
        return base and not any(
            path == f or path.startswith(f + "/") for f in frozen)

    tx = optax.multi_transform(
        {True: tx, False: optax.set_to_zero()},
        param_labels=lambda p: {
            k: _mark(v, labels[k], frozen_subs.get(k, ()))
            for k, v in p.items()
        },
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def create_train_state(
    ldm: LatentDiffusion, params: Dict, tx: optax.GradientTransformation
) -> TrainState:
    trainable = ldm.trainable_filter(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params={k: jax.tree.map(jnp.copy, v)
                    for k, v in params.items() if trainable[k]},
    )


def make_train_step(
    loss_module, tx: optax.GradientTransformation,
    ema_decay: float = 0.9999,
) -> Callable:
    """loss_module: anything with training_loss(params, batch, rng) -> (loss,
    aux-dict) — the LatentDiffusion itself or a finetune wrapper over it.
    Losses declaring a `global_step` kwarg (adopt_weight warmups, e.g. the
    lipread finetune's start_lr_loss) receive the live step counter."""
    import inspect

    takes_step = "global_step" in inspect.signature(
        loss_module.training_loss
    ).parameters

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            if takes_step:
                return loss_module.training_loss(
                    p, batch, step_rng, global_step=state.step
                )
            return loss_module.training_loss(p, batch, step_rng)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(
            state.ema_params, {k: params[k] for k in state.ema_params},
            state.step + 1, decay=ema_decay,
        )
        new_state = state.replace(
            step=state.step + 1, params=params,
            opt_state=opt_state, ema_params=ema_params,
        )
        metrics = {f"train/{k}": v for k, v in aux.items()}
        return new_state, metrics

    return train_step


def make_eval_step(loss_module) -> Callable:
    import inspect

    sig = inspect.signature(loss_module.training_loss).parameters
    takes_step = "global_step" in sig
    # validation form: random t/noise stay, but CFG label drop and dropout
    # turn off (Lightning validation runs with model.training=False) — else
    # ~p_uncond of val batches score on the null token and bias the
    # val_loss_ema checkpoint monitor
    takes_training = "training" in sig

    def eval_step(state: TrainState, batch: Dict, rng: jax.Array):
        # adopt_weight-gated terms (lipread start_lr_loss) must see the live
        # step in validation too, or the monitor ranks on a partial loss
        kw = {"global_step": state.step} if takes_step else {}
        if takes_training:
            kw["training"] = False
        _, aux = loss_module.training_loss(state.params, batch, rng, **kw)
        _, aux_ema = loss_module.training_loss(state.ema_full(), batch, rng, **kw)
        out = {f"val/{k}": v for k, v in aux.items()}
        # the reference's checkpoint monitors (ddpm.py:356-363)
        out["val_loss"] = aux.get("loss_simple", aux["loss"])
        out["val_loss_ema"] = aux_ema.get("loss_simple", aux_ema["loss"])
        return out

    return eval_step
