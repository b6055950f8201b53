"""LR multiplier schedules as optax-compatible pure functions.

Parity target: face_reenactment/ldm/lr_scheduler.py (LambdaWarmUpCosineScheduler,
LambdaWarmUpCosineScheduler2, LambdaLinearScheduler). Multipliers over a base
LR of 1.0, wired through configure_optimizers (ddpm.py:1373-1384).

Implemented with jnp so they can live inside a jitted optax schedule.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                  lr_start: float, max_decay_steps: int):
    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        # max(wu, 1): both jnp.where branches evaluate, so wu=0 (warmup
        # disabled) must not divide by zero — the warm branch is never taken
        warm = (lr_max - lr_start) / max(warm_up_steps, 1) * n + lr_start
        t = jnp.minimum((n - warm_up_steps) / (max_decay_steps - warm_up_steps), 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, cos)

    return schedule


def _cycle_index(cum_cycles: np.ndarray, n):
    # interval i such that cum_cycles[i] < n <= cum_cycles[i+1] (reference
    # find_in_interval semantics); n is a scalar step count
    return jnp.clip(
        jnp.sum(jnp.asarray(cum_cycles[1:], jnp.float32) < n),
        0, len(cum_cycles) - 2,
    )


def warmup_cosine2(warm_up_steps: Sequence[int], f_min: Sequence[float],
                   f_max: Sequence[float], f_start: Sequence[float],
                   cycle_lengths: Sequence[int]):
    cum = np.cumsum([0] + list(cycle_lengths))
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmn = jnp.asarray(f_min, jnp.float32)
    fmx = jnp.asarray(f_max, jnp.float32)
    fst = jnp.asarray(f_start, jnp.float32)
    cl = jnp.asarray(cycle_lengths, jnp.float32)

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        c = _cycle_index(cum, n)
        nn = n - jnp.asarray(cum[:-1], jnp.float32)[c]
        warm = (fmx[c] - fst[c]) / wu[c] * nn + fst[c]
        t = jnp.minimum((nn - wu[c]) / (cl[c] - wu[c]), 1.0)
        cos = fmn[c] + 0.5 * (fmx[c] - fmn[c]) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(nn < wu[c], warm, cos)

    return schedule


def lambda_linear(warm_up_steps: Sequence[int], f_min: Sequence[float],
                  f_max: Sequence[float], f_start: Sequence[float],
                  cycle_lengths: Sequence[int]):
    cum = np.cumsum([0] + list(cycle_lengths))
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmn = jnp.asarray(f_min, jnp.float32)
    fmx = jnp.asarray(f_max, jnp.float32)
    fst = jnp.asarray(f_start, jnp.float32)
    cl = jnp.asarray(cycle_lengths, jnp.float32)

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        c = _cycle_index(cum, n)
        # clamp within the (clipped-to-last) cycle: past sum(cycle_lengths)
        # the multiplier holds at f_min instead of running linearly negative
        # (the reference crashes there; holding is the sane continuation)
        nn = jnp.minimum(n - jnp.asarray(cum[:-1], jnp.float32)[c], cl[c])
        warm = (fmx[c] - fst[c]) / wu[c] * nn + fst[c]
        lin = fmn[c] + (fmx[c] - fmn[c]) * (cl[c] - nn) / cl[c]
        return jnp.where(nn < wu[c], warm, lin)

    return schedule


_SCHEDULE_BUILDERS = {
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler": warmup_cosine,
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler2": warmup_cosine2,
    "ldm.lr_scheduler.LambdaLinearScheduler": lambda_linear,
}


def build_lr_multiplier(scheduler_config: dict):
    """Reference scheduler_config node -> jnp multiplier schedule."""
    target = scheduler_config["target"]
    params = dict(scheduler_config.get("params", {}))
    params.pop("verbosity_interval", None)
    builder = _SCHEDULE_BUILDERS.get(target)
    if builder is None:
        raise NotImplementedError(target)
    return builder(**params)
