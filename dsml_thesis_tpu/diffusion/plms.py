"""PLMS (pseudo-linear multistep) sampler as a lax.scan.

Parity target: face_reenactment/ldm/models/diffusion/plms.py:11-236 — the
Adams-Bashforth-style multistep update over eps predictions:
  - step 0: e_t, then a second eval at t_prev to form (e_t + e_t_next)/2
  - step 1: (3 e_t - e_old) / 2
  - step 2: (23 e_t - 16 e_1 + 5 e_2) / 12
  - step 3+: (55 e_t - 59 e_1 + 37 e_2 - 9 e_3) / 24
The eps history rides the scan carry as a fixed [4, ...] buffer with a count;
lax.switch selects the multistep order (no Python-level data-dependent
branching).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .ddim import EpsFn
from .schedules import DDIMSchedule


def _x_prev_from_eps(ddim: DDIMSchedule, x, e_t, index):
    a_t = jnp.take(ddim.alphas, index)
    a_prev = jnp.take(ddim.alphas_prev, index)
    sigma_t = jnp.take(ddim.sigmas, index)
    sqrt_1m_at = jnp.take(ddim.sqrt_one_minus_alphas, index)
    pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt, pred_x0


def plms_sample(
    ddim: DDIMSchedule,
    eps_fn: EpsFn,
    shape,
    key: jax.Array,
    x_T: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    # the reference PLMSSampler asserts ddim_eta == 0 (plms.py:34): the
    # multistep update has no noise term, so an eta>0 schedule would produce
    # variance-deficient samples silently. Host-side check only — when the
    # schedule rides a jit boundary its fields are tracers and concretizing
    # them would raise TracerConversionError (and force a device sync).
    import numpy as np

    if not isinstance(ddim.sigmas, jax.core.Tracer):
        assert float(np.max(np.asarray(ddim.sigmas))) == 0.0, \
            "PLMS requires an eta=0 schedule"
    if x_T is None:
        key, sub = jax.random.split(key)
        img = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        img = x_T
    S = ddim.num_steps
    b = shape[0]
    # 3 past eps suffice (the reference keeps old_eps at length <= 3)
    hist = jnp.zeros((3,) + tuple(shape), dtype=jnp.float32)

    def multistep(e_t, hist, count):
        e1, e2, e3 = hist[0], hist[1], hist[2]
        branches = [
            lambda: e_t,  # order 1 handled by the two-eval path below
            lambda: (3 * e_t - e1) / 2,
            lambda: (23 * e_t - 16 * e1 + 5 * e2) / 12,
            lambda: (55 * e_t - 59 * e1 + 37 * e2 - 9 * e3) / 24,
        ]
        return jax.lax.switch(jnp.minimum(count, 3), branches)

    def step(carry, i):
        img, hist, count = carry
        index = S - 1 - i
        t = jnp.full((b,), jnp.take(ddim.timesteps, index), dtype=jnp.int32)
        e_t = eps_fn(img, t)

        def first_order():
            # second eval at the previous timestep (plms.py's pseudo-improved
            # Euler start)
            x_prev1, _ = _x_prev_from_eps(ddim, img, e_t, index)
            idx_next = jnp.maximum(index - 1, 0)
            t_next = jnp.full(
                (b,), jnp.take(ddim.timesteps, idx_next), dtype=jnp.int32
            )
            e_t_next = eps_fn(x_prev1, t_next)
            return (e_t + e_t_next) / 2

        e_prime = jax.lax.cond(
            count == 0, first_order, lambda: multistep(e_t, hist, count)
        )
        x_prev, _ = _x_prev_from_eps(ddim, img, e_prime, index)
        hist = jnp.concatenate([e_t[None], hist[:2]], axis=0)
        return (x_prev, hist, count + 1), None

    (img, _, _), _ = jax.lax.scan(step, (img, hist, jnp.int32(0)), jnp.arange(S))
    return img
