"""DPM-Solver++ (2M multistep) sampler for the discrete VP schedule.

Parity target (capability, not code): talking_face/ldm/models/diffusion/
dpm_solver/ (NoiseScheduleVP :6, model_wrapper :177, DPM_Solver :351) — the
reference vendors the full first/second/third-order suite but no entry point
uses it. This provides the workhorse variant (DPM-Solver++ 2M, data
prediction, uniform-lambda or uniform-t steps) as a single lax.scan, which
matches or beats DDIM at low step counts.

Math (Lu et al. 2022, arXiv:2211.01095): with lambda = log(alpha/sigma),
  x_{i} = (sigma_i / sigma_{i-1}) x_{i-1} - alpha_i (e^{-h_i} - 1) D_i,
  D_i = (1 + 1/(2 r_i)) x0(t_{i-1}) - (1/(2 r_i)) x0(t_{i-2})   (2nd order)
where h_i = lambda_i - lambda_{i-1}, r_i = h_{i-1}/h_i.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import EpsFn
from .schedules import DiffusionSchedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DPMSolverSchedule:
    timesteps: jnp.ndarray  # int32 [S+1], descending (t_0 = T-1 ... t_S = 0)
    alphas: jnp.ndarray     # sqrt(alpha_bar) at each node
    sigmas: jnp.ndarray     # sqrt(1 - alpha_bar)
    lambdas: jnp.ndarray    # log(alpha/sigma)


def make_dpm_schedule(sched: DiffusionSchedule, num_steps: int) -> DPMSolverSchedule:
    n = sched.num_timesteps
    # uniform time steps from T-1 down to 0, inclusive endpoints (S+1 nodes)
    ts = np.linspace(n - 1, 0, num_steps + 1).round().astype(np.int64)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)[ts]
    alphas = np.sqrt(ac)
    sigmas = np.sqrt(1.0 - ac)
    lambdas = np.log(alphas / sigmas)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return DPMSolverSchedule(
        timesteps=jnp.asarray(ts, jnp.int32),
        alphas=f32(alphas), sigmas=f32(sigmas), lambdas=f32(lambdas),
    )


def dpm_solver_sample(
    dpm: DPMSolverSchedule,
    eps_fn: EpsFn,
    shape,
    key: jax.Array,
    x_T: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DPM-Solver++(2M): second-order multistep, first step is first-order."""
    if x_T is None:
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        x = x_T
    b = shape[0]
    S = dpm.timesteps.shape[0] - 1

    def x0_pred(x, i):
        """Data prediction at node i from the eps model."""
        t = jnp.full((b,), jnp.take(dpm.timesteps, i), dtype=jnp.int32)
        eps = eps_fn(x, t)
        a = jnp.take(dpm.alphas, i)
        s = jnp.take(dpm.sigmas, i)
        return (x - s * eps) / a

    def step(carry, i):
        x, x0_prev, valid_prev = carry
        x0_cur = x0_pred(x, i)
        lam_cur = jnp.take(dpm.lambdas, i)
        lam_next = jnp.take(dpm.lambdas, i + 1)
        lam_prev = jnp.take(dpm.lambdas, jnp.maximum(i - 1, 0))
        h = lam_next - lam_cur
        h_last = lam_cur - lam_prev
        r = h_last / jnp.maximum(h, 1e-8) * 0 + jnp.where(h == 0, 1.0, h_last / h)
        # 2M update: D = (1 + 1/(2r)) x0_cur - 1/(2r) x0_prev (when history valid)
        D = jnp.where(
            valid_prev,
            (1.0 + 1.0 / (2.0 * r)) * x0_cur - (1.0 / (2.0 * r)) * x0_prev,
            x0_cur,
        )
        a_next = jnp.take(dpm.alphas, i + 1)
        s_next = jnp.take(dpm.sigmas, i + 1)
        s_cur = jnp.take(dpm.sigmas, i)
        x_next = (s_next / s_cur) * x - a_next * jnp.expm1(-h) * D
        return (x_next, x0_cur, jnp.bool_(True)), None

    init = (x, jnp.zeros_like(x), jnp.bool_(False))
    (x, _, _), _ = jax.lax.scan(step, init, jnp.arange(S))
    return x
