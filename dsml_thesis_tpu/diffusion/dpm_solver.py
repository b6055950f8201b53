"""DPM-Solver / DPM-Solver++ sampler suite for the discrete VP schedule.

Parity target: talking_face/ldm/models/diffusion/dpm_solver/dpm_solver.py —
NoiseScheduleVP('discrete') (:6), model_wrapper (:177), DPM_Solver (:351)
with first/second/third-order single- and multistep updates (both
'dpm_solver' and 'taylor' variants, eps- and x0-prediction), the
DPM-Solver-fast order schedule, and the adaptive step-size solver (:909).
Numerically validated against the reference torch implementation as an
oracle (tests/test_dpm_suite.py).

TPU-first structuring: multistep runs as one lax.scan with a static per-step
order array dispatched by lax.switch (one UNet instance in the HLO);
singlestep unrolls its (few) outer steps; the adaptive solver is a
lax.while_loop.

Math (Lu et al. 2022, arXiv:2206.00927 + 2211.01095): with
lambda = log(alpha/sigma), the exact solution
  x_t = (sigma_t/sigma_s) x_s - alpha_t \\int e^{-lam} x0(lam) dlam
is discretized by Taylor expansions of the model in lambda.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

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
        # duplicate ROUNDED timesteps (num_steps near/above the schedule
        # length) give h_last = 0 -> r = 0 -> 1/(2r) = inf and an all-NaN
        # sample; degrade that step to first-order instead (x0_prev is the
        # same node's prediction, so the 2M correction carries no info)
        degenerate = (h == 0) | (h_last == 0)
        r = jnp.where(degenerate, 1.0, h_last / h)
        # 2M update: D = (1 + 1/(2r)) x0_cur - 1/(2r) x0_prev (when history valid)
        D = jnp.where(
            valid_prev & ~degenerate,
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


# ---------------------------------------------------------------------------
# Continuous-time VP schedule (NoiseScheduleVP 'discrete' mode)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VPContinuous:
    """log alpha_t interpolated over t in (0, 1] (dpm_solver.py:96-108)."""

    t_grid: jnp.ndarray      # [N] = (1..N)/N
    log_alpha: jnp.ndarray   # [N] = 0.5 log(alphas_cumprod)
    total_N: int = dataclasses.field(metadata=dict(static=True), default=1000)

    def marginal_log_alpha(self, t):
        return jnp.interp(t, self.t_grid, self.log_alpha)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_alpha(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_alpha(t)))

    def marginal_lambda(self, t):
        la = self.marginal_log_alpha(t)
        return la - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * la))

    def inverse_lambda(self, lam):
        target = -0.5 * jnp.logaddexp(0.0, -2.0 * lam)
        # log_alpha decreases in t; flip for increasing interp keypoints
        return jnp.interp(target, self.log_alpha[::-1], self.t_grid[::-1])

    def model_input_time(self, t):
        """Continuous t -> the discrete model's timestep input
        (get_model_input_time, dpm_solver.py:262-268)."""
        return (t - 1.0 / self.total_N) * 1000.0


def make_vp_continuous(sched: DiffusionSchedule) -> VPContinuous:
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    n = len(ac)
    return VPContinuous(
        t_grid=jnp.asarray(np.arange(1, n + 1) / n, jnp.float32),
        log_alpha=jnp.asarray(0.5 * np.log(ac), jnp.float32),
        total_N=n,
    )


# ---------------------------------------------------------------------------
# Solver updates (DPM_Solver methods; x0-pred = DPM-Solver++, eps-pred = classic)
# ---------------------------------------------------------------------------

def _coeffs(vp, s, t):
    lam_s, lam_t = vp.marginal_lambda(s), vp.marginal_lambda(t)
    return dict(
        h=lam_t - lam_s, lam_s=lam_s, lam_t=lam_t,
        log_a_s=vp.marginal_log_alpha(s), log_a_t=vp.marginal_log_alpha(t),
        sig_s=vp.marginal_std(s), sig_t=vp.marginal_std(t),
        a_t=vp.marginal_alpha(t),
    )


def _first_update(vp, x, s, t, model_s, predict_x0):
    c = _coeffs(vp, s, t)
    if predict_x0:
        return (c["sig_t"] / c["sig_s"]) * x - c["a_t"] * jnp.expm1(-c["h"]) * model_s
    return jnp.exp(c["log_a_t"] - c["log_a_s"]) * x - c["sig_t"] * jnp.expm1(c["h"]) * model_s


def _second_update_s(vp, model_fn, x, s, t, r1, predict_x0, solver_type,
                     model_s=None):
    """singlestep_dpm_solver_second_update (dpm_solver.py:551-632)."""
    c = _coeffs(vp, s, t)
    h = c["h"]
    lam_s1 = c["lam_s"] + r1 * h
    s1 = vp.inverse_lambda(lam_s1)
    log_a_s1 = vp.marginal_log_alpha(s1)
    sig_s1 = vp.marginal_std(s1)
    a_s1 = jnp.exp(log_a_s1)
    if model_s is None:
        model_s = model_fn(x, s)
    if predict_x0:
        x_s1 = (sig_s1 / c["sig_s"]) * x - a_s1 * jnp.expm1(-r1 * h) * model_s
        model_s1 = model_fn(x_s1, s1)
        if solver_type == "dpm_solver":
            x_t = ((c["sig_t"] / c["sig_s"]) * x
                   - c["a_t"] * jnp.expm1(-h) * model_s
                   - (0.5 / r1) * c["a_t"] * jnp.expm1(-h) * (model_s1 - model_s))
        else:  # taylor
            x_t = ((c["sig_t"] / c["sig_s"]) * x
                   - c["a_t"] * jnp.expm1(-h) * model_s
                   + (1.0 / r1) * c["a_t"] * (jnp.expm1(-h) / h + 1.0)
                   * (model_s1 - model_s))
    else:
        x_s1 = (jnp.exp(log_a_s1 - c["log_a_s"]) * x
                - sig_s1 * jnp.expm1(r1 * h) * model_s)
        model_s1 = model_fn(x_s1, s1)
        if solver_type == "dpm_solver":
            x_t = (jnp.exp(c["log_a_t"] - c["log_a_s"]) * x
                   - c["sig_t"] * jnp.expm1(h) * model_s
                   - (0.5 / r1) * c["sig_t"] * jnp.expm1(h) * (model_s1 - model_s))
        else:
            x_t = (jnp.exp(c["log_a_t"] - c["log_a_s"]) * x
                   - c["sig_t"] * jnp.expm1(h) * model_s
                   - (1.0 / r1) * c["sig_t"] * (jnp.expm1(h) / h - 1.0)
                   * (model_s1 - model_s))
    return x_t, model_s, model_s1


def _third_update_s(vp, model_fn, x, s, t, r1, r2, predict_x0, solver_type,
                    model_s=None, model_s1=None):
    """singlestep_dpm_solver_third_update (dpm_solver.py:633-758)."""
    c = _coeffs(vp, s, t)
    h = c["h"]
    lam_s1 = c["lam_s"] + r1 * h
    lam_s2 = c["lam_s"] + r2 * h
    s1, s2 = vp.inverse_lambda(lam_s1), vp.inverse_lambda(lam_s2)
    log_a_s1, log_a_s2 = vp.marginal_log_alpha(s1), vp.marginal_log_alpha(s2)
    sig_s1, sig_s2 = vp.marginal_std(s1), vp.marginal_std(s2)
    a_s1, a_s2 = jnp.exp(log_a_s1), jnp.exp(log_a_s2)
    if model_s is None:
        model_s = model_fn(x, s)
    if predict_x0:
        phi_11, phi_12 = jnp.expm1(-r1 * h), jnp.expm1(-r2 * h)
        phi_1 = jnp.expm1(-h)
        phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
        phi_2 = phi_1 / h + 1.0
        phi_3 = phi_2 / h - 0.5
        if model_s1 is None:
            x_s1 = (sig_s1 / c["sig_s"]) * x - a_s1 * phi_11 * model_s
            model_s1 = model_fn(x_s1, s1)
        x_s2 = ((sig_s2 / c["sig_s"]) * x - a_s2 * phi_12 * model_s
                + (r2 / r1) * a_s2 * phi_22 * (model_s1 - model_s))
        model_s2 = model_fn(x_s2, s2)
        if solver_type == "dpm_solver":
            x_t = ((c["sig_t"] / c["sig_s"]) * x - c["a_t"] * phi_1 * model_s
                   + (1.0 / r2) * c["a_t"] * phi_2 * (model_s2 - model_s))
        else:
            D1_0 = (1.0 / r1) * (model_s1 - model_s)
            D1_1 = (1.0 / r2) * (model_s2 - model_s)
            D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
            D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
            x_t = ((c["sig_t"] / c["sig_s"]) * x - c["a_t"] * phi_1 * model_s
                   + c["a_t"] * phi_2 * D1 - c["a_t"] * phi_3 * D2)
    else:
        phi_11, phi_12 = jnp.expm1(r1 * h), jnp.expm1(r2 * h)
        phi_1 = jnp.expm1(h)
        phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        if model_s1 is None:
            x_s1 = (jnp.exp(log_a_s1 - c["log_a_s"]) * x
                    - sig_s1 * phi_11 * model_s)
            model_s1 = model_fn(x_s1, s1)
        x_s2 = (jnp.exp(log_a_s2 - c["log_a_s"]) * x
                - sig_s2 * phi_12 * model_s
                - (r2 / r1) * sig_s2 * phi_22 * (model_s1 - model_s))
        model_s2 = model_fn(x_s2, s2)
        if solver_type == "dpm_solver":
            x_t = (jnp.exp(c["log_a_t"] - c["log_a_s"]) * x
                   - c["sig_t"] * phi_1 * model_s
                   - (1.0 / r2) * c["sig_t"] * phi_2 * (model_s2 - model_s))
        else:
            D1_0 = (1.0 / r1) * (model_s1 - model_s)
            D1_1 = (1.0 / r2) * (model_s2 - model_s)
            D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
            D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
            x_t = (jnp.exp(c["log_a_t"] - c["log_a_s"]) * x
                   - c["sig_t"] * phi_1 * model_s
                   - c["sig_t"] * phi_2 * D1 - c["sig_t"] * phi_3 * D2)
    return x_t, model_s, model_s1, model_s2


def _second_update_m(vp, x, models, ts, t, predict_x0, solver_type):
    """multistep_dpm_solver_second_update (dpm_solver.py:760-812)."""
    (m1, m0), (t1, t0) = models[-2:], ts[-2:]
    lam_1, lam_0, lam_t = (vp.marginal_lambda(t1), vp.marginal_lambda(t0),
                           vp.marginal_lambda(t))
    c = _coeffs(vp, t0, t)
    h = lam_t - lam_0
    r0 = (lam_0 - lam_1) / h
    D1_0 = (1.0 / r0) * (m0 - m1)
    if predict_x0:
        if solver_type == "dpm_solver":
            return ((c["sig_t"] / c["sig_s"]) * x
                    - c["a_t"] * jnp.expm1(-h) * m0
                    - 0.5 * c["a_t"] * jnp.expm1(-h) * D1_0)
        return ((c["sig_t"] / c["sig_s"]) * x
                - c["a_t"] * jnp.expm1(-h) * m0
                + c["a_t"] * (jnp.expm1(-h) / h + 1.0) * D1_0)
    if solver_type == "dpm_solver":
        return (jnp.exp(c["log_a_t"] - c["log_a_s"]) * x
                - c["sig_t"] * jnp.expm1(h) * m0
                - 0.5 * c["sig_t"] * jnp.expm1(h) * D1_0)
    return (jnp.exp(c["log_a_t"] - c["log_a_s"]) * x
            - c["sig_t"] * jnp.expm1(h) * m0
            - c["sig_t"] * (jnp.expm1(h) / h - 1.0) * D1_0)


def _third_update_m(vp, x, models, ts, t, predict_x0):
    """multistep_dpm_solver_third_update (dpm_solver.py:812-858)."""
    (m2, m1, m0), (t2, t1, t0) = models[-3:], ts[-3:]
    lam_2, lam_1, lam_0, lam_t = (vp.marginal_lambda(t2), vp.marginal_lambda(t1),
                                  vp.marginal_lambda(t0), vp.marginal_lambda(t))
    c = _coeffs(vp, t0, t)
    h = lam_t - lam_0
    r0, r1 = (lam_0 - lam_1) / h, (lam_1 - lam_2) / h
    D1_0 = (1.0 / r0) * (m0 - m1)
    D1_1 = (1.0 / r1) * (m1 - m2)
    D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
    D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)
    if predict_x0:
        return ((c["sig_t"] / c["sig_s"]) * x
                - c["a_t"] * jnp.expm1(-h) * m0
                + c["a_t"] * (jnp.expm1(-h) / h + 1.0) * D1
                - c["a_t"] * ((jnp.expm1(-h) + h) / h ** 2 - 0.5) * D2)
    return (jnp.exp(c["log_a_t"] - c["log_a_s"]) * x
            - c["sig_t"] * jnp.expm1(h) * m0
            - c["sig_t"] * (jnp.expm1(h) / h - 1.0) * D1
            - c["sig_t"] * ((jnp.expm1(h) - h) / h ** 2 - 0.5) * D2)


# ---------------------------------------------------------------------------
# Sampling drivers
# ---------------------------------------------------------------------------

def _make_model_fn(vp: VPContinuous, eps_fn: EpsFn, batch: int,
                   predict_x0: bool) -> Callable:
    """Continuous-time model wrapper (model_wrapper + data_prediction_fn)."""

    def fn(x, t):
        t_in = jnp.full((batch,), vp.model_input_time(t), jnp.float32)
        eps = eps_fn(x, t_in)
        if not predict_x0:
            return eps
        return (x - vp.marginal_std(t) * eps) / vp.marginal_alpha(t)

    return fn


def _time_nodes(vp, skip_type, t_T, t_0, n):
    if skip_type == "time_uniform":
        return jnp.linspace(t_T, t_0, n + 1)
    if skip_type == "logSNR":
        lam = jnp.linspace(vp.marginal_lambda(jnp.float32(t_T)),
                           vp.marginal_lambda(jnp.float32(t_0)), n + 1)
        return vp.inverse_lambda(lam)
    if skip_type == "time_quadratic":
        return jnp.linspace(t_T ** 0.5, t_0 ** 0.5, n + 1) ** 2
    raise ValueError(skip_type)


def _singlestep_orders(steps: int, order: int) -> Sequence[int]:
    """DPM-Solver-fast order schedule (dpm_solver.py:470-495)."""
    if order not in (1, 2, 3):
        # falling through to the order-1 schedule would silently run plain
        # first-order updates under a higher-order label (reference raises)
        raise ValueError(f"order must be 1, 2, or 3 (got {order})")
    if order == 3:
        k = steps // 3 + 1
        return ([3] * (k - 2) + [2, 1] if steps % 3 == 0 else
                [3] * (k - 1) + [1] if steps % 3 == 1 else [3] * (k - 1) + [2])
    if order == 2:
        return [2] * (steps // 2) if steps % 2 == 0 else \
            [2] * (steps // 2) + [1]
    return [1] * steps


def dpm_solver_sample_suite(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    shape,
    key: jax.Array,
    steps: int = 20,
    order: int = 2,
    method: str = "multistep",
    skip_type: str = "time_uniform",
    predict_x0: bool = True,
    solver_type: str = "dpm_solver",
    lower_order_final: bool = True,
    denoise_to_zero: bool = False,
    x_T: Optional[jnp.ndarray] = None,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
) -> jnp.ndarray:
    """DPM_Solver.sample (dpm_solver.py:965-1128) for the discrete schedule.

    predict_x0=True is DPM-Solver++ (the sampler.py:8 default); method
    'multistep' runs as one lax.scan, 'singlestep' unrolls the outer steps
    (each with 1-3 inner model evaluations, DPM-Solver-fast order schedule).
    """
    if solver_type not in ("dpm_solver", "taylor"):
        # any other string would silently select the taylor numerics in
        # every update (the reference raises the same way)
        raise ValueError(f"solver_type must be 'dpm_solver' or 'taylor' "
                         f"(got {solver_type!r})")
    if order not in (1, 2, 3):
        # lax.switch clamps out-of-range indices: order=4 would silently
        # run third-order under a mislabeled name (reference raises)
        raise ValueError(f"order must be 1, 2, or 3 (got {order})")
    if method == "multistep" and steps < order:
        raise ValueError(f"multistep needs steps >= order "
                         f"(got steps={steps}, order={order}); the reference "
                         "asserts the same")
    vp = make_vp_continuous(sched)
    t_T = t_start if t_start is not None else 1.0
    t_0 = t_end if t_end is not None else 1.0 / vp.total_N
    if not (0 < t_0 < t_T <= 1.0) or t_0 < 1.0 / vp.total_N - 1e-12:
        # the discrete-mode schedule is only defined on [1/N, 1]: jnp.interp
        # CLAMPS outside the keypoint grid while the reference's
        # interpolate_fn extrapolates, so out-of-range t would silently
        # diverge from the oracle (the reference's t_end=1e-4 advice applies
        # to its continuous 'linear'/'cosine' modes, not 'discrete')
        raise ValueError(
            f"t range [{t_0}, {t_T}] outside the discrete schedule's "
            f"[{1.0 / vp.total_N}, 1.0]")
    b = shape[0]
    model_fn = _make_model_fn(vp, eps_fn, b, predict_x0)
    if x_T is None:
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        x = x_T

    if method == "multistep":
        nodes = _time_nodes(vp, skip_type, t_T, t_0, steps)
        # per-step effective order: warmup ramp (reference init loop) +
        # lower_order_final tail when steps < 15 (dpm_solver.py:1090-1094)
        orders = np.minimum(np.arange(1, steps + 1), order)
        if lower_order_final and steps < 15:
            orders = np.minimum(orders, steps - np.arange(steps))
        orders = orders.astype(np.int32)

        m0 = model_fn(x, nodes[0])
        # history stacks: [3, ...] models, [3] times (most recent last)
        models = jnp.stack([m0, m0, m0])
        ts = jnp.stack([nodes[0]] * 3)

        def update(x, models, ts, t_next, order_i):
            hist_m = [models[0], models[1], models[2]]
            hist_t = [ts[0], ts[1], ts[2]]
            x1 = _first_update(vp, x, hist_t[-1], t_next, hist_m[-1], predict_x0)
            x2 = _second_update_m(vp, x, hist_m, hist_t, t_next, predict_x0,
                                  solver_type)
            x3 = _third_update_m(vp, x, hist_m, hist_t, t_next, predict_x0)
            return jax.lax.switch(order_i - 1, [lambda: x1, lambda: x2,
                                                lambda: x3])

        def step(carry, inp):
            x, models, ts = carry
            t_next, order_i = inp
            x_new = update(x, models, ts, t_next, order_i)
            m_new = model_fn(x_new, t_next)
            models = jnp.stack([models[1], models[2], m_new])
            ts = jnp.stack([ts[1], ts[2], t_next])
            return (x_new, models, ts), None

        # the last node's model value is never consumed — update it outside
        # the scan (the reference's `if step < steps` guard, :1105-1106)
        if steps > 1:
            (x, models, ts), _ = jax.lax.scan(
                step, (x, models, ts),
                (nodes[1:-1], jnp.asarray(orders[:-1])),
            )
        x = update(x, models, ts, nodes[-1], jnp.int32(orders[-1]))
    elif method in ("singlestep", "singlestep_fixed"):
        if method == "singlestep":
            orders = _singlestep_orders(steps, order)
            if skip_type == "logSNR":
                outer = _time_nodes(vp, skip_type, t_T, t_0, len(orders))
            else:
                all_nodes = _time_nodes(vp, skip_type, t_T, t_0, steps)
                idx = np.cumsum([0] + list(orders))
                outer = all_nodes[idx]
        else:
            k = steps // order
            orders = [order] * k
            outer = _time_nodes(vp, skip_type, t_T, t_0, k)
        for i, o in enumerate(orders):
            s_i, t_i = outer[i], outer[i + 1]
            inner = _time_nodes(vp, skip_type, s_i, t_i, o)
            lam = vp.marginal_lambda(inner)
            h = lam[-1] - lam[0]
            if o == 1:
                x = _first_update(vp, x, s_i, t_i, model_fn(x, s_i), predict_x0)
            elif o == 2:
                r1 = (lam[1] - lam[0]) / h
                x, _, _ = _second_update_s(vp, model_fn, x, s_i, t_i, r1,
                                           predict_x0, solver_type)
            else:
                r1 = (lam[1] - lam[0]) / h
                r2 = (lam[2] - lam[0]) / h
                x, _, _, _ = _third_update_s(vp, model_fn, x, s_i, t_i, r1, r2,
                                             predict_x0, solver_type)
    else:
        raise ValueError(method)
    if denoise_to_zero:
        t0v = jnp.float32(t_0)
        eps = eps_fn(x, jnp.full((b,), vp.model_input_time(t0v), jnp.float32))
        x = (x - vp.marginal_std(t0v) * eps) / vp.marginal_alpha(t0v)
    return x


def dpm_solver_sample_adaptive(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    shape,
    key: jax.Array,
    order: int = 2,
    h_init: float = 0.05,
    atol: float = 0.0078,
    rtol: float = 0.05,
    theta: float = 0.9,
    t_err: float = 1e-5,
    predict_x0: bool = True,
    solver_type: str = "dpm_solver",
    x_T: Optional[jnp.ndarray] = None,
    max_iters: int = 200,
    return_info: bool = False,
):  # -> jnp.ndarray, or (jnp.ndarray, dict) when return_info=True
    """Adaptive step-size solver (dpm_solver_adaptive, dpm_solver.py:909-963):
    embedded lower/higher-order pair, accept when the scaled error E <= 1,
    step h <- min(theta h E^{-1/order}, remaining). return_info=True also
    returns {'converged', 'iterations'} — the max_iters backstop can exit
    with a partially-integrated sample (the reference loops unboundedly)."""
    vp = make_vp_continuous(sched)
    b = shape[0]
    model_fn = _make_model_fn(vp, eps_fn, b, predict_x0)
    t_T, t_0 = 1.0, 1.0 / vp.total_N
    if x_T is None:
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        x = x_T
    lam_0 = vp.marginal_lambda(jnp.float32(t_0))

    def lower_higher(x, s, t):
        if order == 2:
            x_high, model_s, _ = _second_update_s(
                vp, model_fn, x, s, t, 0.5, predict_x0, solver_type)
            x_low = _first_update(vp, x, s, t, model_s, predict_x0)
        elif order == 3:
            x_low, model_s, model_s1 = _second_update_s(
                vp, model_fn, x, s, t, 1.0 / 3.0, predict_x0, solver_type)
            x_high, _, _, _ = _third_update_s(
                vp, model_fn, x, s, t, 1.0 / 3.0, 2.0 / 3.0, predict_x0,
                solver_type, model_s=model_s, model_s1=model_s1)
        else:
            raise ValueError("adaptive solver needs order 2 or 3")
        return x_low, x_high

    def cond(carry):
        _, s, _, _, it = carry
        return jnp.logical_and(jnp.abs(s - t_0) > t_err, it < max_iters)

    def body(carry):
        x, s, h, x_prev, it = carry
        lam_s = vp.marginal_lambda(s)
        t = vp.inverse_lambda(lam_s + h)
        x_low, x_high = lower_higher(x, s, t)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low),
                                                     jnp.abs(x_prev)))
        err = ((x_high - x_low) / delta) ** 2
        E = jnp.max(jnp.sqrt(err.reshape(b, -1).mean(axis=-1)))
        accept = E <= 1.0
        x_new = jnp.where(accept, x_high, x)
        s_new = jnp.where(accept, t, s)
        x_prev_new = jnp.where(accept, x_low, x_prev)
        lam_new = vp.marginal_lambda(s_new)
        h_new = jnp.minimum(theta * h * E ** (-1.0 / order), lam_0 - lam_new)
        return (x_new, s_new, h_new, x_prev_new, it + 1)

    init = (x, jnp.float32(t_T), jnp.float32(h_init), x, jnp.int32(0))
    x, s_final, _, _, it_final = jax.lax.while_loop(cond, body, init)
    if return_info:
        # converged iff the loop exited on the |s - t_0| condition, not the
        # max_iters backstop — an unconverged x is a partial integration
        return x, {"converged": jnp.abs(s_final - t_0) <= t_err,
                   "iterations": it_final}
    return x
