"""PLMS and DPM-Solver++ correctness vs the ideal denoiser / DDIM."""
import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.diffusion import (
    ddim_sample,
    dpm_solver_sample,
    make_ddim_schedule,
    make_dpm_schedule,
    make_schedule,
    plms_sample,
)

LS, LE, T = 0.0015, 0.0205, 1000


def _oracle(sched, x0):
    def eps(x, t):
        sa = jnp.take(sched.sqrt_alphas_cumprod, t).reshape(-1, 1, 1, 1)
        sm = jnp.take(sched.sqrt_one_minus_alphas_cumprod, t).reshape(-1, 1, 1, 1)
        return (x - sa * x0) / sm

    return eps


def test_plms_with_oracle_converges_to_x0():
    sched = make_schedule("linear", T, LS, LE)
    ddim = make_ddim_schedule(sched, 20, eta=0.0)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    x_T = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    out = plms_sample(ddim, _oracle(sched, x0), x0.shape, jax.random.PRNGKey(2),
                      x_T=x_T)
    # same end-of-chain residual as DDIM (chain ends at t=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.25)
    err = float(jnp.abs(out - x0).mean())
    assert err < 0.06


def test_dpm_solver_with_oracle_converges_to_x0():
    sched = make_schedule("linear", T, LS, LE)
    dpm = make_dpm_schedule(sched, 10)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    x_T = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    out = dpm_solver_sample(dpm, _oracle(sched, x0), x0.shape,
                            jax.random.PRNGKey(2), x_T=x_T)
    # with the ideal denoiser every update is exact, so the eps direction is
    # preserved: final = a_end x0 + s_end * (x_T - a_top x0)/s_top
    a = np.asarray(dpm.alphas)
    s = np.asarray(dpm.sigmas)
    eps0 = (np.asarray(x_T) - a[0] * np.asarray(x0)) / s[0]
    expected = a[-1] * np.asarray(x0) + s[-1] * eps0
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.25)


def test_dpm_solver_beats_ddim_at_low_steps():
    """With a smooth nonlinear model, 2nd-order DPM-Solver++ at 6 steps should
    land closer to its 50-step self than DDIM-6 does to DDIM-50."""
    sched = make_schedule("linear", T, LS, LE)
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3)) * 0.3

    def eps(x, t):
        tt = t.reshape(-1, 1, 1, 1).astype(jnp.float32) / T
        return jnp.tanh(x @ w) * (1 - 0.5 * tt)

    shape = (1, 8, 8, 3)
    x_T = jax.random.normal(jax.random.PRNGKey(6), shape)

    ref = dpm_solver_sample(make_dpm_schedule(sched, 50), eps, shape,
                            jax.random.PRNGKey(7), x_T=x_T)
    dpm6 = dpm_solver_sample(make_dpm_schedule(sched, 6), eps, shape,
                             jax.random.PRNGKey(7), x_T=x_T)
    ddim_ref = ddim_sample(make_ddim_schedule(sched, 50), sched, eps, shape,
                           jax.random.PRNGKey(7), x_T=x_T, eta_noise=False)
    ddim6 = ddim_sample(make_ddim_schedule(sched, 6), sched, eps, shape,
                        jax.random.PRNGKey(7), x_T=x_T, eta_noise=False)
    err_dpm = float(jnp.abs(dpm6 - ref).mean())
    err_ddim = float(jnp.abs(ddim6 - ddim_ref).mean())
    assert err_dpm < err_ddim


def test_plms_jittable_with_traced_schedule():
    # regression: the eta==0 guard used to concretize ddim.sigmas, raising
    # TracerConversionError when the schedule rides a jit boundary
    sched = make_schedule(timesteps=20, linear_start=LS, linear_end=LE)
    ddim = make_ddim_schedule(sched, 5, eta=0.0)
    shape = (1, 4, 4, 2)
    eps = lambda x, t: x * 0.1

    out_eager = plms_sample(ddim, eps, shape, jax.random.PRNGKey(0))
    out_jit = jax.jit(
        lambda d: plms_sample(d, eps, shape, jax.random.PRNGKey(0))
    )(ddim)
    np.testing.assert_allclose(np.asarray(out_eager), np.asarray(out_jit),
                               rtol=1e-5, atol=1e-6)
