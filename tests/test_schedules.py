"""Golden / analytic tests for diffusion schedules and samplers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsml_thesis_tpu.diffusion import (
    make_beta_schedule,
    make_ddim_timesteps,
    make_strength_ddim_timesteps,
    make_ddim_sampling_parameters,
    make_schedule,
    make_ddim_schedule,
    q_sample,
    predict_start_from_noise,
    q_posterior,
    p_losses,
    ddim_sample,
    ddim_invert,
    ddim_reverse_from,
    stochastic_encode,
    cfg_eps_fn,
)

# The LDM configs in the reference use these chain hyperparameters
# (affectnet-128-ldm-vq-f4.yaml:5-9).
LS, LE, T = 0.0015, 0.0205, 1000


def test_linear_beta_schedule_golden():
    betas = make_beta_schedule("linear", T, linear_start=LS, linear_end=LE)
    assert betas.shape == (T,)
    # endpoints: sqrt-space linear interpolation squared
    assert betas[0] == pytest.approx(LS)
    assert betas[-1] == pytest.approx(LE)
    mid = (np.sqrt(LS) + (np.sqrt(LE) - np.sqrt(LS)) * (500 / 999)) ** 2
    assert betas[500] == pytest.approx(mid, rel=1e-12)
    assert np.all(np.diff(betas) > 0)


def test_cosine_beta_schedule_properties():
    betas = make_beta_schedule("cosine", 100)
    assert betas.shape == (100,)
    assert np.all(betas > 0) and np.all(betas <= 0.999)


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps("uniform", 50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981
    assert np.all(np.diff(ts) == 20)


def test_ddim_timesteps_strength():
    # ddim2.py strength-scaled: 6 steps over the first half of the chain
    ts = make_strength_ddim_timesteps(6, 1000, 0.5)
    assert ts.shape == (6,)
    assert ts[-1] <= 501
    assert ts[0] == 1


def test_ddim_sigma_eta_zero_and_one():
    sched = make_schedule("linear", T, LS, LE)
    acum = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    tsteps = make_ddim_timesteps("uniform", 50, T)
    sig0, a, ap = make_ddim_sampling_parameters(acum, tsteps, eta=0.0)
    assert np.all(sig0 == 0)
    assert np.all(a < ap)  # alpha_bar decreases with t
    sig1, _, _ = make_ddim_sampling_parameters(acum, tsteps, eta=1.0)
    expected = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(sig1, expected, rtol=1e-12)


def test_schedule_buffers_consistency():
    sched = make_schedule("linear", T, LS, LE)
    ac = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod), np.sqrt(ac), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod_prev)[1:], ac[:-1], rtol=1e-6
    )
    assert np.asarray(sched.alphas_cumprod_prev)[0] == 1.0
    # lvlb first weight replaced by second (reference ddpm.py:168)
    lv = np.asarray(sched.lvlb_weights)
    assert lv[0] == lv[1]
    assert np.all(np.isfinite(lv))


def test_q_sample_roundtrip():
    sched = make_schedule("linear", T, LS, LE)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 100, 500, 999])
    xt = q_sample(sched, x0, t, noise)
    x0_rec = predict_start_from_noise(sched, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_q_posterior_at_t1_peaks_on_x0():
    sched = make_schedule("linear", T, LS, LE)
    x0 = jnp.ones((2, 4, 4, 3))
    xt = jnp.zeros_like(x0)
    mean, var, logvar = q_posterior(sched, x0, xt, jnp.array([1, 1]))
    assert mean.shape == x0.shape
    # coef1 + coef2*0 ≈ almost all mass on x0 at small t
    c1 = float(sched.posterior_mean_coef1[1])
    np.testing.assert_allclose(np.asarray(mean), c1 * np.ones_like(mean), rtol=1e-5)


def test_p_losses_eps_zero_when_exact():
    sched = make_schedule("linear", T, LS, LE)
    noise = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 4, 2))
    t = jnp.array([1, 50, 700])
    loss, aux = p_losses(sched, noise, jnp.zeros_like(noise), noise, t)
    assert float(aux["loss_simple"]) == pytest.approx(0.0, abs=1e-12)


def _oracle_eps_fn(sched, x0):
    """Exact eps given the current x_t and true x0: the ideal denoiser."""

    def eps(x, t):
        sa = jnp.take(sched.sqrt_alphas_cumprod, t).reshape(-1, 1, 1, 1)
        sm = jnp.take(sched.sqrt_one_minus_alphas_cumprod, t).reshape(-1, 1, 1, 1)
        return (x - sa * x0) / sm

    return eps


def test_ddim_sample_with_oracle_exact():
    """With the ideal denoiser, eta=0 DDIM lands on the closed-form endpoint.

    The ideal denoiser makes pred_x0 == x0 exactly at every step, and since
    alphas_prev[i] == alphas[i-1] the eps direction is preserved down the
    chain, so x_final = sqrt(abar_1) x0 + sqrt(1-abar_1) eps_init with
    eps_init derived from x_T at the top noise level. Strongest possible
    correctness check of the DDIM update algebra.
    """
    sched = make_schedule("linear", T, LS, LE)
    ddim = make_ddim_schedule(sched, 20, eta=0.0)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    x_T = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    eps = _oracle_eps_fn(sched, x0)
    out = ddim_sample(
        ddim, sched, eps, x0.shape, jax.random.PRNGKey(9), x_T=x_T, eta_noise=False
    )
    a_top = np.asarray(ddim.alphas)[-1]
    eps_init = (np.asarray(x_T) - np.sqrt(a_top) * np.asarray(x0)) / np.sqrt(1 - a_top)
    a_end = np.asarray(ddim.alphas_prev)[0]  # == alphas_cumprod[0]
    expected = np.sqrt(a_end) * np.asarray(x0) + np.sqrt(1 - a_end) * eps_init
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)
    # and it is close to x0 (residual only from the t=1 chain end)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.25)


def test_ddim_invert_then_reverse_is_exact_identity():
    """Reverse DDIM exactly inverts forward DDIM for any t-dependent eps:
    each reverse step at index i is the algebraic inverse of forward step i."""
    sched = make_schedule("linear", T, LS, LE)
    ddim = make_ddim_schedule(sched, 25, eta=0.0)
    x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3))
    direction = jax.random.normal(jax.random.PRNGKey(5), x0.shape)

    def eps(x, t):
        # depends on t only — nontrivial but invertible
        return direction * (1.0 + 0.001 * t.reshape(-1, 1, 1, 1).astype(jnp.float32))

    x_lat = ddim_invert(ddim, eps, x0)
    assert float(jnp.std(x_lat)) > float(jnp.std(x0))
    x_rec = ddim_reverse_from(ddim, eps, x_lat)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x0), atol=1e-4)


def test_stochastic_encode_levels():
    sched = make_schedule("linear", T, LS, LE)
    ddim = make_ddim_schedule(sched, 50, eta=0.0)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.zeros_like(x0)
    enc = stochastic_encode(ddim, x0, jnp.array([49, 49]), noise)
    expected = float(jnp.sqrt(ddim.alphas[49]))
    np.testing.assert_allclose(np.asarray(enc), expected, rtol=1e-6)


def test_cfg_eps_combination():
    # apply_fn returns cond value broadcast; CFG algebra: u + s(c - u)
    def apply_fn(x, t, c):
        return c.reshape(-1, 1, 1, 1) * jnp.ones_like(x)

    cond = jnp.array([2.0])
    uncond = jnp.array([1.0])
    fn = cfg_eps_fn(apply_fn, cond, uncond, scale=3.0)
    x = jnp.zeros((1, 2, 2, 1))
    out = fn(x, jnp.array([5]))
    np.testing.assert_allclose(np.asarray(out), 1.0 + 3.0 * (2.0 - 1.0))


def test_ddim_scan_jits_once():
    sched = make_schedule("linear", 100, LS, LE)
    ddim = make_ddim_schedule(sched, 10, eta=0.0)
    calls = []

    def eps(x, t):
        calls.append(1)
        return jnp.zeros_like(x)

    f = jax.jit(
        lambda key: ddim_sample(ddim, sched, eps, (1, 4, 4, 2), key, eta_noise=False)
    )
    f(jax.random.PRNGKey(0))
    # traced exactly once despite 10 steps — the loop is a lax.scan
    assert len(calls) == 1
