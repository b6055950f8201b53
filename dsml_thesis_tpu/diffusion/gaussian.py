"""Core Gaussian-diffusion math as pure jittable functions.

Parity targets (reference, not copied):
  - q_sample / predict_start_from_noise / q_posterior:
    face_reenactment/ldm/models/diffusion/ddpm.py:252-291
  - p_losses (eps/x0 param., l1/l2, simple+VLB weighting): ddpm.py:293-339, 1014-1045
  - DDPM ancestral p_sample loop: ddpm.py:202-250

All functions take a DiffusionSchedule and explicit PRNG keys; none hold state.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule, extract


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Diffuse x_start to timestep t: sqrt(abar_t) x0 + sqrt(1-abar_t) eps."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def q_posterior(
    sched: DiffusionSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
):
    """Mean/variance/log-variance of q(x_{t-1} | x_t, x_0)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(sched.posterior_variance, t, nd)
    log_var = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


def get_loss(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "l2") -> jnp.ndarray:
    """Elementwise loss map (no reduction), matching reference ddpm.py:278-291."""
    if loss_type == "l1":
        return jnp.abs(target - pred)
    if loss_type == "l2":
        return (target - pred) ** 2
    raise NotImplementedError(f"unknown loss type '{loss_type}'")


def p_losses(
    sched: DiffusionSchedule,
    model_eps: jnp.ndarray,
    x_start: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
    parameterization: str = "eps",
    loss_type: str = "l2",
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
    logvar: Optional[jnp.ndarray] = None,
    sample_weights: Optional[jnp.ndarray] = None,
):
    """Simple + VLB-weighted diffusion loss given the model output.

    Returns (loss, aux dict). `model_eps` is the raw UNet output on
    q_sample(x_start, t, noise); the caller runs the network so this function
    stays architecture-agnostic.

    sample_weights ([B], optional) weights the per-sample means — used by the
    trainer's exact-eval path to mask padding rows in the ragged final
    validation batch (the reference evaluates the full split, ddpm.py:356-363;
    SPMD needs static batch shapes, so the tail is padded + masked instead).
    """
    if parameterization == "eps":
        target = noise
    elif parameterization == "x0":
        target = x_start
    else:
        raise NotImplementedError(parameterization)

    loss_map = get_loss(model_eps, target, loss_type)
    # mean over all non-batch dims
    loss_simple = loss_map.reshape(loss_map.shape[0], -1).mean(axis=1)

    if logvar is not None:
        logvar_t = jnp.take(logvar, t, axis=0)
        loss_gamma = loss_simple / jnp.exp(logvar_t) + logvar_t
    else:
        loss_gamma = loss_simple

    loss_vlb = jnp.take(sched.lvlb_weights, t, axis=0) * loss_simple
    if sample_weights is None:
        wmean = lambda x: x.mean()
    else:
        w = sample_weights.astype(loss_simple.dtype)
        wmean = lambda x: jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)
    loss = l_simple_weight * wmean(loss_gamma) + original_elbo_weight * wmean(loss_vlb)
    aux = {
        "loss_simple": wmean(loss_simple),
        "loss_vlb": wmean(loss_vlb),
        "loss": loss,
    }
    return loss, aux


def ddpm_p_sample_loop(
    sched: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    shape,
    key: jax.Array,
    clip_denoised: bool = True,
    x_T: Optional[jnp.ndarray] = None,
    noise_seq: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full ancestral DDPM sampling as one lax.scan (reference ddpm.py:202-250).

    denoise_fn(x_t, t[batch]) -> eps prediction. x_T / noise_seq ([T, *shape],
    row i used at the i-th reverse step, t = T-1-i) inject the initial and
    per-step noise for parity tests / reproducibility.
    """
    if x_T is None:
        key, sub = jax.random.split(key)
        img = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        img = x_T
    b = shape[0]

    def step(carry, inp):
        img, key = carry
        t_scalar, inj = inp
        key, knoise = jax.random.split(key)
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        eps = denoise_fn(img, t)
        x_recon = predict_start_from_noise(sched, img, t, eps)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean, _, log_var = q_posterior(sched, x_recon, img, t)
        noise = (inj if noise_seq is not None
                 else jax.random.normal(knoise, shape, dtype=jnp.float32))
        # no noise at t == 0
        nonzero = (t_scalar > 0).astype(jnp.float32)
        img = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return (img, key), None

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    inj = (noise_seq if noise_seq is not None
           else jnp.zeros((sched.num_timesteps,) + (1,) * len(shape)))
    (img, _), _ = jax.lax.scan(step, (img, key), (ts, inj))
    return img
