"""DDIM sampling / inversion compiled as single lax.scan loops.

Parity targets (reference, not copied):
  - p_sample_ddim + CFG batch-doubling: face_reenactment/ldm/models/diffusion/ddim.py:164-203
  - masked inpainting blend: ddim.py:146-149
  - stochastic_encode: ddim.py:205-218
  - deterministic DDIM inversion (q_sample_ddim): compute_latents.py:364-407
  - forward-then-reverse latent manipulation: latent_manipulation.py:421-489

Unlike the reference (a Python loop of S CUDA launches), the whole reverse
chain here is one jitted lax.scan: the UNet is traced once and XLA pipelines
the S steps back-to-back on-chip with no host round-trips.

`eps_fn(x, t) -> eps` is the model closure; conditioning and CFG are composed
outside via `cfg_eps_fn`, so the scan body stays generic across the 1-cond /
2-cond / 4-cond model families.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .gaussian import q_sample
from .schedules import DDIMSchedule, DiffusionSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def cfg_eps_fn(
    apply_fn: Callable,
    cond,
    uncond,
    scale: float,
) -> EpsFn:
    """Classifier-free guidance closure.

    apply_fn(x, t, cond) -> eps. `cond`/`uncond` are arbitrary pytrees of
    per-batch conditioning tensors (token streams / concat channels). With
    scale == 1 or uncond None, a single conditional pass is used; otherwise
    batch-doubling like the reference (MXU-friendly: one 2B-batch UNet call).
    """
    if uncond is None or scale == 1.0:
        return lambda x, t: apply_fn(x, t, cond)

    c_in = jax.tree.map(lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)

    def eps(x, t):
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        out = apply_fn(x_in, t_in, c_in)
        e_uncond, e_cond = jnp.split(out, 2, axis=0)
        return e_uncond + scale * (e_cond - e_uncond)

    return eps


def p_sample_ddim(
    ddim: DDIMSchedule,
    eps_fn: EpsFn,
    x: jnp.ndarray,
    index: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    x0_postprocess: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One reverse DDIM step at schedule position `index` (traced scalar ok).

    x0_postprocess(pred_x0) -> pred_x0 is applied between the x0 prediction
    and the x_prev update — the reference's quantize_denoised hook, which
    snaps pred_x0 through the VQ codebook each step (ddim.py:186-187)."""
    b = x.shape[0]
    t = jnp.full((b,), jnp.take(ddim.timesteps, index), dtype=jnp.int32)
    e_t = eps_fn(x, t)

    a_t = jnp.take(ddim.alphas, index)
    a_prev = jnp.take(ddim.alphas_prev, index)
    sigma_t = jnp.take(ddim.sigmas, index)
    sqrt_1m_at = jnp.take(ddim.sqrt_one_minus_alphas, index)

    pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
    if x0_postprocess is not None:
        pred_x0 = x0_postprocess(pred_x0)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
    if noise is None:
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    else:
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * temperature * noise
    return x_prev, pred_x0


def ddim_sample(
    ddim: DDIMSchedule,
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    shape,
    key: jax.Array,
    x_T: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    eta_noise: bool = True,
    x0_postprocess: Optional[Callable] = None,
) -> jnp.ndarray:
    """Full DDIM reverse chain as one lax.scan (replaces ddim.py:112-162 loop)."""
    if mask is not None and x0 is None:
        raise ValueError("inpainting mask requires x0 (reference ddim.py:145)")
    if x_T is None:
        key, sub = jax.random.split(key)
        img = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        img = x_T
    S = ddim.num_steps
    b = shape[0]

    def step(carry, i):
        img, key = carry
        index = S - 1 - i
        if mask is not None:
            # inpainting: re-noise the known region to the current level
            key, kq = jax.random.split(key)
            t = jnp.full((b,), jnp.take(ddim.timesteps, index), dtype=jnp.int32)
            img_orig = q_sample(sched, x0, t, jax.random.normal(kq, x0.shape))
            img = img_orig * mask + (1.0 - mask) * img
        if eta_noise:
            key, kn = jax.random.split(key)
            noise = jax.random.normal(kn, img.shape, dtype=jnp.float32)
        else:
            noise = None
        img, _ = p_sample_ddim(ddim, eps_fn, img, index, noise=noise,
                               temperature=temperature,
                               x0_postprocess=x0_postprocess)
        return (img, key), None

    (img, _), _ = jax.lax.scan(step, (img, key), jnp.arange(S))
    return img


def ddim_sample_with_intermediates(
    ddim: DDIMSchedule,
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    shape,
    key: jax.Array,
    x_T: Optional[jnp.ndarray] = None,
    log_every: int = 1,
):
    """Like ddim_sample (eta=0) but also returns the pred_x0 trajectory
    [S//log_every, B, ...] for denoise-row visualization (reference
    ImageLogger / _get_denoise_row_from_list, ddpm.py:533-545)."""
    if x_T is None:
        key, sub = jax.random.split(key)
        img = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        img = x_T
    S = ddim.num_steps

    def step(img, i):
        index = S - 1 - i
        img, pred_x0 = p_sample_ddim(ddim, eps_fn, img, index, noise=None)
        return img, pred_x0

    img, traj = jax.lax.scan(step, img, jnp.arange(S))
    # reference ImageLogger keeps index % log_every_t == 0 plus the first
    # step (ddim.py:159) — traj is stacked by loop step i, where
    # index = S-1-i, so select those positions (always including the final,
    # cleanest pred_x0 at i = S-1)
    keep = sorted({i for i in range(S) if (S - 1 - i) % log_every == 0}
                  | {0, S - 1})
    return img, traj[jnp.asarray(keep)]


def ddim_invert(
    ddim: DDIMSchedule,
    eps_fn: EpsFn,
    x0: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic forward DDIM (inversion) over the whole sub-schedule.

    Step i moves x from noise level alphas_prev[i] to alphas[i], evaluating the
    model at t = timesteps[i] — exactly the reference's q_sample_ddim chain
    (compute_latents.py:364-407), vectorized into a scan.
    """
    b = x0.shape[0]
    S = ddim.num_steps

    def step(x, i):
        t = jnp.full((b,), jnp.take(ddim.timesteps, i), dtype=jnp.int32)
        e_t = eps_fn(x, t)
        a_t = jnp.take(ddim.alphas_prev, i)
        a_next = jnp.take(ddim.alphas, i)
        sqrt_1m_at = jnp.take(ddim.sqrt_one_minus_alphas_prev, i)
        pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
        x_next = jnp.sqrt(a_next) * pred_x0 + jnp.sqrt(1.0 - a_next) * e_t
        return x_next, None

    x, _ = jax.lax.scan(step, x0, jnp.arange(S))
    return x


def ddim_reverse_from(
    ddim: DDIMSchedule,
    eps_fn: EpsFn,
    x_lat: jnp.ndarray,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Reverse chain from a given noised latent; deterministic (eta=0)
    unless `rng` is given, which adds the per-step sigma-scaled noise (the
    reference lipread tune decodes with ddim_eta=1.0, ddpm2condtune.py:533).

    Used by latent manipulation / DiffusionCLIP-tuned sampling
    (latent_manipulation_tuned.py:492-543). Differentiable: jax.grad flows
    through the scan, replacing the reference's hand-rolled
    differentiable_p_sample_ddim (ddim2.py:252-290).
    """
    S = ddim.num_steps

    def step(img, i):
        index = S - 1 - i
        noise = (jax.random.normal(jax.random.fold_in(rng, i), img.shape,
                                   dtype=img.dtype)
                 if rng is not None else None)
        img, _ = p_sample_ddim(ddim, eps_fn, img, index, noise=noise)
        return img, None

    img, _ = jax.lax.scan(step, x_lat, jnp.arange(S))
    return img


def latent_manipulation(
    ddim: DDIMSchedule,
    eps_fn_src: EpsFn,
    eps_fn_trg: EpsFn,
    x0: jnp.ndarray,
):
    """Forward DDIM with source cond, reverse with target cond.

    Returns (edited latent, inverted latent) — latent_manipulation.py:421-489.
    """
    x_lat = ddim_invert(ddim, eps_fn_src, x0)
    x_edit = ddim_reverse_from(ddim, eps_fn_trg, x_lat)
    return x_edit, x_lat


def stochastic_encode(
    ddim: DDIMSchedule,
    x0: jnp.ndarray,
    t_index: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Noise x0 to DDIM sub-schedule position t_index (ddim.py:205-218)."""
    nd = x0.ndim
    sa = jnp.take(jnp.sqrt(ddim.alphas), t_index).reshape((-1,) + (1,) * (nd - 1))
    sm = jnp.take(ddim.sqrt_one_minus_alphas, t_index).reshape((-1,) + (1,) * (nd - 1))
    return sa * x0 + sm * noise
