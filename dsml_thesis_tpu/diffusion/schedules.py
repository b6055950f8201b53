"""Diffusion noise schedules and DDIM sub-schedules as pure functions.

Behavioral parity targets (reference, not copied):
  - beta schedules: face_reenactment/ldm/modules/diffusionmodules/util.py:21-43
  - DDIM timestep selection: util.py:46-60
  - DDIM sigma/alpha derivation: util.py:63-76
  - DDPM buffer derivation: face_reenactment/ldm/models/diffusion/ddpm.py:117-170
  - strength-scaled DDIM timesteps (DiffusionCLIP editing):
    face_reenactment/ldm/models/diffusion/ddim2.py:9-29

Everything here is computed once at setup time in float64 numpy (matching the
reference's float64 beta generation) and packed into a frozen pytree of float32
jnp arrays that samplers gather from inside jit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule in float64, matching CompVis LDM semantics."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str,
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
) -> np.ndarray:
    """DDIM timestep subsequence (1-indexed into the ddpm chain, like the reference)."""
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.arange(0, num_ddpm_timesteps, c)
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(
            f"There is no ddim discretization method called '{ddim_discr_method}'"
        )
    # +1 so the final alpha lands on the value that scales all the way to data.
    # Clamp: the reference's unchecked +1 indexes out of bounds whenever the
    # top selected step is exactly T-1 (e.g. T=100, S=3); harmless to cap.
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


def make_strength_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
    strength: float,
) -> np.ndarray:
    """Strength-scaled uniform DDIM subsequence used by the DiffusionCLIP-style
    editing stack: only the first `strength` fraction of the chain is
    traversed, discretized into num_ddim_timesteps steps.

    Every live reference copy (ddim2.py:9-29 and the private samplers in
    compute_latents.py:54-75 / latent_manipulation(_tuned).py:52-72) uses the
    LINSPACE discretization with the first step pinned to 1 — the arange+1
    variant is commented-out dead code there. steps_out = [1] + linspace ends
    the forward chain exactly at t = T*strength."""
    ts = np.linspace(0, 1, num_ddim_timesteps) * int(num_ddpm_timesteps * strength)
    ts = np.asarray([int(s) for s in ts], dtype=np.int64)
    ts[0] = 1
    return ts


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """Per-DDIM-step (sigma, alpha_bar, alpha_bar_prev) triples."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate([alphacums[:1], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999):
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All DDPM chain quantities as float32 device arrays (a frozen pytree).

    Mirrors the buffers registered in reference ddpm.py:117-170 so that every
    sampler / loss can gather per-timestep scalars with jnp.take inside jit.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    beta_schedule: str = "linear",
    timesteps: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
    given_betas: Optional[np.ndarray] = None,
    v_posterior: float = 0.0,
    parameterization: str = "eps",
) -> DiffusionSchedule:
    if given_betas is not None:
        betas = np.asarray(given_betas, dtype=np.float64)
    else:
        betas = make_beta_schedule(
            beta_schedule, timesteps, linear_start=linear_start,
            linear_end=linear_end, cosine_s=cosine_s,
        )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (1 - v_posterior) * betas * (
        1.0 - alphas_cumprod_prev
    ) / (1.0 - alphas_cumprod) + v_posterior * betas

    if parameterization == "eps":
        # posterior_variance[0] == 0 → inf at index 0, overwritten below
        with np.errstate(divide="ignore"):
            lvlb_weights = betas**2 / (
                2 * posterior_variance * alphas * (1 - alphas_cumprod)
            )
    elif parameterization == "x0":
        lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
    else:
        raise NotImplementedError("mu not supported")
    lvlb_weights = np.asarray(lvlb_weights)
    lvlb_weights[0] = lvlb_weights[1]

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        lvlb_weights=f32(lvlb_weights),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed per-step DDIM quantities, ordered by ascending ddpm timestep.

    Samplers scan over the *index* axis; every per-step scalar is a static-shape
    gather, keeping the whole reverse loop inside one XLA computation.
    """

    timesteps: jnp.ndarray        # int32 [S] — ddpm timesteps fed to the model
    alphas: jnp.ndarray           # [S] alpha_bar at t
    alphas_prev: jnp.ndarray      # [S] alpha_bar at previous step
    sqrt_one_minus_alphas: jnp.ndarray       # [S]
    sqrt_one_minus_alphas_prev: jnp.ndarray  # [S] (used by deterministic inversion)
    sigmas: jnp.ndarray           # [S] eta-scaled sigma

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def make_ddim_schedule(
    schedule: DiffusionSchedule,
    num_steps: int,
    eta: float = 0.0,
    method: str = "uniform",
    strength: Optional[float] = None,
) -> DDIMSchedule:
    alphacums = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    n = schedule.num_timesteps
    if strength is not None and strength >= 1.0:
        # full chain: the strength maker's final step would index alphas[T];
        # centralizes the guard the reference scripts apply at call sites
        # (compute_latents.py main)
        strength = None
    if strength is None:
        tsteps = make_ddim_timesteps(method, num_steps, n)
    else:
        tsteps = make_strength_ddim_timesteps(num_steps, n, strength)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(alphacums, tsteps, eta)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDIMSchedule(
        timesteps=jnp.asarray(tsteps, dtype=jnp.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        sqrt_one_minus_alphas_prev=f32(np.sqrt(1.0 - alphas_prev)),
        sigmas=f32(sigmas),
    )


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-batch scalars from a 1-D schedule array and broadcast to ndim.

    Equivalent of reference util.py:99-102 extract_into_tensor, NHWC-agnostic.
    """
    out = jnp.take(a, t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - 1))
