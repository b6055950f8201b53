"""Frame-autoregressive talking-face video synthesis as one compiled program.

Parity target: talking_face/progressive_sampling_difftalk.py:245-319 —
per frame: conditionings (class ⊕ audio-window crossattn; masked-frame +
running-identity latent channel concat), full DDIM reverse chain, then the
generated latent becomes the next frame's identity latent (:316-317).

TPU-first restructuring (this loop is the north-star benchmark):
  - ALL per-frame masked-frame VQ encodes and audio-window encodings are
    hoisted out of the loop (the reference re-encodes inside the per-frame
    Python loop at bs=1).
  - The frame loop is a lax.scan (carry = identity latent) nested over the
    DDIM-step scan — one XLA computation for the entire clip, zero host
    round-trips.
  - A leading batch axis carries independent speakers/clips through the same
    scan for chip utilization (the reference runs bs=1).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ddim import DDIMSchedule, p_sample_ddim

ApplyFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# apply_fn(x_noisy, t, context, concat) -> eps


def progressive_video_sample(
    ddim: DDIMSchedule,
    apply_fn: ApplyFn,
    masked_latents: jnp.ndarray,   # [B, F, h, w, c] VQ latents of mouth-masked frames
    contexts: jnp.ndarray,         # [B, F, L, D] crossattn tokens per frame
    z_id0: jnp.ndarray,            # [B, h, w, c] initial identity latent
    key: jax.Array,
    uncond_contexts: Optional[jnp.ndarray] = None,  # [B, F, L, D]
    guidance_scale: float = 1.0,
) -> jnp.ndarray:
    """Generate all frames; returns latents [B, F, h, w, c].

    CFG swaps only the crossattn branch (reference ddim2cond.py:165-169); the
    concat branch (masked + identity latents) is shared between both branches,
    so the batch-doubled UNet call concatenates them identically.
    """
    B, F = masked_latents.shape[:2]
    S = ddim.num_steps
    lat_shape = z_id0.shape

    use_cfg = uncond_contexts is not None and guidance_scale != 1.0

    def frame_step(carry, per_frame):
        z_id, key = carry
        m_lat, ctx, uctx, kf = per_frame
        concat = jnp.concatenate([m_lat, z_id], axis=-1)  # [B, h, w, 2c]

        if use_cfg:
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            cc_in = jnp.concatenate([concat, concat], axis=0)

            def eps_fn(x, t):
                x_in = jnp.concatenate([x, x], axis=0)
                t_in = jnp.concatenate([t, t], axis=0)
                out = apply_fn(x_in, t_in, ctx_in, cc_in)
                e_u, e_c = jnp.split(out, 2, axis=0)
                return e_u + guidance_scale * (e_c - e_u)
        else:
            def eps_fn(x, t):
                return apply_fn(x, t, ctx, concat)

        img = jax.random.normal(kf, lat_shape, dtype=jnp.float32)

        def ddim_step(img, i):
            index = S - 1 - i
            img, _ = p_sample_ddim(ddim, eps_fn, img, index, noise=None)
            return img, None

        img, _ = jax.lax.scan(ddim_step, img, jnp.arange(S))
        # autoregressive identity update (reference :316-317)
        return (img, key), img

    frame_keys = jax.random.split(key, F)
    uc = (
        jnp.moveaxis(uncond_contexts, 1, 0)
        if uncond_contexts is not None
        else jnp.zeros((F, 1, 1, 1))
    )
    xs = (
        jnp.moveaxis(masked_latents, 1, 0),  # [F, B, h, w, c]
        jnp.moveaxis(contexts, 1, 0),        # [F, B, L, D]
        uc,
        frame_keys,
    )
    (_, _), frames = jax.lax.scan(frame_step, (z_id0, key), xs)
    return jnp.moveaxis(frames, 0, 1)  # [B, F, h, w, c]
