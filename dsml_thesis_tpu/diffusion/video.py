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

from ..flags import env_flag
from .ddim import DDIMSchedule, p_sample_ddim
from .schedules import DiffusionSchedule

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
    x_T: Optional[jnp.ndarray] = None,  # [B, F, h, w, c] injected init noise
    pair_apply_fn: Optional[ApplyFn] = None,
    sampler: str = "ddim",
    sched: Optional[DiffusionSchedule] = None,
    sampler_steps: int = 20,
    sampler_order: int = 2,
) -> jnp.ndarray:
    """Generate all frames; returns latents [B, F, h, w, c].

    CFG swaps only the crossattn branch (reference ddim2cond.py:165-169); the
    concat branch (masked + identity latents) is shared between both branches,
    so the batch-doubled UNet call concatenates them identically.

    x_T injects each frame's initial noise (parity tests / reproducibility —
    the reference draws torch.randn per frame, :306); default PRNG-per-frame.

    sampler="ddim" (default) is the reference-faithful per-frame reverse
    chain (progressive_sampling_difftalk.py:287-296 runs DDIM). sampler="dpm"
    swaps each frame's chain for DPM-Solver++ multistep (the suite the
    reference vendors in ldm/models/diffusion/dpm_solver — oracle-locked in
    tests/test_dpm_suite.py) at `sampler_steps` model evals of order
    `sampler_order`: a fewer-steps serving mode on the SAME trained model.
    Requires `sched` (the full training DiffusionSchedule); per-frame init
    noise, CFG (incl. the pair-dedup prefix), and the autoregressive identity
    carry are identical to the DDIM path.
    """
    if sampler not in ("ddim", "dpm"):
        raise ValueError(f"unknown sampler {sampler!r} (want 'ddim' or 'dpm')")
    if sampler == "dpm" and sched is None:
        raise ValueError("sampler='dpm' needs the full DiffusionSchedule "
                         "(pass sched=ldm.schedule)")
    if sampler == "dpm" and sampler_order not in (1, 2, 3):
        # the suite's lax.switch would silently clamp an out-of-range order
        # to the nearest branch, mislabeling what actually ran
        raise ValueError(f"sampler_order must be 1, 2, or 3 "
                         f"(got {sampler_order})")

    B, F = masked_latents.shape[:2]
    S = ddim.num_steps
    lat_shape = z_id0.shape

    use_cfg = uncond_contexts is not None and guidance_scale != 1.0
    # CFG batch-pair prefix dedup (exact — both halves share x_t/t/concat;
    # see models/unet.py cfg_pairs). Default ON since the round-3k on-chip
    # A/B: headline 6.968 vs 6.663 (+4.6%), dh64 7.605 vs 7.252, fullattn
    # 3.420 vs 3.396, fidelity gate unchanged at 46.56 dB. DSML_CFG_DEDUP=0
    # is the kill switch (reverts to the stock batch-doubled CFG).
    import dataclasses

    dedup = (pair_apply_fn is not None
             and env_flag("DSML_CFG_DEDUP", True))

    # Opt-in bf16 DDIM step math + scan carry (A/B lever; fidelity-gated via
    # scripts/fidelity_gate.py — the default keeps the eps-combine and x_prev
    # algebra in fp32). The latent tensors are tiny (B*64*64*3), so this
    # targets VPU/fusion time, not bandwidth.
    bf16_step = (env_flag("DSML_BF16_STEP", False)
                 and sampler == "ddim")  # dpm step math stays fp32
    carry_dtype = jnp.bfloat16 if bf16_step else jnp.float32
    if bf16_step:
        ddim = dataclasses.replace(ddim, **{
            f.name: (getattr(ddim, f.name).astype(jnp.bfloat16)
                     if f.name != "timesteps" else ddim.timesteps)
            for f in dataclasses.fields(ddim)
        })

    def frame_step(z_id, per_frame):
        m_lat, ctx, uctx, kf, xT_f = per_frame
        concat = jnp.concatenate([m_lat, z_id], axis=-1)  # [B, h, w, 2c]

        if use_cfg and dedup:
            # CFG pair dedup: both halves share x, t, and the concat latents
            # (the stock batch-doubled path below builds its cc_in as
            # literally [concat; concat]) — hand the UNet the B-batch inputs
            # plus the 2B context pair and let it compute the
            # pre-cross-attention prefix once (models/unet.py cfg_pairs)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)

            def eps_fn(x, t):
                out = pair_apply_fn(x, t, ctx_in, concat)
                e_u, e_c = jnp.split(out, 2, axis=0)
                return e_u + guidance_scale * (e_c - e_u)
        elif use_cfg:
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

        img = (xT_f if x_T is not None
               else jax.random.normal(kf, lat_shape, dtype=jnp.float32))
        img = img.astype(carry_dtype)
        step_eps = ((lambda x, t: eps_fn(x, t).astype(jnp.bfloat16))
                    if bf16_step else eps_fn)

        if sampler == "dpm":
            from .dpm_solver import dpm_solver_sample_suite
            img = dpm_solver_sample_suite(
                sched, step_eps, lat_shape, kf,
                steps=sampler_steps, order=sampler_order,
                method="multistep", predict_x0=True, x_T=img,
            )
        else:
            def ddim_step(img, i):
                index = S - 1 - i
                img, _ = p_sample_ddim(ddim, step_eps, img, index, noise=None)
                return img.astype(carry_dtype), None

            img, _ = jax.lax.scan(ddim_step, img, jnp.arange(S))
        # autoregressive identity update (reference :316-317)
        return img, img

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
        jnp.moveaxis(x_T.astype(jnp.float32), 1, 0) if x_T is not None
        else jnp.zeros((F, 1, 1, 1, 1)),
    )
    # carry dtype matches the step math (fp32 default); z_id0 may arrive
    # bf16 from a cast first stage
    _, frames = jax.lax.scan(frame_step, z_id0.astype(carry_dtype), xs)
    return jnp.moveaxis(frames, 0, 1)  # [B, F, h, w, c]


def audio_windows(audio_feats: jnp.ndarray, num_frames: int,
                  window: int) -> jnp.ndarray:
    """Per-frame audio windows [B, F, 2w+1, D] from clip features [B, T, D],
    edge-clamped (reference MEADBase3 window slicing, custom.py:388-397)."""
    T = audio_feats.shape[1]
    idx = jnp.clip(
        jnp.arange(num_frames)[:, None] + jnp.arange(-window, window + 1),
        0, T - 1,
    )
    return audio_feats[:, idx]


def make_video_pipeline(ldm, ddim: DDIMSchedule, audio_window: int,
                        guidance_scale: float = 1.0, decode: bool = True,
                        sampler: str = "ddim", sampler_steps: int = 20,
                        sampler_order: int = 2):
    """The FULL talking-face synthesis pipeline as one jittable function.

    Everything the reference does per frame (progressive_sampling_difftalk.py
    :287-296) happens inside the compiled program: masked-frame VQ encodes
    (batched over B*F), identity encode, audio-window conditioning, class/null
    embeddings, the nested frame ⊃ DDIM scan, and per-frame VQGAN decode.

    pipeline(params, masked_frames[B,F,H,W,3], audio_feats[B,T,D],
             identity[B,H,W,3], class_label[B], key) -> [B,F,H,W,3] images
    (or latents when decode=False).

    sampler="dpm" swaps the per-frame DDIM chain for DPM-Solver++ multistep
    at `sampler_steps` model evals (see progressive_video_sample) — the
    fewer-steps serving mode; `ddim` still sets the chain when sampler="ddim".
    """

    def pipeline(params, masked_frames, audio_feats, identity, class_label,
                 key, x_T=None):
        # x_T [B, F, h, w, c]: optional per-frame init noise override (torch
        # A/B parity, scripts/parity_e2e.py); None draws from `key` as usual
        B, F = masked_frames.shape[:2]
        m_lat = ldm.encode_first_stage(
            params, masked_frames.reshape((B * F,) + masked_frames.shape[2:])
        )
        m_lat = m_lat.reshape((B, F) + m_lat.shape[1:])
        z_id0 = ldm.encode_first_stage(params, identity)

        windows = audio_windows(audio_feats, F, audio_window)
        bf_batch = {
            "class_label": jnp.repeat(class_label, F),
            "audio": windows.reshape((B * F,) + windows.shape[2:]),
        }
        ctx = ldm.encode_crossattn_tokens(params, bf_batch)
        ctxs = ctx.reshape((B, F) + ctx.shape[1:])
        use_cfg = guidance_scale != 1.0
        uctxs = None
        if use_cfg:
            uctx = ldm.encode_crossattn_tokens(params, bf_batch, null=True)
            uctxs = uctx.reshape((B, F) + uctx.shape[1:])

        apply_fn = lambda x, t, c, cc: ldm.apply_model(
            params, x, t, {"crossattn": c, "concat": cc}
        )
        # the dedup path bypasses the patch-tiled apply_model, so configs
        # with split_input_params fall back to the stock batch-doubled CFG
        pair_fn = None if ldm.split_input_params is not None else (
            lambda x, t, c, cc: ldm.apply_model(
                params, x, t, {"crossattn": c, "concat": cc}, cfg_pairs=True
            )
        )
        frames = progressive_video_sample(
            ddim, apply_fn, m_lat, ctxs, z_id0, key,
            uncond_contexts=uctxs, guidance_scale=guidance_scale,
            pair_apply_fn=pair_fn, x_T=x_T,
            sampler=sampler, sched=ldm.schedule,
            sampler_steps=sampler_steps, sampler_order=sampler_order,
        )
        if not decode:
            return frames
        dec = lambda z: ldm.decode_first_stage(params, z)
        return jnp.clip(jax.vmap(dec, in_axes=1, out_axes=1)(frames), -1.0, 1.0)

    return pipeline
