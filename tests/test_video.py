"""Progressive video sampler: shapes, autoregressive identity chaining, CFG."""
import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.diffusion import (
    make_ddim_schedule,
    make_schedule,
    progressive_video_sample,
)


def _setup(B=2, F=3, h=4, c=2, L=1, D=8, steps=4):
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    ddim = make_ddim_schedule(sched, steps, eta=0.0)
    key = jax.random.PRNGKey(0)
    masked = jax.random.normal(key, (B, F, h, h, c))
    ctxs = jax.random.normal(jax.random.PRNGKey(1), (B, F, L, D))
    z_id0 = jax.random.normal(jax.random.PRNGKey(2), (B, h, h, c))
    return ddim, masked, ctxs, z_id0


def test_shapes_and_determinism():
    ddim, masked, ctxs, z_id0 = _setup()

    def apply_fn(x, t, ctx, cc):
        # eps depends on the concat streams -> output depends on identity latent
        return 0.1 * jnp.mean(cc, axis=-1, keepdims=True) * jnp.ones_like(x)

    out1 = progressive_video_sample(ddim, apply_fn, masked, ctxs, z_id0,
                                    jax.random.PRNGKey(3))
    out2 = progressive_video_sample(ddim, apply_fn, masked, ctxs, z_id0,
                                    jax.random.PRNGKey(3))
    assert out1.shape == masked.shape
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_identity_latent_chains_across_frames():
    ddim, masked, ctxs, z_id0 = _setup()

    def apply_fn(x, t, ctx, cc):
        return 0.2 * jnp.mean(cc, axis=-1, keepdims=True) * jnp.ones_like(x)

    out_a = progressive_video_sample(ddim, apply_fn, masked, ctxs, z_id0,
                                     jax.random.PRNGKey(3))
    out_b = progressive_video_sample(ddim, apply_fn, masked, ctxs, z_id0 + 1.0,
                                     jax.random.PRNGKey(3))
    d = np.abs(np.asarray(out_a) - np.asarray(out_b)).reshape(out_a.shape[1], -1).max(1) \
        if out_a.shape[0] == 1 else np.abs(np.asarray(out_a) - np.asarray(out_b)).max(axis=(0, 2, 3, 4))
    # frame 0 differs (direct dependence) and later frames differ (chained)
    assert d[0] > 0 and d[-1] > 0


def test_cfg_branch_changes_output():
    ddim, masked, ctxs, z_id0 = _setup()

    def apply_fn(x, t, ctx, cc):
        return 0.1 * jnp.mean(ctx, axis=(1, 2))[:, None, None, None] * jnp.ones_like(x)

    uctxs = jnp.zeros_like(ctxs)
    no_cfg = progressive_video_sample(ddim, apply_fn, masked, ctxs, z_id0,
                                      jax.random.PRNGKey(3))
    cfg = progressive_video_sample(ddim, apply_fn, masked, ctxs, z_id0,
                                   jax.random.PRNGKey(3),
                                   uncond_contexts=uctxs, guidance_scale=3.0)
    assert np.abs(np.asarray(no_cfg) - np.asarray(cfg)).max() > 1e-5


def test_full_pipeline_matches_manual_assembly():
    """make_video_pipeline (everything in-graph) == hand-assembled encode →
    progressive_video_sample → decode (the CLI's round-1 shape)."""
    import os
    import sys
    import yaml

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ldm import TINY_MEAD_CFG

    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.diffusion import audio_windows, make_video_pipeline

    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    B, F, w = 2, 3, 2  # seq_len 5 -> window 2
    init_batch = {
        "image": jnp.zeros((B, 16, 16, 3)),
        "masked_image": jnp.zeros((B, 16, 16, 3)),
        "identity": jnp.zeros((B, 16, 16, 3)),
        "class_label": jnp.array([1, 5]),
        "audio": jnp.zeros((B, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), init_batch)

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    masked = jax.random.normal(ks[0], (B, F, 16, 16, 3)) * 0.3
    # audio longer than F: tail frames' windows must see real future audio
    audio = jax.random.normal(ks[1], (B, F + w, 32))
    identity = jax.random.normal(ks[2], (B, 16, 16, 3)) * 0.3
    labels = jnp.array([1, 5], jnp.int32)
    key = jax.random.PRNGKey(7)

    ddim = make_ddim_schedule(ldm.schedule, 4, eta=0.0)
    pipe = make_video_pipeline(ldm, ddim, w, guidance_scale=2.0)
    out = jax.jit(pipe)(params, masked, audio, identity, labels, key)
    assert out.shape == (B, F, 16, 16, 3)

    # manual assembly (scripts/progressive_sampling.py round-1 shape)
    m_lat = ldm.encode_first_stage(params, masked.reshape(B * F, 16, 16, 3))
    m_lat = m_lat.reshape(B, F, 8, 8, 3)
    z_id0 = ldm.encode_first_stage(params, identity)
    win = audio_windows(audio, F, w)
    np.testing.assert_array_equal(  # edge clamping
        np.asarray(win[0, 0, 0]), np.asarray(audio[0, 0]))
    np.testing.assert_array_equal(  # future audio beyond F is used
        np.asarray(win[0, F - 1, -1]), np.asarray(audio[0, F - 1 + w]))
    ctxs, uctxs = [], []
    for t in range(F):
        bt = {"class_label": labels, "audio": win[:, t]}
        ctxs.append(ldm.encode_crossattn_tokens(params, bt))
        uctxs.append(ldm.encode_crossattn_tokens(params, bt, null=True))
    ctxs, uctxs = jnp.stack(ctxs, 1), jnp.stack(uctxs, 1)
    apply_fn = lambda x, t, c, cc: ldm.apply_model(
        params, x, t, {"crossattn": c, "concat": cc})
    frames = progressive_video_sample(
        ddim, apply_fn, m_lat, ctxs, z_id0, key,
        uncond_contexts=uctxs, guidance_scale=2.0)
    dec = lambda z: ldm.decode_first_stage(params, z)
    ref = jnp.clip(jax.vmap(dec, in_axes=1, out_axes=1)(frames), -1, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cfg_dedup_matches_stock_pipeline(monkeypatch):
    """DSML_CFG_DEDUP=1 (UNet computes the shared pre-cross-attention prefix
    once per CFG pair, models/unet.py cfg_pairs) produces the same frames as
    the stock batch-doubled CFG: the two halves share x_t, t, and the concat
    latents, so tiling at the divergence is exact."""
    import os
    import sys
    import yaml

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ldm import TINY_MEAD_CFG

    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.diffusion import make_video_pipeline

    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    B, F, w = 2, 3, 2
    init_batch = {
        "image": jnp.zeros((B, 16, 16, 3)),
        "masked_image": jnp.zeros((B, 16, 16, 3)),
        "identity": jnp.zeros((B, 16, 16, 3)),
        "class_label": jnp.array([1, 5]),
        "audio": jnp.zeros((B, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), init_batch)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    masked = jax.random.normal(ks[0], (B, F, 16, 16, 3)) * 0.3
    audio = jax.random.normal(ks[1], (B, F + w, 32))
    identity = jax.random.normal(ks[2], (B, 16, 16, 3)) * 0.3
    labels = jnp.array([1, 5], jnp.int32)
    key = jax.random.PRNGKey(7)

    ddim = make_ddim_schedule(ldm.schedule, 4, eta=0.0)
    pipe = make_video_pipeline(ldm, ddim, w, guidance_scale=2.0)

    monkeypatch.setenv("DSML_CFG_DEDUP", "0")  # pin base: default is ON
    base = jax.jit(pipe)(params, masked, audio, identity, labels, key)
    monkeypatch.setenv("DSML_CFG_DEDUP", "1")
    pipe_d = make_video_pipeline(ldm, ddim, w, guidance_scale=2.0)
    dedup = jax.jit(pipe_d)(params, masked, audio, identity, labels, key)
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_xattn_1tok_matches_stock_pipeline(monkeypatch):
    """DSML_XATTN_1TOK=1 (single-token cross-attention as an exact broadcast,
    models/unet.py CrossAttention) reproduces the stock pipeline's frames —
    the MEAD c12 context is one token, so every cross-attention block in the
    whole 50-step chain rides the shortcut. Also checked composed with the
    CFG pair dedup (both default-path levers must stack exactly)."""
    import os
    import sys
    import yaml

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ldm import TINY_MEAD_CFG

    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.diffusion import make_video_pipeline

    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    B, F, w = 2, 3, 2
    init_batch = {
        "image": jnp.zeros((B, 16, 16, 3)),
        "masked_image": jnp.zeros((B, 16, 16, 3)),
        "identity": jnp.zeros((B, 16, 16, 3)),
        "class_label": jnp.array([1, 5]),
        "audio": jnp.zeros((B, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), init_batch)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    masked = jax.random.normal(ks[0], (B, F, 16, 16, 3)) * 0.3
    audio = jax.random.normal(ks[1], (B, F + w, 32))
    identity = jax.random.normal(ks[2], (B, 16, 16, 3)) * 0.3
    labels = jnp.array([1, 5], jnp.int32)
    key = jax.random.PRNGKey(7)

    ddim = make_ddim_schedule(ldm.schedule, 4, eta=0.0)
    pipe = make_video_pipeline(ldm, ddim, w, guidance_scale=2.0)

    monkeypatch.setenv("DSML_XATTN_1TOK", "0")
    base = jax.jit(pipe)(params, masked, audio, identity, labels, key)
    monkeypatch.setenv("DSML_XATTN_1TOK", "1")
    fast = jax.jit(make_video_pipeline(ldm, ddim, w, guidance_scale=2.0))(
        params, masked, audio, identity, labels, key)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               atol=1e-5, rtol=1e-5)

    monkeypatch.setenv("DSML_CFG_DEDUP", "0")
    no_dedup = jax.jit(make_video_pipeline(ldm, ddim, w, guidance_scale=2.0))(
        params, masked, audio, identity, labels, key)
    np.testing.assert_allclose(np.asarray(no_dedup), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_dpm_sampler_matches_manual_frame_loop():
    """sampler='dpm' (per-frame DPM-Solver++ multistep inside the frame scan)
    == a hand loop calling dpm_solver_sample_suite per frame with the same
    per-frame init noise, stock batch-doubled CFG, and the autoregressive
    identity carry."""
    from dsml_thesis_tpu.diffusion import make_schedule
    from dsml_thesis_tpu.diffusion.dpm_solver import dpm_solver_sample_suite

    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    ddim, masked, ctxs, z_id0 = _setup()
    B, F = masked.shape[:2]
    uctxs = jnp.zeros_like(ctxs)
    gs = 2.0

    def apply_fn(x, t, ctx, cc):
        return (0.1 * jnp.mean(cc, axis=-1, keepdims=True)
                + 0.05 * jnp.mean(ctx, axis=(1, 2))[:, None, None, None]
                ) * jnp.ones_like(x)

    key = jax.random.PRNGKey(9)
    out = progressive_video_sample(
        ddim, apply_fn, masked, ctxs, z_id0, key,
        uncond_contexts=uctxs, guidance_scale=gs,
        sampler="dpm", sched=sched, sampler_steps=3, sampler_order=2)
    assert out.shape == masked.shape

    frame_keys = jax.random.split(key, F)
    z_id = z_id0.astype(jnp.float32)
    frames = []
    for f in range(F):
        concat = jnp.concatenate([masked[:, f], z_id], axis=-1)
        ctx_in = jnp.concatenate([uctxs[:, f], ctxs[:, f]], axis=0)
        cc_in = jnp.concatenate([concat, concat], axis=0)

        def eps_fn(x, t, ctx_in=ctx_in, cc_in=cc_in):
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            e = apply_fn(x_in, t_in, ctx_in, cc_in)
            e_u, e_c = jnp.split(e, 2, axis=0)
            return e_u + gs * (e_c - e_u)

        img0 = jax.random.normal(frame_keys[f], z_id0.shape, jnp.float32)
        z_id = dpm_solver_sample_suite(
            sched, eps_fn, z_id0.shape, frame_keys[f],
            steps=3, order=2, method="multistep", predict_x0=True, x_T=img0)
        frames.append(z_id)
    ref = jnp.stack(frames, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dpm_pipeline_plumbing_and_errors():
    """make_video_pipeline(sampler='dpm') compiles end-to-end on the tiny
    MEAD config and differs from the DDIM chain; bad sampler args raise."""
    import os
    import sys
    import yaml

    import pytest

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ldm import TINY_MEAD_CFG

    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.diffusion import make_video_pipeline

    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    B, F, w = 2, 2, 2
    init_batch = {
        "image": jnp.zeros((B, 16, 16, 3)),
        "masked_image": jnp.zeros((B, 16, 16, 3)),
        "identity": jnp.zeros((B, 16, 16, 3)),
        "class_label": jnp.array([1, 5]),
        "audio": jnp.zeros((B, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), init_batch)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    masked = jax.random.normal(ks[0], (B, F, 16, 16, 3)) * 0.3
    audio = jax.random.normal(ks[1], (B, F + w, 32))
    identity = jax.random.normal(ks[2], (B, 16, 16, 3)) * 0.3
    labels = jnp.array([1, 5], jnp.int32)
    key = jax.random.PRNGKey(7)

    ddim = make_ddim_schedule(ldm.schedule, 4, eta=0.0)
    dpm_pipe = make_video_pipeline(ldm, ddim, w, guidance_scale=2.0,
                                   sampler="dpm", sampler_steps=3)
    out = jax.jit(dpm_pipe)(params, masked, audio, identity, labels, key)
    assert out.shape == (B, F, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    ddim_pipe = make_video_pipeline(ldm, ddim, w, guidance_scale=2.0)
    base = jax.jit(ddim_pipe)(params, masked, audio, identity, labels, key)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-6

    with pytest.raises(ValueError, match="unknown sampler"):
        progressive_video_sample(ddim, lambda *a: a[0], masked[:, :, :, :, :3],
                                 jnp.zeros((B, F, 1, 8)), identity[:, :8, :8, :3],
                                 key, sampler="plms")
    with pytest.raises(ValueError, match="needs the full DiffusionSchedule"):
        progressive_video_sample(ddim, lambda *a: a[0], masked[:, :, :, :, :3],
                                 jnp.zeros((B, F, 1, 8)), identity[:, :8, :8, :3],
                                 key, sampler="dpm")
    # out-of-range orders must raise, not silently run the nearest lax.switch
    # branch under a mislabeled metric name
    with pytest.raises(ValueError, match="sampler_order must be 1, 2, or 3"):
        progressive_video_sample(ddim, lambda *a: a[0], masked[:, :, :, :, :3],
                                 jnp.zeros((B, F, 1, 8)), identity[:, :8, :8, :3],
                                 key, sampler="dpm", sched=ldm.schedule,
                                 sampler_order=4)


def test_unet_cfg_pairs_matches_batch_doubling():
    """UNetModel(cfg_pairs=True) == the stock call on the tiled pair, for a
    UNet whose first attention sits one level down (a real shared prefix)."""
    from dsml_thesis_tpu.models.unet import UNetModel

    unet = UNetModel(
        in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        context_dim=8, transformer_depth=1,
    )
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 6))
    t = jnp.array([3, 7], jnp.int32)
    ctx_pair = jax.random.normal(jax.random.PRNGKey(1), (2 * B, 4, 8))
    params = unet.init(jax.random.PRNGKey(2), x, t, ctx_pair[:B])["params"]

    stock = unet.apply({"params": params},
                       jnp.concatenate([x, x], 0),
                       jnp.concatenate([t, t], 0), ctx_pair)
    paired = unet.apply({"params": params}, x, t, ctx_pair, cfg_pairs=True)
    assert paired.shape == stock.shape
    np.testing.assert_allclose(np.asarray(paired), np.asarray(stock),
                               atol=1e-5, rtol=1e-5)


def test_cfg_dedup_falls_back_for_split_input(monkeypatch):
    """split_input_params configs bypass the dedup (the patch-tiled
    apply_model has no cfg_pairs path): with the dedup DEFAULT ON the video
    pipeline must silently use the stock batch-doubled CFG, not raise."""
    import copy
    import os
    import sys
    import yaml

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ldm import TINY_MEAD_CFG

    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.diffusion import make_video_pipeline

    cfg = yaml.safe_load(TINY_MEAD_CFG)
    cfg = copy.deepcopy(cfg)
    cfg["model"]["params"]["split_input_params"] = {
        "ks": [8, 8], "stride": [8, 8], "vqf": 2,
    }
    ldm = build_model(cfg["model"])
    assert ldm.split_input_params is not None
    B, F, w = 2, 2, 2
    init_batch = {
        "image": jnp.zeros((B, 16, 16, 3)),
        "masked_image": jnp.zeros((B, 16, 16, 3)),
        "identity": jnp.zeros((B, 16, 16, 3)),
        "class_label": jnp.array([1, 5]),
        "audio": jnp.zeros((B, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), init_batch)
    masked = jax.random.normal(jax.random.PRNGKey(1), (B, F, 16, 16, 3)) * 0.3
    audio = jax.random.normal(jax.random.PRNGKey(2), (B, F + w, 32))
    identity = jnp.zeros((B, 16, 16, 3))
    labels = jnp.array([1, 5], jnp.int32)

    monkeypatch.setenv("DSML_CFG_DEDUP", "1")
    ddim = make_ddim_schedule(ldm.schedule, 2, eta=0.0)
    pipe = make_video_pipeline(ldm, ddim, w, guidance_scale=2.0)
    out = jax.jit(pipe)(params, masked, audio, identity, labels,
                        jax.random.PRNGKey(3))
    assert out.shape == (B, F, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
