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
