"""Multi-chip video sampling: speakers sharded over the 8-device mesh.

Validates the v5e-8 deployment story — progressive synthesis is data-parallel
across chips (each chip's speakers run independently; params replicated)."""
import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.diffusion import (
    make_ddim_schedule,
    make_schedule,
    progressive_video_sample,
)
from dsml_thesis_tpu.parallel import make_mesh, replicate, shard_batch


def test_progressive_sampling_sharded_over_mesh():
    assert jax.device_count() == 8
    mesh = make_mesh()
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    ddim = make_ddim_schedule(sched, 3, eta=0.0)

    B, F, h, c, D = 8, 2, 4, 2, 8
    w = jnp.eye(c) * 0.1  # tiny "model" weight, replicated

    def apply_fn(wp, x, t, ctx, cc):
        return x @ wp + 0.01 * jnp.mean(cc, axis=-1, keepdims=True)

    masked = jax.random.normal(jax.random.PRNGKey(0), (B, F, h, h, c))
    ctxs = jax.random.normal(jax.random.PRNGKey(1), (B, F, 1, D))
    z_id0 = jax.random.normal(jax.random.PRNGKey(2), (B, h, h, c))

    def synth(wp, masked, ctxs, z_id0, key):
        return progressive_video_sample(
            ddim, lambda x, t, ctx, cc: apply_fn(wp, x, t, ctx, cc),
            masked, ctxs, z_id0, key,
        )

    # single-device reference
    ref = synth(w, masked, ctxs, z_id0, jax.random.PRNGKey(3))

    # sharded over the mesh
    wp = replicate(mesh, w)
    sb = shard_batch(mesh, {"m": masked, "c": ctxs, "z": z_id0})
    out = jax.jit(synth)(wp, sb["m"], sb["c"], sb["z"], jax.random.PRNGKey(3))
    # batch stays sharded across the 8 devices
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
