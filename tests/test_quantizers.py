"""Gumbel and EMA vector-quantizer variants."""
import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.models import EMAVectorQuantizer, GumbelQuantizer


def test_gumbel_quantizer_train_and_eval():
    m = GumbelQuantizer(n_e=16, e_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4))
    params = m.init(
        {"params": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)},
        z, deterministic=False,
    )
    zq, kl, idx = m.apply(params, z, deterministic=False,
                          rngs={"gumbel": jax.random.PRNGKey(3)})
    assert zq.shape == z.shape and idx.shape == (2, 4, 4)
    assert np.isfinite(float(kl))
    # eval: deterministic argmax, grads not needed
    zq2, _, idx2 = m.apply(params, z, deterministic=True)
    zq3, _, idx3 = m.apply(params, z, deterministic=True)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx3))
    # straight-through: gradient flows to the encoder input
    g = jax.grad(
        lambda z: jnp.sum(m.apply(params, z, deterministic=False,
                                  rngs={"gumbel": jax.random.PRNGKey(4)})[0])
    )(z)
    assert float(jnp.abs(g).max()) > 0


def test_ema_quantizer_updates_codebook():
    m = EMAVectorQuantizer(n_e=8, e_dim=4, decay=0.5)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 4)) * 2
    vars0 = m.init(jax.random.PRNGKey(1), z)
    (zq, loss, idx), new_vars = m.apply(
        vars0, z, update=True, mutable=["vq_stats"]
    )
    assert zq.shape == z.shape
    # codebook moved toward data
    before = np.asarray(vars0["vq_stats"]["embedding"])
    after = np.asarray(new_vars["vq_stats"]["embedding"])
    assert np.abs(after - before).max() > 0
    # straight-through gradient
    g = jax.grad(lambda z: jnp.sum(m.apply(vars0, z)[0]))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0)
    # no update when update=False
    (_, _, _), same_vars = m.apply(vars0, z, update=False, mutable=["vq_stats"])
    np.testing.assert_array_equal(
        np.asarray(same_vars["vq_stats"]["embedding"]), before
    )

def test_ema_quantizer_partial_restore_raises():
    """A restore that drops ANY vq_stats variable must fail loudly: silently
    re-initializing cluster_size/embed_avg corrupts the codebook on the next
    EMA update (zeroed history rescales every code by ~1/(1-decay))."""
    import pytest

    m = EMAVectorQuantizer(n_e=8, e_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 4))
    vars0 = m.init(jax.random.PRNGKey(1), z)
    partial = {"vq_stats": {"embedding": vars0["vq_stats"]["embedding"]}}
    with pytest.raises(ValueError, match="cluster_size"):
        m.apply(partial, z, update=True, mutable=["vq_stats"])


def test_ema_quantizer_axis_name_keeps_replicas_identical():
    """With axis_name set, the EMA update psums the batch statistics so
    every data-parallel replica applies the same codebook step; the result
    must equal a single-device update on the concatenated batch."""
    from functools import partial

    n_dev = jax.local_device_count()
    if n_dev < 2:
        import pytest
        pytest.skip("needs >=2 devices")

    m = EMAVectorQuantizer(n_e=8, e_dim=4, decay=0.5, axis_name="data")
    z = jax.random.normal(jax.random.PRNGKey(0), (n_dev, 4, 2, 2, 4)) * 2
    m1 = EMAVectorQuantizer(n_e=8, e_dim=4, decay=0.5)
    vars0 = m1.init(jax.random.PRNGKey(1), z[0])

    @partial(jax.pmap, axis_name="data")
    def step(vars_, zshard):
        _, new = m.apply(vars_, zshard, update=True, mutable=["vq_stats"])
        return new["vq_stats"]["embedding"]

    rep = jax.device_put_replicated(vars0, jax.local_devices())
    emb = np.asarray(step(rep, z))
    # every replica identical
    for i in range(1, n_dev):
        np.testing.assert_array_equal(emb[i], emb[0])
    # equals the single-device update on the full batch
    _, ref = m1.apply(vars0, z.reshape(-1, 2, 2, 4), update=True,
                      mutable=["vq_stats"])
    np.testing.assert_allclose(
        emb[0], np.asarray(ref["vq_stats"]["embedding"]), rtol=1e-6, atol=1e-6)


def test_gumbel_quantizer_preserves_input_dtype():
    """GumbelQuantizer honors the VectorQuantizer contract: latent dtype ==
    input dtype (bf16 in -> bf16 out, no silent f32 promotion)."""
    m = GumbelQuantizer(n_e=16, e_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4))
    params = m.init(
        {"params": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)},
        z, deterministic=False,
    )
    zq, _, _ = m.apply(params, z.astype(jnp.bfloat16), deterministic=True)
    assert zq.dtype == jnp.bfloat16
