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
