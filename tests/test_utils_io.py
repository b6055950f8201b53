"""Surgical checkpoint loading + denoise-trajectory sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.diffusion import (
    ddim_sample_with_intermediates,
    make_ddim_schedule,
    make_schedule,
)
from dsml_thesis_tpu.utils_io import surgical_load


def test_surgical_load_ignore_and_only():
    template = {
        "unet": {"a": jnp.zeros(2), "b": jnp.zeros(2)},
        "cond": {"c": jnp.zeros(2)},
    }
    loaded = {
        "unet": {"a": jnp.ones(2), "b": jnp.ones(2)},
        "cond": {"c": jnp.ones(2)},
        "extra": {"z": jnp.ones(2)},  # dropped
    }
    out = surgical_load(template, loaded, ignore_keys=["unet/b"])
    np.testing.assert_allclose(np.asarray(out["unet"]["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["unet"]["b"]), 0.0)  # ignored
    np.testing.assert_allclose(np.asarray(out["cond"]["c"]), 1.0)
    assert "extra" not in out

    only = surgical_load(template, loaded, only=["unet"])
    np.testing.assert_allclose(np.asarray(only["unet"]["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(only["cond"]["c"]), 0.0)  # not in only

    missing = surgical_load(template, {"unet": {"a": jnp.ones(2)}})
    np.testing.assert_allclose(np.asarray(missing["unet"]["b"]), 0.0)  # kept fresh


def test_denoise_trajectory():
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    ddim = make_ddim_schedule(sched, 8, eta=0.0)
    eps = lambda x, t: 0.1 * x
    final, traj = ddim_sample_with_intermediates(
        ddim, sched, eps, (2, 4, 4, 3), jax.random.PRNGKey(0), log_every=2
    )
    assert final.shape == (2, 4, 4, 3)
    # uniform discretization may round the step count up (reference semantics)
    expected = -(-ddim.num_steps // 2)
    assert traj.shape == (expected, 2, 4, 4, 3)
    assert np.isfinite(np.asarray(traj)).all()
