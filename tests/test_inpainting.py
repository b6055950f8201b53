"""Masked-inpainting DDIM path (reference ddim.py:146-149 blend)."""
import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.diffusion import (
    ddim_sample,
    make_ddim_schedule,
    make_schedule,
)


def test_mask_blend_keeps_known_region():
    sched = make_schedule("linear", 1000, 0.0015, 0.0205)
    ddim = make_ddim_schedule(sched, 20, eta=0.0)
    x0 = jnp.ones((1, 8, 8, 2)) * 0.7

    def oracle(x, t):
        sa = jnp.take(sched.sqrt_alphas_cumprod, t).reshape(-1, 1, 1, 1)
        sm = jnp.take(sched.sqrt_one_minus_alphas_cumprod, t).reshape(-1, 1, 1, 1)
        return (x - sa * x0) / sm

    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)  # top half known
    out = ddim_sample(
        ddim, sched, oracle, x0.shape, jax.random.PRNGKey(0),
        mask=mask, x0=x0, eta_noise=False,
    )
    out = np.asarray(out)
    # known region stays near x0 (up to the end-of-chain residual noise level)
    assert np.abs(out[:, :4] - 0.7).mean() < 0.12
    assert np.isfinite(out).all()
