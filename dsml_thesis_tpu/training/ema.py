"""EMA of parameters as a pure pytree transform.

Parity target: face_reenactment/ldm/modules/ema.py:5-82 (LitEma): shadow
buffers with warmup decay min(decay, (1+updates)/(10+updates)), plus the
store/copy/restore pattern — which in functional JAX is simply "use
ema_params instead of params", no swapping needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, num_updates, decay: float = 0.9999):
    """One EMA step; num_updates is the count *after* this optimizer step."""
    d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    # keep each leaf's dtype: the f32 decay factor would silently promote
    # bf16 shadows (doubling EMA memory and breaking carry/restore dtypes)
    return jax.tree.map(
        lambda e, p: (e - (1.0 - d) * (e - p)).astype(e.dtype),
        ema_params, params,
    )
