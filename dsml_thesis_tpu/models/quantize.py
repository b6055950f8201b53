"""Vector quantization (straight-through) for the VQGAN first stage.

Parity target: taming/modules/vqvae/quantize.py:213-330 (VectorQuantizer2).
TPU-first: the nearest-codebook search is a single [BHW, D] x [D, K] matmul on
the MXU + argmin, with the |z|^2 / |e|^2 terms fused by XLA. No remap support
(unused by the reference configs).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class VectorQuantizer(nn.Module):
    """Codebook VQ with straight-through estimator and commitment loss.

    legacy=True matches the reference default: loss = ||sg(zq)-z||^2 +
    beta * ||zq - sg(z)||^2 (the "buggy" historical weighting).
    """

    n_e: int
    e_dim: int
    beta: float = 0.25
    legacy: bool = True

    def setup(self):
        init = nn.initializers.uniform(scale=2.0 / self.n_e)
        # reference init: U(-1/n_e, 1/n_e); flax uniform is [0, scale) → shift
        self.embedding = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / self.n_e, 1.0 / self.n_e
            ),
            (self.n_e, self.e_dim),
        )

    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """z: [B, H, W, e_dim] -> (z_q straight-through, vq loss, indices [B,H,W])."""
        zf = z.astype(jnp.float32)
        flat = zf.reshape(-1, self.e_dim)
        e = self.embedding
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * jnp.dot(flat, e.T, preferred_element_type=jnp.float32)
            + jnp.sum(e**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        z_q = jnp.take(e, idx, axis=0).reshape(zf.shape)

        if self.legacy:
            loss = jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2) + self.beta * jnp.mean(
                (z_q - jax.lax.stop_gradient(zf)) ** 2
            )
        else:
            loss = self.beta * jnp.mean(
                (jax.lax.stop_gradient(z_q) - zf) ** 2
            ) + jnp.mean((z_q - jax.lax.stop_gradient(zf)) ** 2)

        z_q = zf + jax.lax.stop_gradient(z_q - zf)  # straight-through
        return z_q.astype(z.dtype), loss, idx.reshape(zf.shape[:-1])

    def get_codebook_entry(self, indices: jnp.ndarray, shape=None) -> jnp.ndarray:
        z_q = jnp.take(self.embedding, indices.reshape(-1), axis=0)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q
