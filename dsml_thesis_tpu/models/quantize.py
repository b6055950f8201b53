"""Vector quantization (straight-through) for the VQGAN first stage.

Parity target: taming/modules/vqvae/quantize.py:213-330 (VectorQuantizer2).
TPU-first: the nearest-codebook search is a single [BHW, D] x [D, K] matmul on
the MXU + argmin, with the |z|^2 / |e|^2 terms fused by XLA. No remap support
(unused by the reference configs).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _nearest_code(flat: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||flat_i - e_k||^2 via one [BHW, D] x [D, K] MXU matmul.

    Shared by the straight-through and EMA quantizers so the distance
    expansion (and its fp32 accumulation guard) cannot drift between them.
    """
    d = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2.0 * jnp.dot(flat, e.T, preferred_element_type=jnp.float32)
        + jnp.sum(e**2, axis=1)[None, :]
    )
    return jnp.argmin(d, axis=1)


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
        # reference init: U(-1/n_e, 1/n_e)
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
        idx = _nearest_code(flat, e)
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


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax vector quantization (taming quantize.py:110-210).

    Training: soft codebook mixture with straight-through hard samples at
    temperature tau; eval: hard argmax. KL-to-uniform regularizer scaled by
    kl_weight.
    """

    n_e: int
    e_dim: int
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    straight_through: bool = True

    @nn.compact
    def __call__(self, z, temp=None, deterministic: bool = True):
        logits = nn.Conv(self.n_e, (1, 1), name="proj")(z)
        embed = self.param(
            "embedding", nn.initializers.normal(1.0), (self.n_e, self.e_dim)
        )
        tau = temp if temp is not None else self.temp_init
        if deterministic:
            # DELIBERATE divergence from the reference: taming's eval path
            # still samples gumbel noise (F.gumbel_softmax hard=True,
            # quantize.py:110-210), so two reference eval runs of the same
            # input can pick different codes near ties. Deterministic argmax
            # is the standard eval behavior and keeps eval reproducible.
            idx = jnp.argmax(logits, axis=-1)
            one_hot = jax.nn.one_hot(idx, self.n_e)
        else:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng("gumbel"), logits.shape,
                                   minval=1e-9, maxval=1.0)
            ))
            soft = jax.nn.softmax((logits + g) / tau, axis=-1)
            idx = jnp.argmax(soft, axis=-1)
            if self.straight_through:
                hard = jax.nn.one_hot(idx, self.n_e)
                one_hot = soft + jax.lax.stop_gradient(hard - soft)
            else:
                one_hot = soft
        z_q = jnp.einsum("...n,nd->...d", one_hot, embed)
        probs = jax.nn.softmax(logits, axis=-1)
        kl = self.kl_weight * jnp.mean(
            jnp.sum(probs * jnp.log(probs * self.n_e + 1e-10), axis=-1)
        )
        # keep the VectorQuantizer contract: latent dtype == input dtype
        # (the f32 embedding would otherwise silently promote bf16 pipelines)
        return z_q.astype(z.dtype), kl, idx


class EMAVectorQuantizer(nn.Module):
    """VQ with exponential-moving-average codebook updates (taming
    quantize.py:361-445): the codebook is a non-trainable variable updated
    from batch statistics, with Laplace-smoothed cluster sizes; the encoder
    still receives the straight-through commitment gradient.

    Under data parallelism the batch statistics (n, dw) are LOCAL to each
    shard; without a cross-device reduction every replica would evolve a
    different codebook. Set `axis_name` to the data mesh axis (the repo
    convention is "data", parallel/mesh.py) when calling under
    pmap/shard_map so the EMA update psums the statistics first."""

    n_e: int
    e_dim: int
    beta: float = 0.25
    decay: float = 0.99
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z, update: bool = False):
        # codebook init from the module's init RNG (a hard-coded key would
        # make every instance/seed share one codebook), plain randn like the
        # reference EmbeddingEMA (quantize.py:290)
        def _guarded(name, init_fn):
            # a variable being (re)created OUTSIDE init means a restore
            # dropped part of the vq_stats collection; silently recreating
            # it would corrupt the codebook on the next EMA update (zeroed
            # cluster_size rescales every code by ~1/(1-decay))
            def _init():
                if not self.is_initializing():
                    raise ValueError(
                        f"EMAVectorQuantizer: 'vq_stats/{name}' missing at "
                        "apply time — restore the FULL vq_stats collection "
                        "from the checkpoint or re-init the module")
                return init_fn()
            return self.variable("vq_stats", name, _init)

        embedding = _guarded(
            "embedding",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (self.n_e, self.e_dim)))
        cluster_size = _guarded("cluster_size",
                                lambda: jnp.zeros((self.n_e,)))
        embed_avg = _guarded("embed_avg",
                             lambda: jnp.array(embedding.value))

        zf = z.astype(jnp.float32)
        flat = zf.reshape(-1, self.e_dim)
        e = embedding.value
        idx = _nearest_code(flat, e)
        one_hot = jax.nn.one_hot(idx, self.n_e)
        z_q = jnp.take(e, idx, axis=0).reshape(zf.shape)

        if update and not self.is_initializing():
            n = jnp.sum(one_hot, axis=0)
            dw = one_hot.T @ flat
            if self.axis_name is not None:
                # global batch statistics: all replicas apply the same EMA
                # step and the codebooks stay bitwise-identical
                n = jax.lax.psum(n, self.axis_name)
                dw = jax.lax.psum(dw, self.axis_name)
            cluster_size.value = (
                self.decay * cluster_size.value + (1 - self.decay) * n
            )
            embed_avg.value = self.decay * embed_avg.value + (1 - self.decay) * dw
            total = jnp.sum(cluster_size.value)
            smoothed = (
                (cluster_size.value + self.eps)
                / (total + self.n_e * self.eps) * total
            )
            embedding.value = embed_avg.value / smoothed[:, None]

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2)
        z_q = zf + jax.lax.stop_gradient(z_q - zf)
        return z_q.astype(z.dtype), loss, idx.reshape(zf.shape[:-1])
