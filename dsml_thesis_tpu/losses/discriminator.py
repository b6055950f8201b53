"""PatchGAN discriminator + GAN losses for VQGAN first-stage training.

Parity targets: taming/modules/discriminator/model.py (NLayerDiscriminator,
normal(0, 0.02) conv init, BatchNorm), taming/modules/losses/vqperceptual.py
hinge_d_loss/vanilla_d_loss, and the warmup gate adopt_weight
(ldm/modules/losses/vqperceptual.py:21-24).

TPU note (intentional divergence): BatchNorm is replaced by GroupNorm (batch
statistics would otherwise need cross-replica sync over the data mesh;
GroupNorm is the standard drop-in for patch discriminators and keeps the step
fully SPMD). Reference discriminator weights therefore do not convert — the
discriminator is a training-time auxiliary that is retrained from scratch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _conv_init():
    return nn.initializers.normal(stddev=0.02)


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    input_nc: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    kernel_init=_conv_init(), name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for i in range(1, self.n_layers):
            nf = min(2**i, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=1,
                        use_bias=False, kernel_init=_conv_init(),
                        name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=_groups_for(self.ndf * nf), name=f"norm{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=1,
                    use_bias=False, kernel_init=_conv_init(),
                    name=f"conv{self.n_layers}")(h)
        h = nn.GroupNorm(num_groups=_groups_for(self.ndf * nf), name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1,
                       kernel_init=_conv_init(), name="conv_out")(h)


def _groups_for(channels: int, cap: int = 32) -> int:
    """Largest group count <= cap that divides `channels` — the reference's
    BatchNorm has no divisibility constraint, so ndf values like 24 (48, 96
    channels) must not crash the GroupNorm substitute."""
    g = min(cap, channels)
    while channels % g:
        g -= 1
    return g


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(nn.softplus(-logits_real)) + jnp.mean(nn.softplus(logits_fake))
    )


def adopt_weight(weight: float, global_step, threshold: int = 0, value: float = 0.0):
    """Gate a loss weight until global_step >= threshold (jit-safe)."""
    return jnp.where(global_step < threshold, value, weight)


def adaptive_d_weight(nll_fn, gan_fn, decode_from_last, last_kernel,
                      disc_weight: float) -> jnp.ndarray:
    """Reference calculate_adaptive_weight (ldm/modules/losses/
    vqperceptual.py:85-95, contperceptual.py:32-44):
    d_w = ||∂nll/∂last|| / (||∂gan/∂last|| + 1e-4), clamped to [0, 1e4],
    times disc_weight, stop-gradded.

    JAX formulation shared by the VQ and KL losses: ONE decoder forward
    from the final conv kernel (`decode_from_last(last_kernel) -> rec`)
    plus two cotangent pullbacks — instead of two independent jax.grad
    traces that each re-run the decoder. nll_fn/gan_fn map reconstructions
    to the respective scalar losses."""
    rec2, pullback = jax.vjp(decode_from_last, last_kernel)
    nll_cot = jax.grad(nll_fn)(rec2)
    gan_cot = jax.grad(gan_fn)(rec2)
    (nll_g,) = pullback(nll_cot)
    (gan_g,) = pullback(gan_cot)
    d_weight = jnp.linalg.norm(nll_g.ravel()) / (
        jnp.linalg.norm(gan_g.ravel()) + 1e-4
    )
    return jax.lax.stop_gradient(jnp.clip(d_weight, 0.0, 1e4) * disc_weight)


def measure_perplexity(indices: jnp.ndarray, n_embed: int):
    onehot = jax.nn.one_hot(indices.reshape(-1), n_embed)
    avg = onehot.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    cluster_use = jnp.sum(avg > 0)
    return perplexity, cluster_use
