"""VQGAN training loss: pixel + LPIPS + adaptive-weight PatchGAN.

Parity target: ldm/modules/losses/vqperceptual.py:43-170
(VQLPIPSWithDiscriminator): generator pass (optimizer_idx 0) uses
nll = pixel + w_p * lpips, g_loss = -mean(D(rec)), with the adaptive weight
d_w = ||∂nll/∂last|| / (||∂g/∂last|| + 1e-4) clamped to 1e4 and the disc_start
warmup gate; discriminator pass (optimizer_idx 1) trains hinge/vanilla loss on
detached images.

JAX formulation: the adaptive weight takes gradients w.r.t. the decoder's
final conv kernel via two jax.grad calls through a caller-provided
`decode_from_last(last_kernel) -> reconstructions` closure — equivalent to the
reference's autograd.grad on `last_layer` (vqperceptual.py:85-95).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .discriminator import (
    NLayerDiscriminator,
    adaptive_d_weight,
    adopt_weight,
    hinge_d_loss,
    vanilla_d_loss,
)
from .lpips import LPIPS


@dataclasses.dataclass
class VQGANLoss:
    disc_start: int
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_ndf: int = 64
    disc_loss: str = "hinge"
    pixel_loss: str = "l1"

    def __post_init__(self):
        assert self.disc_loss in ("hinge", "vanilla")
        assert self.pixel_loss in ("l1", "l2")
        self.discriminator = NLayerDiscriminator(
            ndf=self.disc_ndf, n_layers=self.disc_num_layers,
            input_nc=self.disc_in_channels,
        )
        self.lpips = LPIPS() if self.perceptual_weight > 0 else None
        self._d_loss = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss

    def init_params(self, key, image_shape) -> Dict:
        k1, k2 = jax.random.split(key)
        x = jnp.zeros(image_shape)
        params = {"discriminator": self.discriminator.init(k1, x)["params"]}
        if self.lpips is not None:
            params["lpips"] = self.lpips.init(k2, x, x)["params"]
        return params

    def _pixel(self, a, b):
        return jnp.abs(a - b) if self.pixel_loss == "l1" else (a - b) ** 2

    def nll_loss(self, loss_params: Dict, inputs, reconstructions) -> jnp.ndarray:
        rec = self._pixel(inputs, reconstructions)
        if self.lpips is not None:
            p = self.lpips.apply({"params": loss_params["lpips"]},
                                 inputs, reconstructions)
            rec = rec + self.perceptual_weight * p.reshape(-1, 1, 1, 1)
        return jnp.mean(rec)

    def generator_loss(
        self,
        loss_params: Dict,
        codebook_loss: jnp.ndarray,
        inputs: jnp.ndarray,
        reconstructions: jnp.ndarray,
        global_step,
        decode_from_last: Optional[Callable] = None,
        last_kernel: Optional[jnp.ndarray] = None,
        val: bool = False,
    ):
        """optimizer_idx == 0. Returns (loss, log). val=True matches the
        reference's validation behavior: without a last-layer grad path the
        adaptive weight is 0 there (calculate_adaptive_weight's RuntimeError
        branch), so val aeloss excludes the GAN term."""
        nll = self.nll_loss(loss_params, inputs, reconstructions)
        logits_fake = self.discriminator.apply(
            {"params": loss_params["discriminator"]}, reconstructions
        )
        g_loss = -jnp.mean(logits_fake)

        if not val and decode_from_last is not None and last_kernel is not None:
            d_weight = adaptive_d_weight(
                lambda r: self.nll_loss(loss_params, inputs, r),
                lambda r: -jnp.mean(
                    self.discriminator.apply(
                        {"params": loss_params["discriminator"]}, r
                    )
                ),
                decode_from_last, last_kernel, self.disc_weight,
            )
        elif not val and self.disc_factor > 0.0:
            # training with the GAN enabled but no last-layer grad path:
            # silently substituting a CONSTANT weight (or 0) would train a
            # different objective than the reference's always-adaptive one
            raise ValueError(
                "generator_loss needs decode_from_last/last_kernel during "
                "training (the adaptive d_weight is not optional while "
                "disc_factor > 0)")
        else:
            # validation (reference calculate_adaptive_weight raises there
            # -> d_weight 0, GAN term excluded), or disc_factor == 0
            d_weight = jnp.asarray(0.0)

        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        loss = nll + d_weight * disc_factor * g_loss + self.codebook_weight * jnp.mean(
            codebook_loss
        )
        log = {
            "total_loss": loss, "quant_loss": jnp.mean(codebook_loss),
            "nll_loss": nll, "d_weight": d_weight,
            "disc_factor": disc_factor, "g_loss": g_loss,
        }
        return loss, log

    def discriminator_loss(
        self, loss_params: Dict, inputs, reconstructions, global_step
    ):
        """optimizer_idx == 1. Returns (loss, log)."""
        logits_real = self.discriminator.apply(
            {"params": loss_params["discriminator"]},
            jax.lax.stop_gradient(inputs),
        )
        logits_fake = self.discriminator.apply(
            {"params": loss_params["discriminator"]},
            jax.lax.stop_gradient(reconstructions),
        )
        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        d_loss = disc_factor * self._d_loss(logits_real, logits_fake)
        log = {
            "disc_loss": d_loss,
            "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake),
        }
        return d_loss, log
