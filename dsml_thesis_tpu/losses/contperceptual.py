"""KL autoencoder training loss: pixel + LPIPS NLL with learnable logvar,
KL regularizer, and adaptive-weight PatchGAN.

Parity target: face_reenactment/ldm/modules/losses/contperceptual.py:7-99
(LPIPSWithDiscriminator). Semantics that differ from the VQ variant
(losses/vqperceptual.py here):
  - reconstruction NLL is rec/exp(logvar) + logvar, reduced as sum()/batch
    (NOT mean — contperceptual.py:58-60), so kl_weight is calibrated against
    a per-sample summed NLL;
  - a KL(posterior || N(0,1)) term weighted by kl_weight
    (contperceptual.py:61-62);
  - logvar is declared as a trainable scalar upstream, but the reference's
    AutoencoderKL.configure_optimizers (ldm/models/autoencoder.py:387-396)
    never adds loss.logvar to either optimizer, so it stays frozen at
    logvar_init in every reference run. We mirror that: logvar lives in the
    loss params and is not updated by default; pass train_logvar=True to the
    trainer to actually optimize it.

The adaptive GAN weight (reference calculate_adaptive_weight,
contperceptual.py:32-44) pulls both last-layer gradients back through ONE
shared decoder forward via jax.vjp.
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
class KLAutoencoderLoss:
    disc_start: int
    logvar_init: float = 0.0
    kl_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_ndf: int = 64
    disc_loss: str = "hinge"

    def __post_init__(self):
        assert self.disc_loss in ("hinge", "vanilla")
        self.discriminator = NLayerDiscriminator(
            ndf=self.disc_ndf, n_layers=self.disc_num_layers,
            input_nc=self.disc_in_channels,
        )
        self.lpips = LPIPS() if self.perceptual_weight > 0 else None
        self._d_loss = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss

    def init_params(self, key, image_shape) -> Dict:
        k1, k2 = jax.random.split(key)
        x = jnp.zeros(image_shape)
        params = {
            "discriminator": self.discriminator.init(k1, x)["params"],
            "logvar": jnp.asarray(self.logvar_init, jnp.float32),
        }
        if self.lpips is not None:
            params["lpips"] = self.lpips.init(k2, x, x)["params"]
        return params

    def _rec_tensor(self, loss_params: Dict, inputs, reconstructions):
        """|x - rec| + w_p * lpips, elementwise (contperceptual.py:48-51).
        pixelloss_weight is deliberately NOT applied: the reference stores
        pixel_weight but never multiplies it in (dead parameter) — applying
        it here would diverge from any reference run with the field set."""
        rec = jnp.abs(inputs - reconstructions)
        if self.lpips is not None:
            p = self.lpips.apply({"params": loss_params["lpips"]},
                                 inputs, reconstructions)
            rec = rec + self.perceptual_weight * p.reshape(-1, 1, 1, 1)
        return rec

    def _nll_from_rec(self, loss_params: Dict, rec) -> jnp.ndarray:
        """sum(rec/exp(logvar) + logvar) / batch (contperceptual.py:49-60)."""
        logvar = loss_params["logvar"]
        nll = rec / jnp.exp(logvar) + logvar
        return jnp.sum(nll) / rec.shape[0]

    def nll_loss(self, loss_params: Dict, inputs, reconstructions) -> jnp.ndarray:
        rec = self._rec_tensor(loss_params, inputs, reconstructions)
        return self._nll_from_rec(loss_params, rec)

    def generator_loss(
        self,
        loss_params: Dict,
        kl: jnp.ndarray,
        inputs: jnp.ndarray,
        reconstructions: jnp.ndarray,
        global_step,
        decode_from_last: Optional[Callable] = None,
        last_kernel: Optional[jnp.ndarray] = None,
        val: bool = False,
    ):
        """optimizer_idx == 0 (contperceptual.py:64-93). kl is the
        per-sample posterior KL vector (DiagonalGaussian.kl()). val=True
        forces d_weight to 0 regardless of the decode hooks, matching the
        reference's validation path (the adaptive weight's autograd call
        raises outside training there)."""
        # one rec tensor feeds both the NLL and the logged rec_loss mean —
        # the LPIPS VGG16 forward (the dominant cost) runs exactly once
        rec = self._rec_tensor(loss_params, inputs, reconstructions)
        nll = self._nll_from_rec(loss_params, rec)
        logits_fake = self.discriminator.apply(
            {"params": loss_params["discriminator"]}, reconstructions
        )
        g_loss = -jnp.mean(logits_fake)
        kl_loss = jnp.sum(kl) / kl.shape[0]

        if (not val and decode_from_last is not None and last_kernel is not None
                and self.disc_factor > 0.0):
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
            # the reference's calculate_adaptive_weight raises here (no
            # last_layer) — silently substituting 0 would train a
            # different objective (same contract as VQGANLoss)
            raise ValueError(
                "generator_loss needs decode_from_last/last_kernel during "
                "training (the adaptive d_weight is not optional while "
                "disc_factor > 0)")
        else:
            d_weight = jnp.asarray(0.0)

        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        loss = nll + self.kl_weight * kl_loss + d_weight * disc_factor * g_loss
        log = {
            "total_loss": loss, "logvar": loss_params["logvar"],
            "kl_loss": kl_loss, "nll_loss": nll,
            # the reference's monitored metric (contperceptual.py:87) — the
            # logvar-free reconstruction mean; kl-f4.yaml monitors
            # val/rec_loss, so checkpoint selection must rank on THIS, not
            # the H*W*C-scaled (and logvar-drifting) nll
            "rec_loss": jnp.mean(rec),
            "d_weight": d_weight, "disc_factor": disc_factor, "g_loss": g_loss,
        }
        return loss, log

    def discriminator_loss(
        self, loss_params: Dict, inputs, reconstructions, global_step
    ):
        """optimizer_idx == 1 (contperceptual.py:95-113)."""
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
