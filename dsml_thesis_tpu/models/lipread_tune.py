"""Lip-reading finetune for the talking-face LDM.

Parity target: talking_face/ldm/models/diffusion/ddpm2condtune.py — replaces
the eps-MSE with: differentiable stochastic encode of the target-frame latent
→ k-step differentiable reverse DDIM under full conditioning → frozen VQGAN
decode → mouth crop around the landmark centroid (cut_mouth :1412-1461,
96x96 gray → 88px) → frozen lipreader ResNet features → cosine feature loss
(+ L2 latent loss + adopt_weight warmup, p_losses :1026-1110).

TPU-first: the mouth crop is a batched lax.dynamic_slice (static crop size,
runtime center), grayscale + normalization fused in; the k-step decode is the
standard scan with jax.grad flowing through. The lipreader is an injected
callable (frozen pretrained weights are user-supplied; zero-egress image).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..diffusion import ddim_reverse_from, make_ddim_schedule, stochastic_encode
from ..losses.discriminator import adopt_weight
from .ldm import LatentDiffusion

MOUTH_IDX_START, MOUTH_IDX_STOP = 48, 68  # 68-landmark mouth range


def cut_mouth(
    images: jnp.ndarray, landmarks: jnp.ndarray,
    crop: int = 96, grayscale: bool = True,
) -> jnp.ndarray:
    """Crop a (crop x crop) patch centered on the mouth landmarks.

    images: [B, H, W, C] in [-1, 1]; landmarks: [B, 68, 2] pixel coords.
    Static crop size → jit-friendly dynamic_slice; centers clamped to bounds.
    """
    b, h, w, c = images.shape
    centers = jnp.mean(landmarks[:, MOUTH_IDX_START:MOUTH_IDX_STOP, :], axis=1)
    cx = jnp.clip(jnp.round(centers[:, 0]), crop // 2, w - crop // 2).astype(jnp.int32)
    cy = jnp.clip(jnp.round(centers[:, 1]), crop // 2, h - crop // 2).astype(jnp.int32)

    if grayscale:
        rgb = jnp.array([0.2989, 0.587, 0.114], images.dtype)
        images = jnp.sum(images * rgb, axis=-1, keepdims=True)

    def crop_one(img, x, y):
        return jax.lax.dynamic_slice(
            img, (y - crop // 2, x - crop // 2, 0), (crop, crop, img.shape[-1])
        )

    return jax.vmap(crop_one)(images, cx, cy)


def resize_bilinear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="bilinear")


@dataclasses.dataclass
class LipreadFinetune:
    """Finetune loss builder over the 4-cond talking-face LatentDiffusion.

    lipreader_fn: frozen feature extractor, [B, 88, 88, 1] gray in the
    lipreader's normalization -> [B, D] features (the reference's
    Lipreading ResNet encoder with extract_resnet_feats=True).
    """

    ldm: LatentDiffusion
    lipreader_fn: Optional[Callable] = None
    decode_steps: int = 8          # DDIM-8 sampler (ddpm2condtune.py:534-535)
    lr_loss_weight: float = 1.0    # lr_loss_w (mead-128-ldm-f4-tune.yaml:20)
    start_lr_loss: int = 0         # warmup threshold (yaml:19)
    mouth_crop: int = 96
    mouth_size: int = 88
    # lipreader preprocessing (mouth_transform: gray mean/std normalization)
    mouth_mean: float = 0.421
    mouth_std: float = 0.165

    def __post_init__(self):
        self.ddim = make_ddim_schedule(self.ldm.schedule, self.decode_steps, eta=0.0)

    def _prep_mouths(self, images: jnp.ndarray, landmarks: jnp.ndarray):
        m = cut_mouth(images, landmarks, crop=self.mouth_crop)
        m = resize_bilinear(m, self.mouth_size)
        # [-1,1] -> [0,1] -> lipreader normalization
        m = (m + 1.0) / 2.0
        return (m - self.mouth_mean) / self.mouth_std

    def training_loss(self, params: Dict, batch: Dict, rng: jax.Array,
                      global_step=0):
        k_t, k_noise, k_cond = jax.random.split(rng, 3)
        x = batch[self.ldm.first_stage_key]
        z0 = self.ldm.encode_first_stage(params, x)
        cond = self.ldm.encode_conditioning(params, batch, training=True, rng=k_cond)

        b = z0.shape[0]
        # noise to a random position of the k-step sub-chain, then decode fully
        t_idx = jax.random.randint(k_t, (b,), 0, self.ddim.num_steps)
        noise = jax.random.normal(k_noise, z0.shape, dtype=z0.dtype)
        x_noisy = stochastic_encode(self.ddim, z0, t_idx, noise)

        eps_fn = self.ldm.make_eps_fn(params, cond)
        z_rec = ddim_reverse_from(self.ddim, eps_fn, x_noisy)

        aux: Dict[str, jnp.ndarray] = {}
        loss = jnp.mean((z_rec - jax.lax.stop_gradient(z0)) ** 2)
        aux["l2_loss"] = loss

        if self.lipreader_fn is not None and "landmarks" in batch:
            x_pred = jnp.clip(self.ldm.decode_first_stage(params, z_rec), -1, 1)
            x_gt = jnp.clip(
                self.ldm.decode_first_stage(params, jax.lax.stop_gradient(z0)),
                -1, 1,
            )
            lm = batch["landmarks"][..., :2]
            f_pred = self.lipreader_fn(self._prep_mouths(x_pred, lm))
            f_gt = jax.lax.stop_gradient(
                self.lipreader_fn(self._prep_mouths(x_gt, lm))
            )
            cos = jnp.sum(f_pred * f_gt, axis=-1) / (
                jnp.linalg.norm(f_pred, axis=-1) * jnp.linalg.norm(f_gt, axis=-1)
                + 1e-8
            )
            lr_loss = 1.0 - jnp.mean(cos)
            aux["lr_loss"] = lr_loss
            w = adopt_weight(self.lr_loss_weight, global_step, self.start_lr_loss)
            loss = loss + w * lr_loss

        aux["loss"] = loss
        return loss, aux
