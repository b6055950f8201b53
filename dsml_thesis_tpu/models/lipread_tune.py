"""Lip-reading finetune for the talking-face LDM.

Parity target: talking_face/ldm/models/diffusion/ddpm2condtune.py — replaces
the eps-MSE with: original-schedule stochastic encode of the target-frame
latent at t ~ U{0..T-1} (:947-948, :1028 use_original_steps=True) → the full
8-step differentiable reverse DDIM at eta=1.0 under full conditioning
(:533, :1029-1032) → frozen VQGAN decode, clamped → mouth crop around the
landmark centroid (cut_mouth :1412-1461, 72x72 gray) → CenterCrop(64) →
Normalize(0.421, 0.165) → resize 88 (:515-527, :1058-1063) → frozen
lipreader ResNet features → cosine feature loss (+ L2 latent loss +
adopt_weight warmup, p_losses :1026-1110).

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

from ..diffusion import ddim_reverse_from, make_ddim_schedule
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
    # frozen tower weights keyed 'lipreader': merged into the params tree as
    # 'frozen/guidance' by FinetuneTrainer so the jitted loss receives them
    # as ARGUMENTS (axon rejects closure-constant weights, CLAUDE.md); the
    # matching lipreader_fn then takes (weights, mouths). Plain single-arg
    # callables (tests, external torch towers on CPU) remain supported.
    frozen_params: Optional[Dict] = None
    decode_steps: int = 8          # DDIM-8 sampler (ddpm2condtune.py:534-535)
    lr_loss_weight: float = 1.0    # lr_loss_w (mead-128-ldm-f4-tune.yaml:20)
    start_lr_loss: int = 0         # warmup threshold (yaml:19)
    # reference mouth geometry (ddpm2condtune.py:515-521): 72px crop,
    # 64px center crop, resized to 88 for the lipreader
    mouth_crop: int = 72
    mouth_center_crop: int = 64
    mouth_size: int = 88
    # lipreader normalization, applied DIRECTLY to the [-1,1] gray crop
    # (the reference's Normalize(0,1) is a no-op; there is no [0,1] rescale)
    mouth_mean: float = 0.421
    mouth_std: float = 0.165

    def __post_init__(self):
        # the tune sampler runs at eta=1.0 (ddpm2condtune.py:533): every
        # reverse step adds sigma-scaled noise (rng passed in training_loss)
        self.ddim = make_ddim_schedule(self.ldm.schedule, self.decode_steps,
                                       eta=1.0)

    def _lipreader(self, params: Dict) -> Callable:
        """Bind the lipreader to its frozen weights from `params` (mirrors
        DiffusionCLIPFinetune._enc)."""
        gp = params.get("frozen/guidance", self.frozen_params or {})
        if "lipreader" in gp:
            return lambda m: self.lipreader_fn(gp["lipreader"], m)
        return self.lipreader_fn

    def _prep_mouths(self, images: jnp.ndarray, landmarks: jnp.ndarray):
        m = cut_mouth(images, landmarks, crop=self.mouth_crop)
        cc = self.mouth_center_crop
        off = (self.mouth_crop - cc) // 2
        m = m[:, off:off + cc, off:off + cc, :]
        m = (m - self.mouth_mean) / self.mouth_std
        return resize_bilinear(m, self.mouth_size)

    def training_loss(self, params: Dict, batch: Dict, rng: jax.Array,
                      global_step=0, training: bool = True):
        # training=False = the validation form (make_eval_step): no CFG
        # label drop, like Lightning validation's model.training=False
        k_t, k_noise, k_cond, k_dec = jax.random.split(rng, 4)
        x = batch[self.ldm.first_stage_key]
        z0 = self.ldm.encode_first_stage(params, x)
        cond = self.ldm.encode_conditioning(
            params, batch, training=training,
            rng=k_cond if training else None)

        b = z0.shape[0]
        # noise at t ~ U{0..T-1} on the ORIGINAL schedule (reference :947-948,
        # differentiable_stochastic_encode use_original_steps=True :1028),
        # then decode the full k-step chain (t_start=1000, :1029-1032)
        from ..diffusion import q_sample

        t = jax.random.randint(k_t, (b,), 0, self.ldm.schedule.num_timesteps)
        noise = jax.random.normal(k_noise, z0.shape, dtype=z0.dtype)
        x_noisy = q_sample(self.ldm.schedule, z0, t, noise)

        eps_fn = self.ldm.make_eps_fn(params, cond)
        z_rec = ddim_reverse_from(self.ddim, eps_fn, x_noisy, rng=k_dec)

        aux: Dict[str, jnp.ndarray] = {}
        loss = jnp.mean((z_rec - jax.lax.stop_gradient(z0)) ** 2)
        aux["l2_loss"] = loss

        if self.lipreader_fn is not None:
            if "landmarks" not in batch:
                raise KeyError(
                    "lipread finetune needs batch['landmarks'] (MEADBase5 / "
                    "include_landmarks=True); refusing to silently train "
                    "with the L2 term only"
                )
            x_pred = jnp.clip(self.ldm.decode_first_stage(params, z_rec), -1, 1)
            x_gt = jnp.clip(
                self.ldm.decode_first_stage(params, jax.lax.stop_gradient(z0)),
                -1, 1,
            )
            lm = batch["landmarks"][..., :2]
            reader = self._lipreader(params)
            f_pred = reader(self._prep_mouths(x_pred, lm))
            f_gt = jax.lax.stop_gradient(
                reader(self._prep_mouths(x_gt, lm))
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
