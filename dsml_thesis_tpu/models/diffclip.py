"""DiffusionCLIP-style LDM finetuning (emotion editing by gradient steering).

Parity target: face_reenactment/ldm/models/diffusion/latent_diffclip.py
(LatentDiffusionCLIP) + ddim2.py's differentiable samplers: starting from
cached DDIM-inverted latents (compute_latents), run a k-step differentiable
reverse DDIM under the TARGET emotion conditioning, decode through the frozen
VQGAN, and minimize
    w_l2 * L2(edit, src) + w_id * ID + w_clip * (-log((2-d_dir)/2)) + w_cls * CE.

In JAX the "differentiable sampler" needs no special machinery — the reverse
chain is the same lax.scan as inference and jax.grad flows through it
(replacing the reference's hand-rolled differentiable_p_sample_ddim,
ddim2.py:252-290). Only the UNet (and optionally cond stage) is trainable;
VQGAN and all guidance encoders are frozen.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..diffusion import DDIMSchedule, ddim_reverse_from, make_ddim_schedule
from ..losses.guidance import (
    clip_directional_loss,
    diffusionclip_direction_loss,
    id_loss,
    l2_loss,
)
from .ldm import LatentDiffusion


@dataclasses.dataclass
class DiffusionCLIPFinetune:
    """Builds the finetune loss over a base LatentDiffusion.

    Encoders are injected callables (image batch [-1,1] NHWC -> embeddings /
    logits); text_direction is the precomputed normalized CLIP text direction
    for the target emotion (reference knobs: affectnet-128-clip-ldm-vq-f4.yaml:18-29).
    """

    ldm: LatentDiffusion
    train_steps: int = 6          # train_ddim_timesteps (yaml :19)
    strength: float = 0.5         # inversion depth (yaml :21)
    l2_weight: float = 1.0
    id_weight: float = 1.0
    clip_weight: float = 1.0
    cls_weight: float = 0.0
    clip_image_embed: Optional[Callable] = None
    arcface_embed: Optional[Callable] = None
    classifier_logits: Optional[Callable] = None
    # single target attribute (reference edit_attr, yaml :19): every example is
    # edited toward this class; None = per-example batch['class_label'] targets
    edit_attr_label: Optional[int] = None
    # precomputed CLIP text direction(s): (D,), or (n_classes, D) indexed by
    # the SOURCE class (reference semantics, direction_by_source=True) or by
    # the target label (extension mode); overridden by a per-batch
    # 'text_direction' entry
    text_direction: Optional[jnp.ndarray] = None
    direction_by_source: bool = False
    # frozen tower weights keyed 'clip'/'irse'/...: merged into the params
    # tree as 'frozen/guidance' by FinetuneTrainer so jitted losses receive
    # them as arguments; the matching encoder fns then take (weights, images).
    # Plain single-arg callables (tests, external torch encoders on CPU)
    # remain supported.
    frozen_params: Optional[Dict] = None

    _GUIDANCE_KEYS = {"clip_image_embed": "clip", "arcface_embed": "irse",
                      "classifier_logits": "classifier"}

    def _enc(self, params: Dict, attr: str):
        """Bind an encoder callable to its frozen weights from `params`."""
        fn = getattr(self, attr)
        gp = params.get("frozen/guidance", self.frozen_params or {})
        key = self._GUIDANCE_KEYS[attr]
        if key in gp:
            return lambda x: fn(gp[key], x)
        return fn

    def __post_init__(self):
        # strength >= 1.0 maps to the full uniform chain inside
        # make_ddim_schedule
        self.train_ddim = make_ddim_schedule(
            self.ldm.schedule, self.train_steps, eta=0.0,
            strength=self.strength,
        )

    def edit(self, params: Dict, x_lat: jnp.ndarray, target_labels: jnp.ndarray,
             ddim: Optional[DDIMSchedule] = None) -> jnp.ndarray:
        """Differentiable reverse chain from inverted latents under target cond."""
        cond = self.ldm.encode_conditioning(
            params, {"class_label": target_labels}
        )
        eps_fn = self.ldm.make_eps_fn(params, cond)
        return ddim_reverse_from(ddim or self.train_ddim, eps_fn, x_lat)

    def training_loss(self, params: Dict, batch: Dict, rng: jax.Array):
        """batch: {'latent': inverted latents, 'original': source images,
        'class_label': target emotion}."""
        x_lat = batch["latent"]
        src = batch["original"]
        if self.edit_attr_label is not None:
            target = jnp.full((x_lat.shape[0],), self.edit_attr_label, jnp.int32)
        else:
            target = batch["class_label"]

        z_edit = self.edit(params, x_lat, target)
        # NOT clamped: the reference feeds the raw decode to clip_losses
        # (latent_diffclip.py:1003) — clipping would zero gradients on
        # saturated pixels and change the optimization trajectory
        edit = self.ldm.decode_first_stage(params, z_edit)

        loss = 0.0
        aux: Dict[str, jnp.ndarray] = {}
        if self.l2_weight > 0:
            aux["loss_l2"] = l2_loss(edit, src)
            loss = loss + self.l2_weight * aux["loss_l2"]
        if self.id_weight > 0 and self.arcface_embed is not None:
            aux["loss_id"] = id_loss(self._enc(params, "arcface_embed"),
                                     src, edit)
            loss = loss + self.id_weight * aux["loss_id"]
        if self.clip_weight > 0 and self.clip_image_embed is not None:
            tdir = batch.get("text_direction")
            if tdir is None:
                tdir = self.text_direction
                if tdir is None:
                    raise ValueError(
                        "clip_loss_w > 0 needs a CLIP text direction: supply "
                        "batch['text_direction'], set text_direction, or add "
                        "clip_bpe (the BPE merge table) next to clip_ckpt in "
                        "the config so build_guidance_encoders precomputes it"
                    )
                if tdir.ndim == 2:  # per-class table -> per-example rows
                    # reference: direction depends on the SOURCE emotion of
                    # each example (latent_diffclip.py:959,1022); the
                    # per-target table is the no-edit_attr extension mode
                    key = (batch["class_label"] if self.direction_by_source
                           else target)
                    tdir = tdir[key]
            d = clip_directional_loss(self._enc(params, "clip_image_embed"),
                                      src, edit, tdir)
            aux["loss_clip"] = jnp.mean(diffusionclip_direction_loss(d))
            loss = loss + self.clip_weight * aux["loss_clip"]
        if self.cls_weight > 0 and self.classifier_logits is not None:
            from ..losses.guidance import cls_loss

            aux["loss_cls"] = cls_loss(self._enc(params, "classifier_logits"),
                                       edit, target)
            loss = loss + self.cls_weight * aux["loss_cls"]
        aux["loss"] = loss
        return loss, aux
