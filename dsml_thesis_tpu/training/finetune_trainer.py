"""Trainer for the guidance-finetune stacks (DiffusionCLIP / lipread).

The reference trains these through the same Lightning spine as the base LDMs
(main.py:427-753 routing latent_diffclip / ddpm2condtune targets whose
training_step swaps the eps-MSE for the guidance loss, latent_diffclip.py /
ddpm2condtune.py:1026-1110). Here the same Trainer machinery is reused with
the loss module swapped: gradients flow through the k-step differentiable
reverse DDIM into the UNet while the first stage and guidance encoders stay
frozen (enforced by the optimizer mask from trainable_filter).
"""
from __future__ import annotations

from typing import Dict, Optional

from ..config import build_finetune
from .trainer import Trainer


class FinetuneTrainer(Trainer):
    """Trainer whose loss is a finetune wrapper over the base LDM.

    encoder_fns: optional injected frozen encoders (clip_image_embed,
    arcface_embed, classifier_logits, lipreader_fn); anything not injected is
    built from checkpoint-path keys in the model config (clip_ckpt, clip_bpe,
    id_ckpt — see config.build_guidance_encoders).
    """

    def __init__(self, config: Dict, logdir: str, seed: int = 123,
                 mesh=None, max_steps: Optional[int] = None,
                 encoder_fns: Optional[Dict] = None, tp: int = 1,
                 fsdp: bool = False):
        super().__init__(config, logdir, seed=seed, mesh=mesh,
                         max_steps=max_steps, tp=tp, fsdp=fsdp)
        self.finetune = build_finetune(
            self.model_cfg, ldm=self.ldm, **(encoder_fns or {})
        )
        self.loss_module = self.finetune

    def _augment_params(self, params):
        """Route the frozen guidance towers through the params tree so the
        jitted loss receives them as arguments (trainable_filter marks
        'frozen/*' untrained, EMA skips them)."""
        fp = getattr(self.finetune, "frozen_params", None)
        if fp:
            params = {**params, "frozen/guidance": fp}
        return params

    def log_images(self, batch: Dict, step: int, n: int = 4, **kw):
        """Edited-image grids for the DiffusionCLIP path; the base grids
        assume an image-keyed batch and do not apply here. One jitted program
        (cached on first call) — unjitted op-by-op dispatch would be a fresh
        multi-minute remote compile per call on the axon tunnel."""
        import os

        import jax
        import jax.numpy as jnp
        import numpy as np

        if jax.process_count() > 1:
            # same multi-host gate as Trainer.log_images: host-local inputs
            # would diverge the per-process device programs
            return
        if not hasattr(self.finetune, "edit") or "latent" not in batch:
            return
        if self._log_images_fn is None:
            def fn(params, x_lat, target):
                z = self.finetune.edit(params, x_lat, target)
                return jnp.clip(self.ldm.decode_first_stage(params, z), -1, 1)

            self._log_images_fn = self._jit(fn)

        x_lat = jnp.asarray(batch["latent"][:n])
        if self.finetune.edit_attr_label is not None:
            target = jnp.full((x_lat.shape[0],),
                              self.finetune.edit_attr_label, jnp.int32)
        else:
            target = jnp.asarray(batch["class_label"][:n])
        edit = np.asarray(
            self._log_images_fn(self._state.ema_full(), x_lat, target)
        )
        outdir = os.path.join(self.logdir, "images")
        np.save(os.path.join(outdir, f"edited_step{step:08d}.npy"), edit)
