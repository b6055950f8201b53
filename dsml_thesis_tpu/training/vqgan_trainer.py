"""VQGAN first-stage training harness (config-driven).

Mirrors the reference's two-optimizer VQModel Lightning loop
(ldm/models/autoencoder.py:142-206) on the data-parallel mesh, reusing the
Trainer conventions (logdir layout, metrics.jsonl, Orbax checkpoints).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import instantiate_from_config
from ..losses.vqperceptual import VQGANLoss
from ..models.autoencoder import VQModel
from ..parallel import is_main_process, make_mesh, shard_batch, shard_state
from .vqgan import create_vqgan_state, make_vqgan_eval_step, make_vqgan_train_step


def _loss_cfg(p: Dict, require_perceptual_weights: bool) -> Dict:
    lp = dict(p.get("lossconfig", {}).get("params", {}))
    lp.setdefault("disc_start", 10000)
    if "perceptual_weight" not in lp:
        # LPIPS weights are not downloadable here; default the perceptual
        # term off unless explicitly requested
        lp["perceptual_weight"] = 0.0
    if (require_perceptual_weights and lp.get("perceptual_weight", 0) > 0
            and not (lp.get("vgg_ckpt") and lp.get("lpips_lin_ckpt"))):
        # only enforced when actually TRAINING (VQGANTrainer): building the
        # architecture for inspection/conversion needs no weights
        raise ValueError(
            "perceptual_weight > 0 needs pretrained LPIPS weights: set "
            "lossconfig.params.vgg_ckpt (torchvision vgg16 features "
            "state_dict) and lpips_lin_ckpt (taming lin heads) — otherwise "
            "the loss would silently optimize a random-init VGG"
        )
    return lp


def build_vqgan(model_cfg: Dict, require_perceptual_weights: bool = False):
    p = model_cfg["params"]
    dd = dict(p["ddconfig"])
    for k in ("ch_mult", "attn_resolutions"):
        dd[k] = tuple(dd[k])
    model = VQModel(ddconfig=dd, n_embed=p["n_embed"], embed_dim=p["embed_dim"])
    lp = _loss_cfg(p, require_perceptual_weights)
    loss = VQGANLoss(
        disc_start=lp["disc_start"],
        codebook_weight=lp.get("codebook_weight", 1.0),
        disc_weight=lp.get("disc_weight", 1.0),
        disc_factor=lp.get("disc_factor", 1.0),
        disc_num_layers=lp.get("disc_num_layers", 3),
        disc_in_channels=lp.get("disc_in_channels", 3),
        disc_ndf=lp.get("disc_ndf", 64),
        disc_loss=lp.get("disc_loss", "hinge"),
        perceptual_weight=lp["perceptual_weight"],
        pixel_loss=lp.get("pixel_loss", "l1"),
    )
    return model, loss


def build_kl_ae(model_cfg: Dict, require_perceptual_weights: bool = False):
    """AutoencoderKL + LPIPSWithDiscriminator-equivalent loss from a
    reference-schema YAML (ldm/models/autoencoder.py:285 +
    ldm/modules/losses/contperceptual.py:7)."""
    from ..losses.contperceptual import KLAutoencoderLoss
    from ..models.autoencoder import AutoencoderKL

    p = model_cfg["params"]
    dd = dict(p["ddconfig"])
    for k in ("ch_mult", "attn_resolutions"):
        dd[k] = tuple(dd[k])
    model = AutoencoderKL(ddconfig=dd, embed_dim=p["embed_dim"])
    lp = _loss_cfg(p, require_perceptual_weights)
    loss = KLAutoencoderLoss(
        disc_start=lp["disc_start"],
        logvar_init=lp.get("logvar_init", 0.0),
        kl_weight=lp.get("kl_weight", 1.0),
        pixelloss_weight=lp.get("pixelloss_weight", 1.0),
        disc_weight=lp.get("disc_weight", 1.0),
        disc_factor=lp.get("disc_factor", 1.0),
        disc_num_layers=lp.get("disc_num_layers", 3),
        disc_in_channels=lp.get("disc_in_channels", 3),
        disc_ndf=lp.get("disc_ndf", 64),
        disc_loss=lp.get("disc_loss", "hinge"),
        perceptual_weight=lp["perceptual_weight"],
    )
    return model, loss


class VQGANTrainer:
    _build = staticmethod(build_vqgan)

    def __init__(self, config: Dict, logdir: str, seed: int = 123,
                 max_steps: Optional[int] = None, fsdp: bool = False):
        self.config = config
        self.logdir = logdir
        self.seed = seed
        self.max_steps = max_steps
        self.fsdp = fsdp
        os.makedirs(os.path.join(logdir, "checkpoints"), exist_ok=True)

        self.model, self.loss = type(self)._build(config["model"],
                                                  require_perceptual_weights=True)
        self.mesh = make_mesh()
        data_cfg = config.get("data", {}).get("params", {})
        self.batch_size = data_cfg.get("batch_size", 8)
        from ..data import DataLoader

        self.train_data = self.val_data = None
        if "train" in data_cfg:
            self.train_data = DataLoader(
                instantiate_from_config(data_cfg["train"]),
                batch_size=self.batch_size, shuffle=True,
                num_workers=data_cfg.get("num_workers", 4), seed=seed,
            )
        if "validation" in data_cfg:
            self.val_data = DataLoader(
                instantiate_from_config(data_cfg["validation"]),
                batch_size=self.batch_size, shuffle=False,
                num_workers=data_cfg.get("num_workers", 4), seed=seed,
            )
        # effective-batch LR rule (see Trainer docstring): batch_size is the
        # GLOBAL batch, so the scale is chip/host-count invariant; honors
        # the --scale_lr flag like the LDM Trainer
        base_lr = config["model"].get("base_learning_rate", 4.5e-6)
        trainer_cfg = config.get("lightning", {}).get("trainer", {})
        accumulate = trainer_cfg.get("accumulate_grad_batches", 1)
        # YAML-driven run length (lightning.trainer), like the LDM Trainer:
        # a verbatim reference YAML must fully specify the run
        self.max_epochs = trainer_cfg.get("max_epochs")
        if self.max_steps is None and trainer_cfg.get("max_steps") is not None:
            self.max_steps = int(trainer_cfg["max_steps"])
        if config.get("scale_lr", True):
            self.lr = accumulate * self.batch_size * base_lr
        else:
            self.lr = base_lr
        self._metrics_file = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._state = None
        # top-k checkpoints on val/rec_loss with metric-embedded names, the
        # reference's VQ checkpoint convention (main.py:588-599; e.g.
        # "epoch=5-val_rec_loss=0.138" in affectnet-128-ldm-vq-f4.yaml:47)
        self.save_top_k = config.get("lightning", {}).get(
            "modelcheckpoint", {}).get("params", {}).get("save_top_k", 5)
        self._topk: list = []

    def init_state(self, batch_or_shape):
        """Accepts an example batch dict (the shared trainer interface
        main.py's resume path uses) or a raw image shape tuple."""
        if isinstance(batch_or_shape, dict):
            image_shape = np.asarray(batch_or_shape["image"]).shape
        else:
            image_shape = batch_or_shape
        state, ae_tx, disc_tx = self._create_state(image_shape)
        lp = self.config["model"].get("params", {}).get(
            "lossconfig", {}).get("params", {})
        if lp.get("vgg_ckpt") and lp.get("lpips_lin_ckpt"):
            # load the frozen pretrained LPIPS towers into the loss params
            import torch

            from ..losses.lpips import convert_lpips_weights

            vgg_sd = torch.load(lp["vgg_ckpt"], map_location="cpu",
                                weights_only=False)
            lin_sd = torch.load(lp["lpips_lin_ckpt"], map_location="cpu",
                                weights_only=False)
            state = state.replace(loss_params={
                **state.loss_params,
                "lpips": convert_lpips_weights(
                    vgg_sd if isinstance(vgg_sd, dict) else vgg_sd.state_dict(),
                    lin_sd if isinstance(lin_sd, dict) else lin_sd.state_dict(),
                ),
            })
        # fsdp: shape-based ZeRO-3 placement over the data axis (tp.py
        # fsdp_spec — no TP rules match the AE param names, so without fsdp
        # this is plain replication)
        self._state = shard_state(self.mesh, state, fsdp=self.fsdp)
        # donate: both optimizer states + params are overwritten in place
        self._step = self._jit(
            self._make_train_step(ae_tx, disc_tx), donate_argnums=(0,),
        )
        self._eval_step = self._jit(self._make_eval_step())
        self._recon_fn = self._jit(self.model.apply)  # once: reused every log
        return self._state

    def _jit(self, fn, **jit_kw):
        """Same multi-device attention scoping as Trainer._jit: the AE
        mid-block self-attention rides the shared flash dispatch, which on a
        >1-device mesh must shard_map the Pallas kernel instead of letting
        GSPMD gather around it (ops.attention.attention_mesh)."""
        if self.mesh.size > 1:
            from ..ops.attention import scoped_attention_mesh

            fn = scoped_attention_mesh(fn, self.mesh)
        return jax.jit(fn, **jit_kw)

    # ---- hooks the KL variant overrides ----

    def _create_state(self, image_shape):
        return create_vqgan_state(
            self.model, self.loss, jax.random.PRNGKey(self.seed),
            image_shape, self.lr,
        )

    def _make_train_step(self, ae_tx, disc_tx):
        return make_vqgan_train_step(self.model, self.loss, ae_tx, disc_tx)

    def _make_eval_step(self):
        return make_vqgan_eval_step(self.model, self.loss)

    def _checkpointer(self):
        if getattr(self, "_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def save_checkpoint(self, name: str):
        path = os.path.abspath(os.path.join(self.logdir, "checkpoints", name))
        ckptr = self._checkpointer()
        if any(getattr(x, "is_deleted", lambda: False)()
               for x in jax.tree_util.tree_leaves(self._state)):
            # donated to a failed step — nothing recoverable on device
            print(f"checkpoint '{name}' skipped: state buffers were donated "
                  "to the failed step")
            return
        # jax.Arrays straight to Orbax (sharding-aware): required under
        # multi-host fsdp, where device_get on data-sharded state raises
        ckptr.save(path, self._state, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, name: str):
        path = os.path.abspath(os.path.join(self.logdir, "checkpoints", name))
        self._state = self._checkpointer().restore(path, self._state)
        return self._state

    def log_metrics(self, metrics: Dict, step: int, split: str = "train"):
        if not is_main_process():
            return
        rec = {"step": step, "split": split}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._metrics_file.write(json.dumps(rec) + "\n")
        self._metrics_file.flush()

    def validate(self, max_batches: Optional[int] = None) -> Optional[Dict]:
        if self.val_data is None:
            return None
        sums, n = {}, 0
        for i, batch in enumerate(self.val_data):
            if max_batches is not None and i >= max_batches:
                break
            sb = shard_batch(self.mesh, {"image": np.asarray(batch["image"])})
            m = self._eval_step(self._state, sb, jnp.int32(i))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    def save_topk_checkpoint(self, score: float, step: int):
        from .checkpointing import save_topk

        save_topk(self._topk, self.save_top_k, score,
                  f"step={step:08d}-val_rec_loss={score:.5f}",
                  self.save_checkpoint,
                  os.path.join(self.logdir, "checkpoints"))

    def log_reconstructions(self, batch, step: int, n: int = 4):
        """inputs | reconstructions grid (reference VQModel.log_images,
        autoencoder.py:216-231)."""
        if jax.process_count() > 1:
            return
        x = jnp.asarray(batch["image"])[:n]
        rec, _, _ = self._recon_fn({"params": self._state.ae_params}, x)
        outdir = os.path.join(self.logdir, "images")
        os.makedirs(outdir, exist_ok=True)
        arr = np.asarray(jnp.clip(jnp.concatenate([x, rec], axis=0), -1, 1))
        np.save(os.path.join(outdir, f"recon_step{step:08d}.npy"), arr)
        try:
            from PIL import Image

            row = np.concatenate(list((arr + 1) * 127.5), axis=1).astype(np.uint8)
            Image.fromarray(row).save(
                os.path.join(outdir, f"recon_step{step:08d}.png"))
        except Exception:
            pass

    def fit(self, epochs: Optional[int] = None, log_every: int = 100,
            image_every: Optional[int] = None,
            val_max_batches: Optional[int] = None):
        assert self.train_data is not None
        if epochs is None:
            # YAML-driven (lightning.trainer.max_epochs); CLI --epochs wins.
            # max_steps-only runs span epochs until the step limit.
            if self.max_epochs is not None:
                epochs = self.max_epochs
            elif self.max_steps is not None:
                epochs = 10**9
            else:
                epochs = 1
        first_batch = None
        for epoch in range(epochs):
            t0 = time.time()
            for batch in self.train_data:
                jb = {"image": np.asarray(batch["image"])}  # host; one
                # transfer happens in shard_batch with the mesh sharding
                if self._state is None:
                    self.init_state(jb["image"].shape)
                if first_batch is None:
                    first_batch = batch
                sb = shard_batch(self.mesh, jb)
                self._state, metrics = self._step(self._state, sb)
                step = int(self._state.step)
                if step % log_every == 0:
                    self.log_metrics(metrics, step)
                if image_every and step % image_every == 0:
                    self.log_reconstructions(first_batch, step)
                if self.max_steps is not None and step >= self.max_steps:
                    break
            print(f"epoch {epoch}: {time.time() - t0:.1f}s, step {int(self._state.step)}")
            val = self.validate(max_batches=val_max_batches)
            if val:  # {} when the val split is smaller than one batch
                step = int(self._state.step)
                self.log_metrics(val, step, split="val")
                self.save_topk_checkpoint(float(val["val/rec_loss"]), step)
            self.save_checkpoint("last")
            if self.max_steps is not None and int(self._state.step) >= self.max_steps:
                break
        return self._state


class KLAETrainer(VQGANTrainer):
    """AutoencoderKL training harness (reference AutoencoderKL Lightning loop,
    ldm/models/autoencoder.py:285-424, with LPIPSWithDiscriminator). Same
    two-optimizer shape as the VQGAN trainer; posterior sampling rides the
    train state's PRNG key. lossconfig.params.train_logvar=true opts into
    optimizing logvar (frozen upstream — see losses/contperceptual.py)."""

    _build = staticmethod(build_kl_ae)

    def _lossconfig(self) -> Dict:
        return self.config["model"].get("params", {}).get(
            "lossconfig", {}).get("params", {})

    def _create_state(self, image_shape):
        from .kl_ae import create_kl_ae_state

        return create_kl_ae_state(
            self.model, self.loss, jax.random.PRNGKey(self.seed),
            image_shape, self.lr,
            train_logvar=bool(self._lossconfig().get("train_logvar", False)),
        )

    def _make_train_step(self, ae_tx, disc_tx):
        from .kl_ae import make_kl_ae_train_step

        return make_kl_ae_train_step(self.model, self.loss, ae_tx, disc_tx)

    def _make_eval_step(self):
        from .kl_ae import make_kl_ae_eval_step

        return make_kl_ae_eval_step(self.model, self.loss)

    def log_reconstructions(self, batch, step: int, n: int = 4):
        """inputs | reconstructions (posterior mode) grid, the KL analogue of
        reference AutoencoderKL.log_images (autoencoder.py:401-417)."""
        if jax.process_count() > 1:
            return
        x = jnp.asarray(batch["image"])[:n]
        ae_params = {k: v for k, v in self._state.ae_params.items()
                     if k != "_loss_logvar"}
        rec, _ = self._recon_fn({"params": ae_params}, x)
        outdir = os.path.join(self.logdir, "images")
        os.makedirs(outdir, exist_ok=True)
        arr = np.asarray(jnp.clip(jnp.concatenate([x, rec], axis=0), -1, 1))
        np.save(os.path.join(outdir, f"recon_step{step:08d}.npy"), arr)
        try:
            from PIL import Image

            row = np.concatenate(list((arr + 1) * 127.5), axis=1).astype(np.uint8)
            Image.fromarray(row).save(
                os.path.join(outdir, f"recon_step{step:08d}.png"))
        except Exception:
            pass
