"""Config-driven training harness.

Replaces the reference's PyTorch-Lightning spine (main.py:427-753):
  - LR scaling: lr = accumulate × batch_size × base_lr, where batch_size is
    the GLOBAL batch. This is the reference rule (main.py:686-701,
    accumulate × n_gpu × per-gpu-bs × base_lr) expressed in effective-batch
    terms — under DDP the global batch is n_gpu × per-gpu-bs, here the YAML
    batch_size IS the global batch, independent of chip/host count. Disable
    with scale_lr=False.
  - top-k Orbax checkpointing keyed on the model monitor (main.py:580-599)
  - signal-based save: SIGTERM/SIGUSR1 -> checkpoint 'last' (main.py:708-725)
  - periodic image logging: input / reconstruction / CFG samples grids
    (main.py:298-401, ddpm.py log_images)
  - validation with and without EMA weights (ddpm.py:356-363)
  - per-epoch wall-time + device-memory stats (main.py:404-424 CUDACallback
    equivalent via jax.local_devices memory_stats)

Data-parallel over an ICI mesh: batch sharded on the 'data' axis, state
replicated, gradient psum inserted by the SPMD partitioner.
"""
from __future__ import annotations

import json
import os
import signal
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import build_model, instantiate_from_config
from ..models.ldm import LatentDiffusion
from ..parallel import (
    is_main_process,
    make_mesh,
    shard_batch,
    shard_state,
)
from .train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def _to_jnp_batch(batch: Dict):
    """Keep array-valued fields (drop str metadata like file paths).

    Fields stay on the HOST (numpy): the single host->device transfer happens
    in shard_batch with the right mesh sharding — jnp.asarray here would add
    a default-device copy first (and a device->host round trip in the
    multi-process path)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jnp.ndarray)):
            out[k] = np.asarray(v)
    return out


class Trainer:
    def __init__(self, config: Dict, logdir: str, seed: int = 123,
                 mesh=None, max_steps: Optional[int] = None, tp: int = 1,
                 fsdp: bool = False):
        self.config = config
        self.logdir = logdir
        self.seed = seed
        os.makedirs(logdir, exist_ok=True)
        os.makedirs(os.path.join(logdir, "checkpoints"), exist_ok=True)
        os.makedirs(os.path.join(logdir, "images"), exist_ok=True)

        self.model_cfg = config["model"]
        self.data_cfg = config.get("data", {}).get("params", {})
        self.lightning_cfg = config.get("lightning", {})
        self.max_steps = max_steps

        self.ldm: LatentDiffusion = build_model(self.model_cfg)
        # subclasses may wrap the LDM in a different loss (finetune stacks)
        self.loss_module = self.ldm
        self.tp = tp
        self.fsdp = fsdp
        self.mesh = mesh if mesh is not None else make_mesh(n_model=tp)

        # data
        from ..data import DataLoader

        bs = self.data_cfg.get("batch_size", 4)
        nw = self.data_cfg.get("num_workers", 4)
        self.train_data = self.val_data = self.test_data = None
        if "train" in self.data_cfg:
            self.train_data = DataLoader(
                instantiate_from_config(self.data_cfg["train"]),
                batch_size=bs, shuffle=True, num_workers=nw, seed=seed,
            )
        # eval splits keep the ragged tail (drop_last=False): validate() pads
        # it to the static batch shape and masks the padding out of the
        # metric means via batch["_sample_weights"], so val metrics cover the
        # FULL split like the reference (ddpm.py:356-363). Multi-process runs
        # still drop the tail (a ragged batch cannot shard across hosts).
        if "validation" in self.data_cfg:
            self.val_data = DataLoader(
                instantiate_from_config(self.data_cfg["validation"]),
                batch_size=bs, shuffle=False, num_workers=nw, seed=seed,
                drop_last=False,
            )
        if "test" in self.data_cfg:
            self.test_data = DataLoader(
                instantiate_from_config(self.data_cfg["test"]),
                batch_size=bs, shuffle=False, num_workers=nw, seed=seed,
                drop_last=False,
            )

        # LR scaling (reference main.py:686-701)
        base_lr = self.model_cfg.get("base_learning_rate", 1e-6)
        trainer_cfg = self.lightning_cfg.get("trainer", {})
        accumulate = trainer_cfg.get("accumulate_grad_batches", 1)
        if config.get("scale_lr", True):
            self.lr = accumulate * bs * base_lr
        else:
            self.lr = base_lr
        self.grad_accum = accumulate
        # lightning.trainer keys the reference drives through
        # Trainer.from_argparse_args + config (main.py:671-706): a verbatim
        # reference YAML fully specifies the run. CLI flags still win where
        # they are explicitly given (main.py here mirrors that precedence).
        self.max_epochs = trainer_cfg.get("max_epochs")
        if self.max_steps is None and trainer_cfg.get("max_steps") is not None:
            self.max_steps = int(trainer_cfg["max_steps"])
        self.check_val_every_n_epoch = int(
            trainer_cfg.get("check_val_every_n_epoch", 1)
        )
        # Lightning semantics: int = batch count, float = fraction of batches
        self.limit_val_batches = trainer_cfg.get("limit_val_batches")
        # test has its OWN limit (Lightning limit_test_batches, default full
        # split) — the val limit must not silently truncate test metrics
        self.limit_test_batches = trainer_cfg.get("limit_test_batches")
        # reference ImageLogger callback config (main.py:614-624):
        # lightning.callbacks.image_logger.params.{batch_frequency,max_images}
        il = self.lightning_cfg.get("callbacks", {}).get(
            "image_logger", {}).get("params", {})
        self.image_every = il.get("batch_frequency")
        self.log_max_images = int(il.get("max_images", 4))

        self._state: Optional[TrainState] = None
        self._tx = None
        self._train_step = None
        self._eval_step = None
        self._log_images_fn = None
        self._should_stop = False
        self._metrics_file = open(os.path.join(logdir, "metrics.jsonl"), "a")
        # reference-style selectable logger backend (main.py:552-576) layered
        # over the always-on jsonl; rank-zero only like the reference
        from .loggers import build_logger

        self._ext_logger = (build_logger(self.lightning_cfg, logdir)
                            if is_main_process() else None)
        # top-k checkpoint tracking (reference ModelCheckpoint save_top_k=5
        # with metric-embedded filenames, main.py:580-599)
        mc = self.lightning_cfg.get("modelcheckpoint", {}).get("params", {})
        self.save_top_k = mc.get("save_top_k", 5)
        # Lightning ModelCheckpoint mode: "min" for loss monitors (the
        # reference default), "max" for higher-is-better monitors (PSNR etc.)
        self.monitor_mode = mc.get("mode", "min")
        self._topk: list = []  # [(score, name)] sorted best-first

    # ---------- setup ----------

    def _augment_params(self, params: Dict) -> Dict:
        """Hook for subclasses to add frozen param groups (e.g. guidance
        towers) before the optimizer/EMA partition is built."""
        return params

    def _jit(self, fn, **jit_kw):
        """jit with the trainer's attention-dispatch scope: the Pallas flash
        kernel is opaque to GSPMD, so on any multi-device mesh the dispatch
        wraps it in shard_map over this trainer's mesh (batch over `data`,
        heads over `model` — see ops.attention.attention_mesh) instead of
        letting XLA gather q/k/v around an unpartitioned pallas_call. Scoped
        to the trace, not a process-global env mutation: an explicit user
        DSML_FLASH_ATTN and other models in the same process keep their own
        dispatch."""
        if self.mesh.size > 1:
            from ..ops.attention import scoped_attention_mesh

            fn = scoped_attention_mesh(fn, self.mesh)
        return jax.jit(fn, **jit_kw)

    def _head_hints(self) -> Dict:
        """num_heads / dim_head from the UNet config, so shard_state can gate
        the TP rules on the real invariant (model axis divides the HEAD
        count, not just the packed H*D kernel dim)."""
        up = self.model_cfg.get("params", {}).get(
            "unet_config", {}).get("params", {})
        return {"num_heads": up.get("num_heads"),
                "dim_head": up.get("num_head_channels")}

    def init_state(self, example_batch: Dict):
        params = self._augment_params(self.ldm.init_params(
            jax.random.PRNGKey(self.seed), _to_jnp_batch(example_batch)
        ))
        # reference first_stage_config.params.ckpt_path (e.g.
        # affectnet-128-ldm-vq-f4.yaml:47): load the pretrained frozen VQGAN
        # at build time — ignoring it would silently diffuse over a
        # random-init first stage
        fs_cfg = self.model_cfg.get("params", {}).get("first_stage_config")
        fs_p = fs_cfg.get("params", {}) if isinstance(fs_cfg, dict) else {}
        if fs_p.get("ckpt_path"):
            from ..convert import load_first_stage_checkpoint

            params["first_stage"] = jax.tree.map(
                jnp.asarray,
                load_first_stage_checkpoint(fs_p["ckpt_path"],
                                            dict(fs_p["ddconfig"])),
            )
            print(f"loaded first-stage weights from {fs_p['ckpt_path']}")
        # reference MODEL-level ckpt_path (ddpm.py:104/186 init_from_ckpt,
        # e.g. mead-128-ldm-f4-tune.yaml:5): warm-start the WHOLE model from
        # a trained checkpoint — a torch Lightning .ckpt (converted) or one
        # of our Orbax run dirs. Raw (non-EMA) weights, matching the
        # reference's direct state_dict load; group-level overlay keeps
        # augmented extras (guidance towers) from _augment_params. Also the
        # dh64 finetune entry point: the head-width knob changes no param
        # shapes, so converted reference weights load as-is.
        mp = self.model_cfg.get("params", {})
        warm_ema = None
        if mp.get("ckpt_path"):
            if not os.path.exists(mp["ckpt_path"]):
                # refuse BEFORE any backend import touches the path — a
                # typo'd warm-start must not surface as a confusing
                # downstream loader error
                raise FileNotFoundError(
                    f"model.params.ckpt_path does not exist: "
                    f"{mp['ckpt_path']!r}")
            from ..utils_io import load_params

            loaded = load_params(mp["ckpt_path"], self.ldm, self.model_cfg,
                                 use_ema=False)
            params = {**params,
                      **{k: jax.tree.map(jnp.asarray, v)
                         for k, v in loaded.items()}}
            # the reference's init_from_ckpt restores the LitEma shadow
            # buffers too (they ride the state_dict): carry the EMA tree
            # over as well, falling back to the raw weights when the
            # checkpoint has no shadows (= the reference's fresh-LitEma
            # behavior). Caveat vs torch: LitEma's num_updates rides the
            # checkpoint while our warmup decay follows TrainState.step,
            # which restarts at 0 on a warm start — early shadows track
            # the raw weights more closely than a resumed LitEma would.
            warm_ema = load_params(mp["ckpt_path"], self.ldm,
                                   self.model_cfg, use_ema=True)
            print(f"warm-started model from {mp['ckpt_path']}")
        scheduler_cfg = self.model_cfg.get("params", {}).get("scheduler_config")
        self._tx = make_optimizer(
            self.ldm, params, base_lr=self.lr,
            scheduler_config=scheduler_cfg, grad_accum=self.grad_accum,
        )
        state = create_train_state(self.ldm, params, self._tx)
        if warm_ema is not None:
            state = state.replace(ema_params={
                k: jax.tree.map(jnp.asarray, warm_ema[k])
                for k in state.ema_params if k in warm_ema
            } | {k: v for k, v in state.ema_params.items()
                 if k not in warm_ema})
        # TP/FSDP-aware placement: attention projections shard over `model`,
        # fsdp additionally partitions every large leaf (params + Adam moments
        # + EMA) over `data` — see parallel/tp.py; degenerates to full
        # replication when tp == 1 and fsdp is off
        self._state = shard_state(self.mesh, state, fsdp=self.fsdp,
                                  **self._head_hints())
        # donate the incoming state: params/opt/EMA buffers are overwritten in
        # place, halving peak HBM during the update
        self._train_step = self._jit(
            make_train_step(self.loss_module, self._tx), donate_argnums=(0,)
        )
        self._eval_step = self._jit(make_eval_step(self.loss_module))
        return self._state

    def _install_signal_handlers(self):
        def melk(*_a):
            # reference main.py:708-716: dump a rescue checkpoint on signal
            self._should_stop = True
            if self._state is None:
                # signal arrived before the first batch built the state —
                # nothing to rescue; the stop flag still ends fit() cleanly
                print("Signal before first step: nothing to checkpoint.")
                return
            print("Summoning checkpoint (signal).")
            self.save_checkpoint("last", wait=True)

        def divein(*_a):
            # reference main.py:717-726: SIGUSR2 drops into a debugger on the
            # training host (pdb here; the reference uses pudb)
            import pdb

            pdb.set_trace()

        for sig, handler in ((signal.SIGTERM, melk), (signal.SIGUSR1, melk),
                             (signal.SIGUSR2, divein)):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):  # non-main thread
                pass

    # ---------- checkpointing ----------

    def _checkpointer(self):
        if getattr(self, "_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def save_checkpoint(self, name: str, wait: bool = False):
        """Async by default: the host->disk write overlaps the next training
        steps (StandardCheckpointer commits in the background); wait=True
        blocks (rescue saves, end of fit)."""
        path = os.path.abspath(os.path.join(self.logdir, "checkpoints", name))
        ckptr = self._checkpointer()
        # rescue path: the step that failed had the state buffers donated to
        # it (donate_argnums) — nothing recoverable on device; skip rather
        # than masking the original exception
        if any(getattr(x, "is_deleted", lambda: False)()
               for x in jax.tree_util.tree_leaves(self._state)):
            print(f"checkpoint '{name}' skipped: state buffers were donated "
                  "to the failed step")
            return
        # hand Orbax the jax.Arrays directly: it is sharding-aware, so each
        # host serializes only its addressable shards (a device_get here
        # raises on multi-host FSDP/TP-sharded state, and needlessly gathers
        # the full tree otherwise); the host copy happens before save returns,
        # so the next step may donate the device buffers
        ckptr.save(path, self._state, force=True)
        if wait:
            ckptr.wait_until_finished()

    def wait_for_checkpoints(self):
        if getattr(self, "_ckptr", None) is not None:
            self._ckptr.wait_until_finished()

    def _rebuild_topk_from_disk(self):
        """Resume support: re-derive the top-k bookkeeping from the
        metric-embedded checkpoint names, so save_top_k keeps its semantics
        across restarts (no unbounded accumulation of stale 'best' dirs)."""
        ckdir = os.path.join(self.logdir, "checkpoints")
        found = []
        for name in os.listdir(ckdir) if os.path.isdir(ckdir) else []:
            # "step=NNNNNNNN-<monitor>=<score>"; the score is everything
            # after the LAST '=' so negative scores ("...=-0.123") parse too
            if not (name.startswith("step=") and name.count("=") >= 2):
                continue
            try:
                found.append((float(name.rsplit("=", 1)[1]), name))
            except ValueError:
                continue
        ranked = sorted(found, reverse=(self.monitor_mode == "max"))
        # track EVERYTHING found (not ranked[:k]): truncating here would hide
        # on-disk checkpoints from the bookkeeping forever — the next
        # save_topk insert evicts down to save_top_k naturally, and
        # save_top_k < 0 (keep all) must never drop the best entry
        self._topk = ranked

    def restore_checkpoint(self, name: str):
        self.wait_for_checkpoints()
        self._rebuild_topk_from_disk()
        path = os.path.abspath(os.path.join(self.logdir, "checkpoints", name))
        ckptr = self._checkpointer()
        try:
            self._state = ckptr.restore(path, self._state)
        except (ValueError, KeyError, TypeError):
            # tree-structure mismatch only — the legacy layout (round 1):
            # ema_params shadowed the FULL tree; restore with a full-tree
            # template, then strip to trainable groups. Other failure modes
            # (missing/corrupt checkpoint, IO errors) propagate unmasked.
            legacy = self._state.replace(
                ema_params=jax.tree.map(jnp.copy, self._state.params)
            )
            state = ckptr.restore(path, legacy)
            trainable = self.ldm.trainable_filter(state.params)
            self._state = state.replace(ema_params={
                k: v for k, v in state.ema_params.items() if trainable[k]
            })
        return self._state

    def save_topk_checkpoint(self, score: float, monitor: str, step: int):
        """Keep the best save_top_k checkpoints, metric in the filename
        (reference main.py:588-599)."""
        from .checkpointing import save_topk

        # '/'-bearing monitors (e.g. 'val/loss_simple_ema') must not create
        # nested checkpoint dirs — eviction rmtrees the leaf and the resume
        # rebuild parses flat names
        safe_monitor = monitor.replace("/", "_")
        save_topk(self._topk, self.save_top_k, score,
                  f"step={step:08d}-{safe_monitor}={score:.5f}",
                  self.save_checkpoint,
                  os.path.join(self.logdir, "checkpoints"),
                  wait_fn=self.wait_for_checkpoints,
                  mode=self.monitor_mode)

    # ---------- logging ----------

    def log_metrics(self, metrics: Dict, step: int, split: str = "train"):
        if not is_main_process():  # rank_zero_only (reference main.py:318)
            return
        rec = {"step": step, "split": split}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._metrics_file.write(json.dumps(rec) + "\n")
        self._metrics_file.flush()
        if self._ext_logger is not None:
            self._ext_logger.log_metrics(metrics, step, split)

    def _make_log_images_fn(self, n: int, ddim_steps: int):
        """One jitted program for the whole image-logging pass — on the axon
        TPU tunnel an unjitted per-call trace would be a fresh multi-minute
        remote compile every invocation; jit caches on (structure, shapes),
        which are fixed across calls from the same loader.

        Rows match the reference ImageLogger + LatentDiffusion.log_images
        (main.py:298-401, ddpm.py:1252-1361): inputs, reconstruction, EMA
        samples, denoise_row (pred_x0 trajectory), diffusion_row (forward
        q_sample progression at log-spaced t), and — for VQ first stages —
        samples_x0_quantized (pred_x0 snapped through the codebook each step,
        ddim.py:186-187 quantize_denoised)."""
        from ..diffusion import (
            ddim_sample,
            ddim_sample_with_intermediates,
            make_ddim_schedule,
            q_sample,
        )
        from ..models.autoencoder import VQModel

        ddim = make_ddim_schedule(self.ldm.schedule, ddim_steps)
        T = self.ldm.schedule.num_timesteps
        # log-spaced forward ts like the reference's log_every_t row
        diff_ts = sorted({0, T // 8, T // 4, T // 2, 3 * T // 4, T - 1})
        is_vq = isinstance(self.ldm.first_stage, VQModel)

        def fn(params, b, key):
            x = b[self.ldm.first_stage_key][:n]
            if self.ldm.first_stage_key == "latent":
                # cached latents: diffuse as-is (models/ldm.py training_loss);
                # the 'inputs' grid shows their decode
                z = x
                x = self.ldm.decode_first_stage(params, z)
            else:
                z = self.ldm.encode_first_stage(params, x)
            xrec = self.ldm.decode_first_stage(params, z)
            cond = self.ldm.encode_conditioning(
                params, {k: v[:n] for k, v in b.items()}
            )
            samples = self.ldm.sample_ddim(
                params, cond, z.shape, key, steps=ddim_steps
            )
            x_samples = self.ldm.decode_first_stage(params, samples)
            # denoise row: pred_x0 trajectory (reference ImageLogger rows)
            eps_fn = self.ldm.make_eps_fn(params, cond)
            _, traj = ddim_sample_with_intermediates(
                ddim, self.ldm.schedule, eps_fn, z.shape, key,
                log_every=max(1, ddim.num_steps // 4),
            )
            denoise_row = self.ldm.decode_first_stage(params, traj[:, 0])
            # diffusion row: forward q_sample of the first sample at
            # log-spaced t (reference ddpm.py:1285-1298)
            kd = jax.random.split(jax.random.fold_in(key, 1), len(diff_ts))
            z0 = z[:1]
            diff_row = jnp.concatenate([
                self.ldm.decode_first_stage(
                    params,
                    q_sample(self.ldm.schedule, z0,
                             jnp.full((1,), ti, jnp.int32),
                             jax.random.normal(kd[j], z0.shape)),
                ) for j, ti in enumerate(diff_ts)
            ], axis=0)
            out = {"inputs": x, "reconstruction": xrec, "samples": x_samples,
                   "denoise_row": denoise_row, "diffusion_row": diff_row}
            if is_vq:
                sf = self.ldm.scale_factor

                def quantize_x0(p0):
                    q = self.ldm.first_stage.apply(
                        {"params": params["first_stage"]}, p0 / sf,
                        method=lambda m, zz: m.quantize(zz)[0],
                    )
                    return q * sf

                sq = ddim_sample(
                    ddim, self.ldm.schedule, eps_fn, z.shape,
                    jax.random.fold_in(key, 2), eta_noise=False,
                    x0_postprocess=quantize_x0,
                )
                out["samples_x0_quantized"] = self.ldm.decode_first_stage(
                    params, sq)
            return out

        return self._jit(fn)

    def _log_conditioning_grids(self, batch: Dict, step: int, n: int,
                                outdir: str):
        """Host-side conditioning visualization (reference ddpm.py:1269-1282):
        image-valued cond streams are saved as grids; class labels are
        rendered as text images (log_txt_as_img equivalent)."""
        for key in ("shape_image", "masked_image", "identity"):
            if key in batch:
                arr = np.asarray(batch[key][:n], np.float32)
                np.save(os.path.join(
                    outdir, f"conditioning_{key}_step{step:08d}.npy"), arr)
        labels = batch.get("human_label", batch.get("class_label"))
        if labels is None:
            return
        try:
            from PIL import Image, ImageDraw
        except Exception:
            return
        texts = [str(np.asarray(l)) for l in list(labels)[:n]]
        size = int(np.asarray(batch[self.ldm.first_stage_key]).shape[1]) \
            if self.ldm.first_stage_key in batch else 128
        img = Image.new("RGB", (size * len(texts), size), "white")
        draw = ImageDraw.Draw(img)
        for i, txt in enumerate(texts):
            draw.text((i * size + 4, size // 2), txt, fill="black")
        img.save(os.path.join(outdir, f"conditioning_step{step:08d}.png"))

    def log_images(self, batch: Dict, step: int, n: int = 4, ddim_steps: int = 20):
        """Input / reconstruction / sample / diffusion-row grids as npy+png.

        Multi-host: the grid program runs as one global SPMD computation on
        the sharded batch (identical programs on every process), then only
        the main process materializes and writes the grids — the reference's
        rank_zero_only ImageLogger semantics (main.py:318-329)."""
        b = _to_jnp_batch(batch)
        # cache one jitted program per (n, ddim_steps) — a second call with
        # different args must not silently reuse the first program's grids
        if not isinstance(self._log_images_fn, dict):
            self._log_images_fn = {}
        fn = self._log_images_fn.get((n, ddim_steps))
        if fn is None:
            fn = self._log_images_fn[(n, ddim_steps)] = \
                self._make_log_images_fn(n, ddim_steps)
        multihost = jax.process_count() > 1
        # data-axis sharding on every device entry point (matches the train
        # and validate paths; single-process multi-device included)
        b = shard_batch(self.mesh, b)
        grids = fn(self._state.ema_full(), b, jax.random.PRNGKey(step))
        if multihost:
            from jax.experimental import multihost_utils

            grids = multihost_utils.process_allgather(grids)
            if not is_main_process():
                return
        outdir = os.path.join(self.logdir, "images")
        for k, v in grids.items():
            arr = np.asarray(jnp.clip(v, -1, 1))
            np.save(os.path.join(outdir, f"{k}_step{step:08d}.npy"), arr)
            try:
                from PIL import Image

                row = np.concatenate(list((arr + 1) * 127.5), axis=1).astype(np.uint8)
                Image.fromarray(row).save(
                    os.path.join(outdir, f"{k}_step{step:08d}.png")
                )
            except Exception:
                pass
        self._log_conditioning_grids(batch, step, n, outdir)

    # ---------- loops ----------

    def _resolve_val_batches(self, max_batches, data, lim=None) -> Optional[int]:
        """CLI arg wins; else the given limit (default
        lightning.trainer.limit_val_batches; int = count, float = fraction,
        0/0.0 = skip the split entirely — Lightning semantics)."""
        if max_batches is not None:
            return max_batches
        if lim is None:
            lim = self.limit_val_batches
        if lim is None:
            return None
        if lim == 0:  # both 0 and 0.0 mean "disable", not "one batch"
            return 0
        if isinstance(lim, float) and lim <= 1.0:
            return max(1, int(lim * len(data)))
        return int(lim)

    def validate(self, rng: jax.Array, max_batches: Optional[int] = None,
                 data=None, limit=None) -> Dict:
        data = data if data is not None else self.val_data
        max_batches = self._resolve_val_batches(max_batches, data, lim=limit)
        # the loader yields host-local slices, so the static shape to pad to
        # is the PER-PROCESS batch (comparing against the global batch_size
        # would misclassify every batch as ragged under multi-process); the
        # PASSED loader's own batch size wins over the config's (test() or a
        # caller-supplied loader may batch differently)
        global_bs = (getattr(data, "batch_size", None)
                     or self.data_cfg.get("batch_size", 4))
        bs = global_bs // max(jax.process_count(), 1)
        # ragged tails can only be masked when the loss honors the weights;
        # otherwise padding rows would pollute the means — drop instead
        pad_ok = getattr(self.loss_module, "supports_sample_weights", False)
        sums, n = {}, 0.0
        for i, batch in enumerate(data):
            if max_batches is not None and i >= max_batches:
                break
            jb = _to_jnp_batch(batch)
            n_real = next(iter(jb.values())).shape[0]
            if n_real < bs and not pad_ok:
                continue
            if pad_ok:
                # pad ragged tails to the static batch shape (edge-repeat)
                # and attach a 0/1 mask to EVERY batch (full ones included):
                # one pytree structure -> one compiled eval shape, and the
                # masked means are exactly the full-split statistics
                pad = bs - n_real
                if pad:
                    jb = {k: np.concatenate(
                        [v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                        for k, v in jb.items()}
                jb["_sample_weights"] = np.concatenate(
                    [np.ones(n_real, np.float32), np.zeros(pad, np.float32)])
            sb = shard_batch(self.mesh, jb)
            m = self._eval_step(self._state, sb, jax.random.fold_in(rng, i))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v) * n_real
            n += n_real
        return {k: v / max(n, 1) for k, v in sums.items()}

    def test(self, rng: Optional[jax.Array] = None) -> Optional[Dict]:
        """Evaluate the test split (reference trainer.test, main.py:735-736).
        Uses limit_test_batches (default: the FULL split) — the val limit
        must not silently truncate the reported test metrics."""
        if self.test_data is None:
            return None
        metrics = self.validate(rng or jax.random.PRNGKey(0),
                                data=self.test_data,
                                limit=(self.limit_test_batches
                                       if self.limit_test_batches is not None
                                       else 1.0))
        self.log_metrics(metrics, int(self._state.step), split="test")
        return metrics

    def fit(self, epochs: Optional[int] = None, log_every: int = 100,
            image_every: Optional[int] = None, val_max_batches: Optional[int] = None,
            profile_at_step: Optional[int] = None):
        assert self.train_data is not None
        if epochs is None:
            # YAML-driven epoch count (lightning.trainer.max_epochs); an
            # explicit argument (CLI --epochs) wins. Lightning semantics:
            # max_epochs=0 trains nothing; max_steps with max_epochs unset
            # trains until the step limit (not one epoch).
            if self.max_epochs is not None:
                epochs = self.max_epochs
            elif self.max_steps is not None:
                epochs = 10**9  # bounded by _hit_max_steps
            else:
                epochs = 1
        if image_every is None:
            # YAML-driven interval (reference ImageLogger batch_frequency)
            image_every = self.image_every
        self._install_signal_handlers()
        rng = jax.random.PRNGKey(self.seed)
        monitor = self.ldm.monitor
        profiler = None
        if profile_at_step is not None:
            from .profiling import StepProfiler

            profiler = StepProfiler(
                os.path.join(self.logdir, "profile"), profile_at_step
            )

        try:
            self._fit_epochs(epochs, log_every, image_every, val_max_batches,
                             rng, monitor, profiler)
        except BaseException:
            # reference main.py:730-734: melk() rescue-save on any exception
            if self._state is not None:
                print("Summoning checkpoint (exception).")
                self.save_checkpoint("last", wait=True)
            raise
        finally:
            if profiler is not None:
                profiler.ensure_stopped()
            if self._ext_logger is not None:
                try:
                    self._ext_logger.finalize()
                finally:
                    self._ext_logger = None
        self.wait_for_checkpoints()
        return self._state

    def _hit_max_steps(self, step: int) -> bool:
        """max_steps counts OPTIMIZER steps (Lightning global_step): under
        accumulate_grad_batches > 1 optax.MultiSteps applies an update every
        accum-th micro-batch, so the micro-step counter divides down."""
        if self.max_steps is None:
            return False
        return step // max(1, self.grad_accum) >= self.max_steps

    def _fit_epochs(self, epochs, log_every, image_every, val_max_batches,
                    rng, monitor, profiler):
        # resume support: a restored state re-enters at the epoch its step
        # count implies (Lightning resumes from the saved epoch; restarting
        # at 0 would train max_epochs ADDITIONAL epochs). Mid-epoch resumes
        # round down and replay the partial epoch.
        start_epoch = 0
        step = None  # host-side mirror of state.step — no per-iter sync
        if self._state is not None:
            step = int(self._state.step)
            try:
                # NOT clamped to epochs-1: resuming an already-completed run
                # must exit immediately (empty range), not retrain the final
                # epoch past the configured schedule
                start_epoch = step // max(1, len(self.train_data))
            except TypeError:  # unsized iterable loader
                start_epoch = 0
            if start_epoch and hasattr(self.train_data, "epoch"):
                # advance the loader's shuffle-epoch counter so the resumed
                # epochs draw NEW permutations/augmentation seeds instead of
                # replaying epochs 0..N-1's (continuous-run fidelity)
                self.train_data.epoch = max(self.train_data.epoch,
                                            start_epoch)
        for epoch in range(start_epoch, epochs):
            t_epoch = time.time()
            for batch in self.train_data:
                jb = _to_jnp_batch(batch)
                if self._state is None:
                    self.init_state(jb)
                if step is None:
                    step = int(self._state.step)
                sb = shard_batch(self.mesh, jb)
                if profiler is not None:
                    profiler.maybe_start(step + 1)
                self._state, metrics = self._train_step(self._state, sb, rng)
                # the jitted step increments state.step by exactly 1 —
                # mirror it host-side instead of int(state.step), which
                # would block dispatch on device completion every iteration
                step += 1
                if profiler is not None:
                    profiler.maybe_stop(step)
                if step % log_every == 0:
                    self.log_metrics(metrics, step)
                if image_every and step % image_every == 0:
                    # the batch that triggered the interval, like the
                    # reference ImageLogger (main.py:331-358) — not a frozen
                    # first batch
                    self.log_images(batch, step, n=self.log_max_images)
                if self._should_stop or self._hit_max_steps(step):
                    break

            epoch_s = time.time() - t_epoch
            run_val = (epoch + 1) % max(1, self.check_val_every_n_epoch) == 0
            if self._should_stop:
                # a rescue signal already saved 'last' (melk); running the
                # full validation pass here risks a hard kill mid-shutdown
                # under a preemption grace window
                run_val = False
            if self.val_data is not None and run_val:
                from .profiling import device_memory_stats

                val = self.validate(jax.random.fold_in(rng, epoch),
                                    max_batches=val_max_batches)
                score = val.get(monitor, val.get("val_loss"))
                val["epoch_seconds"] = epoch_s
                val.update(device_memory_stats())
                self.log_metrics(val, int(self._state.step), split="val")
                if score is not None:  # val split smaller than one batch
                    self.save_topk_checkpoint(
                        float(score), monitor, int(self._state.step)
                    )
            self.save_checkpoint("last")
            if self._should_stop or self._hit_max_steps(step or 0):
                break
