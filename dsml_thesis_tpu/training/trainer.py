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
from ..parallel import is_main_process, make_mesh, replicate, shard_batch
from .train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def _to_jnp_batch(batch: Dict, keys=None):
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
                 mesh=None, max_steps: Optional[int] = None):
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
        self.mesh = mesh if mesh is not None else make_mesh()

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
        # eval splits drop the ragged tail (< batch_size samples): SPMD
        # sharding needs the batch axis divisible by the data mesh — a
        # documented divergence from the reference's full-set validation
        if "validation" in self.data_cfg:
            self.val_data = DataLoader(
                instantiate_from_config(self.data_cfg["validation"]),
                batch_size=bs, shuffle=False, num_workers=nw, seed=seed,
            )
        if "test" in self.data_cfg:
            self.test_data = DataLoader(
                instantiate_from_config(self.data_cfg["test"]),
                batch_size=bs, shuffle=False, num_workers=nw, seed=seed,
            )

        # LR scaling (reference main.py:686-701)
        base_lr = self.model_cfg.get("base_learning_rate", 1e-6)
        accumulate = self.lightning_cfg.get("trainer", {}).get(
            "accumulate_grad_batches", 1
        )
        if config.get("scale_lr", True):
            self.lr = accumulate * bs * base_lr
        else:
            self.lr = base_lr
        self.grad_accum = accumulate

        self._state: Optional[TrainState] = None
        self._tx = None
        self._train_step = None
        self._eval_step = None
        self._log_images_fn = None
        self._should_stop = False
        self._metrics_file = open(os.path.join(logdir, "metrics.jsonl"), "a")
        # top-k checkpoint tracking (reference ModelCheckpoint save_top_k=5
        # with metric-embedded filenames, main.py:580-599)
        self.save_top_k = self.lightning_cfg.get("modelcheckpoint", {}).get(
            "params", {}
        ).get("save_top_k", 5)
        self._topk: list = []  # [(score, name)] sorted best-first

    # ---------- setup ----------

    def _augment_params(self, params: Dict) -> Dict:
        """Hook for subclasses to add frozen param groups (e.g. guidance
        towers) before the optimizer/EMA partition is built."""
        return params

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
        scheduler_cfg = self.model_cfg.get("params", {}).get("scheduler_config")
        self._tx = make_optimizer(
            self.ldm, params, base_lr=self.lr,
            scheduler_config=scheduler_cfg, grad_accum=self.grad_accum,
        )
        state = create_train_state(self.ldm, params, self._tx)
        self._state = replicate(self.mesh, state)
        # donate the incoming state: params/opt/EMA buffers are overwritten in
        # place, halving peak HBM during the update
        self._train_step = jax.jit(
            make_train_step(self.loss_module, self._tx), donate_argnums=(0,)
        )
        self._eval_step = jax.jit(make_eval_step(self.loss_module))
        return self._state

    def _install_signal_handlers(self):
        def melk(*_a):
            # reference main.py:708-716: dump a rescue checkpoint on signal
            print("Summoning checkpoint (signal).")
            self.save_checkpoint("last", wait=True)
            self._should_stop = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, melk)
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
        try:
            state = jax.device_get(self._state)
        except RuntimeError as e:
            # rescue path: the step that failed had the state buffers donated
            # to it (donate_argnums) — nothing recoverable on device; skip
            # rather than masking the original exception
            print(f"checkpoint '{name}' skipped: state unavailable ({e})")
            return
        ckptr.save(path, state, force=True)
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
            if name.startswith("step=") and "=" in name.rsplit("-", 1)[-1]:
                try:
                    found.append((float(name.rsplit("=", 1)[1]), name))
                except ValueError:
                    continue
        self._topk = sorted(found)[: self.save_top_k]

    def restore_checkpoint(self, name: str):
        self.wait_for_checkpoints()
        self._rebuild_topk_from_disk()
        path = os.path.abspath(os.path.join(self.logdir, "checkpoints", name))
        ckptr = self._checkpointer()
        try:
            self._state = ckptr.restore(path, self._state)
        except Exception:
            # legacy layout (round 1): ema_params shadowed the FULL tree;
            # restore with a full-tree template, then strip to trainable groups
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

        save_topk(self._topk, self.save_top_k, score,
                  f"step={step:08d}-{monitor}={score:.5f}",
                  self.save_checkpoint,
                  os.path.join(self.logdir, "checkpoints"),
                  wait_fn=self.wait_for_checkpoints)

    # ---------- logging ----------

    def log_metrics(self, metrics: Dict, step: int, split: str = "train"):
        if not is_main_process():  # rank_zero_only (reference main.py:318)
            return
        rec = {"step": step, "split": split}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._metrics_file.write(json.dumps(rec) + "\n")
        self._metrics_file.flush()

    def _make_log_images_fn(self, n: int, ddim_steps: int):
        """One jitted program for the whole image-logging pass — on the axon
        TPU tunnel an unjitted per-call trace would be a fresh multi-minute
        remote compile every invocation; jit caches on (structure, shapes),
        which are fixed across calls from the same loader."""
        from ..diffusion import ddim_sample_with_intermediates, make_ddim_schedule

        ddim = make_ddim_schedule(self.ldm.schedule, ddim_steps)

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
            return {"inputs": x, "reconstruction": xrec, "samples": x_samples,
                    "denoise_row": denoise_row}

        return jax.jit(fn)

    def log_images(self, batch: Dict, step: int, n: int = 4, ddim_steps: int = 20):
        """Input / VQ-reconstruction / conditional sample grids as npy+png."""
        if jax.process_count() > 1:
            # the grid program runs on host-local (non-addressable-globally)
            # arrays; skipping keeps every process's device program identical
            return
        b = _to_jnp_batch(batch)
        if self._log_images_fn is None:
            self._log_images_fn = self._make_log_images_fn(n, ddim_steps)
        grids = self._log_images_fn(
            self._state.ema_full(), b, jax.random.PRNGKey(step)
        )
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

    # ---------- loops ----------

    def validate(self, rng: jax.Array, max_batches: Optional[int] = None,
                 data=None) -> Dict:
        sums, n = {}, 0
        for i, batch in enumerate(data if data is not None else self.val_data):
            if max_batches is not None and i >= max_batches:
                break
            sb = shard_batch(self.mesh, _to_jnp_batch(batch))
            m = self._eval_step(self._state, sb, jax.random.fold_in(rng, i))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    def test(self, rng: Optional[jax.Array] = None) -> Optional[Dict]:
        """Evaluate the test split (reference trainer.test, main.py:735-736)."""
        if self.test_data is None:
            return None
        metrics = self.validate(rng or jax.random.PRNGKey(0), data=self.test_data)
        self.log_metrics(metrics, int(self._state.step), split="test")
        return metrics

    def fit(self, epochs: int = 1, log_every: int = 100,
            image_every: Optional[int] = None, val_max_batches: Optional[int] = None,
            profile_at_step: Optional[int] = None):
        assert self.train_data is not None
        self._install_signal_handlers()
        rng = jax.random.PRNGKey(self.seed)
        monitor = self.ldm.monitor
        first_batch = None
        profiler = None
        if profile_at_step is not None:
            from .profiling import StepProfiler

            profiler = StepProfiler(
                os.path.join(self.logdir, "profile"), profile_at_step
            )

        try:
            self._fit_epochs(epochs, log_every, image_every, val_max_batches,
                             rng, monitor, first_batch, profiler)
        except BaseException:
            # reference main.py:730-734: melk() rescue-save on any exception
            if self._state is not None:
                print("Summoning checkpoint (exception).")
                self.save_checkpoint("last", wait=True)
            raise
        finally:
            if profiler is not None:
                profiler.ensure_stopped()
        self.wait_for_checkpoints()
        return self._state

    def _fit_epochs(self, epochs, log_every, image_every, val_max_batches,
                    rng, monitor, first_batch, profiler):
        for epoch in range(epochs):
            t_epoch = time.time()
            for batch in self.train_data:
                jb = _to_jnp_batch(batch)
                if self._state is None:
                    self.init_state(jb)
                if first_batch is None:
                    first_batch = batch
                sb = shard_batch(self.mesh, jb)
                step_next = int(self._state.step) + 1
                if profiler is not None:
                    profiler.maybe_start(step_next)
                self._state, metrics = self._train_step(self._state, sb, rng)
                step = int(self._state.step)
                if profiler is not None:
                    profiler.maybe_stop(step)
                if step % log_every == 0:
                    self.log_metrics(metrics, step)
                if image_every and step % image_every == 0:
                    self.log_images(first_batch, step)
                if self._should_stop or (
                    self.max_steps is not None and step >= self.max_steps
                ):
                    break

            epoch_s = time.time() - t_epoch
            if self.val_data is not None:
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
            if self._should_stop or (
                self.max_steps is not None and int(self._state.step) >= self.max_steps
            ):
                break
