#!/usr/bin/env python
"""Training CLI, reference-compatible surface.

Usage (mirrors /root/reference/*/main.py:33-753):
  python main.py --base configs/latent-diffusion/<cfg>.yaml -t \
      [--logdir logs] [--seed 123] [--resume <logdir|ckpt>] \
      [nested.key=value ...]
"""
import argparse
import datetime
import glob
import os
import sys

import jax


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", default=[],
                   help="config yaml(s), merged left-to-right")
    p.add_argument("-t", "--train", action="store_true", default=False)
    p.add_argument("-r", "--resume", type=str, default="",
                   help="resume from logdir or checkpoint dir")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-s", "--seed", type=int, default=123)
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--max-steps", "--max_steps", type=int, default=None)
    p.add_argument("--scale_lr", type=str, default="true")
    p.add_argument("--no-test", action="store_true", default=False)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree over the mesh `model` axis "
                        "(attention projections shard Megatron-style; see "
                        "parallel/tp.py)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style sharding: partition params, optimizer "
                        "moments, and EMA over the `data` axis (parallel/tp.py "
                        "fsdp_spec); composes with --tp into 2-D shardings")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-host DCN pods)")
    p.add_argument("-d", "--debug", action="store_true",
                   help="drop into pdb post-mortem on a training exception "
                        "(rank zero only; reference main.py:737-743)")
    return p


def main():
    parser = get_parser()
    opt, unknown = parser.parse_known_args()
    if opt.cpu:
        jax.config.update("jax_platforms", "cpu")
    if opt.multihost:
        # multi-host: mesh spans all global devices; per-host data loading.
        # The helper is idempotent (safe under wrapper scripts that already
        # initialized) — a bare jax.distributed.initialize() would raise on
        # a second call.
        from dsml_thesis_tpu.parallel import distributed_init

        distributed_init(require_cluster=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import load_config
    from dsml_thesis_tpu.training.trainer import Trainer

    if opt.resume:
        if not os.path.isdir(opt.resume):
            raise ValueError(
                "--resume expects a run logdir or a checkpoint DIRECTORY "
                "inside it (checkpoints are Orbax directories, not files)"
            )
        path = opt.resume.rstrip("/")
        if os.path.basename(os.path.dirname(path)) == "checkpoints":
            # a specific checkpoint dir: logs/<run>/checkpoints/<name>
            resume_ckpt = os.path.basename(path)
            logdir = os.path.dirname(os.path.dirname(path))
        else:
            logdir = path
            resume_ckpt = "last"
        base_configs = sorted(glob.glob(os.path.join(logdir, "configs/*.yaml")))
        if not base_configs and not opt.base:
            raise ValueError(f"no saved configs under {logdir}/configs")
        opt.base = base_configs + opt.base
    else:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        if jax.process_count() > 1:
            # every process must agree on the logdir (Orbax saves commit
            # across processes); broadcast process 0's timestamp
            from jax.experimental import multihost_utils
            import numpy as _np
            import time as _time

            t0 = multihost_utils.broadcast_one_to_all(
                _np.asarray(_time.time(), _np.float64)
            )
            now = datetime.datetime.fromtimestamp(float(t0)).strftime(
                "%Y-%m-%dT%H-%M-%S"
            )
        if opt.name:
            cfg_name = opt.name
        elif opt.base:
            cfg_name = os.path.splitext(os.path.basename(opt.base[0]))[0]
        else:
            cfg_name = "run"
        logdir = os.path.join(opt.logdir, f"{now}_{cfg_name}")
        resume_ckpt = None

    config = load_config(opt.base, overrides=unknown)
    config["scale_lr"] = opt.scale_lr.lower() in ("true", "1", "yes")

    os.makedirs(os.path.join(logdir, "configs"), exist_ok=True)
    import yaml

    with open(os.path.join(logdir, "configs", "project.yaml"), "w") as f:
        yaml.safe_dump(config, f)

    model_target = config["model"]["target"]
    from dsml_thesis_tpu.config import is_finetune_target

    if "autoencoder" in model_target and (
            "VQModel" in model_target or "AutoencoderKL" in model_target):
        if opt.tp > 1:
            # TP_RULES shard the LDM attention projections; the AE param
            # names never match, so --tp would silently run pure-DP
            raise SystemExit(
                "--tp applies to LDM/finetune training only; first-stage "
                "autoencoder training supports --fsdp"
            )
        from dsml_thesis_tpu.training.vqgan_trainer import (
            KLAETrainer,
            VQGANTrainer,
        )

        cls = VQGANTrainer if "VQModel" in model_target else KLAETrainer
        trainer = cls(config, logdir, seed=opt.seed,
                      max_steps=opt.max_steps, fsdp=opt.fsdp)
    elif is_finetune_target(model_target):
        from dsml_thesis_tpu.training.finetune_trainer import FinetuneTrainer

        trainer = FinetuneTrainer(config, logdir, seed=opt.seed,
                                  max_steps=opt.max_steps,
                                  tp=opt.tp, fsdp=opt.fsdp)
    else:
        trainer = Trainer(config, logdir, seed=opt.seed, max_steps=opt.max_steps,
                          tp=opt.tp, fsdp=opt.fsdp)
    print(f"logdir: {logdir}; devices: {jax.device_count()}; lr: {trainer.lr:.3e}")

    if opt.train:
        # None -> Trainer.fit defaults from lightning.trainer.max_epochs
        epochs = opt.epochs or None
        if resume_ckpt is not None:
            # build state lazily from the first batch, then restore
            first = next(iter(trainer.train_data))
            trainer.init_state(first)
            trainer.restore_checkpoint(resume_ckpt)
        try:
            trainer.fit(epochs=epochs)
        except Exception:
            # rescue checkpoint already saved by Trainer.fit's except path
            if opt.debug and jax.process_index() == 0:
                import pdb
                import traceback

                traceback.print_exc()
                pdb.post_mortem()
            raise
        print("training done; final step:", int(trainer._state.step))
        if not opt.no_test and hasattr(trainer, "test"):
            test_metrics = trainer.test()
            if test_metrics:
                print("test:", {k: round(v, 5) for k, v in test_metrics.items()})


if __name__ == "__main__":
    main()
