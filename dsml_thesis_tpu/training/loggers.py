"""Pluggable experiment-logger backends for the Trainer.

Parity target: reference main.py:552-576 — the Lightning logger is selected
by `lightning.logger.target` (WandbLogger / TestTubeLogger, default
testtube). Here the Trainer ALWAYS writes `metrics.jsonl` (the functional
observability spine); this module adds the reference-style selectable
backend on top:

  lightning:
    logger:
      target: pytorch_lightning.loggers.WandbLogger     # -> wandb backend
      params: {name: run-name, offline: true, project: dsml}
  # or ...loggers.TestTubeLogger / CSVLogger            # -> csv backend

wandb is not baked into this image: the wandb backend activates only when
the package imports; otherwise it degrades to the csv backend with a
warning (zero-egress environments run offline anyway).
"""
from __future__ import annotations

import csv
import os
import sys
from typing import Dict, Optional


class CsvBackend:
    """TestTube/CSVLogger-equivalent: long-format metrics csv next to
    metrics.jsonl."""

    def __init__(self, logdir: str, name: str = "metrics"):
        self.path = os.path.join(logdir, f"{name}.csv")
        new = not os.path.exists(self.path)
        self._f = open(self.path, "a", newline="")
        self._w = csv.writer(self._f)
        if new:
            self._w.writerow(["step", "split", "metric", "value"])

    def log_metrics(self, metrics: Dict, step: int, split: str):
        for k, v in metrics.items():
            self._w.writerow([step, split, k, float(v)])
        self._f.flush()

    def finalize(self):
        self._f.close()


class WandbBackend:
    def __init__(self, logdir: str, params: Dict):
        import wandb  # gated by build_logger

        self._wandb = wandb
        self.run = wandb.init(
            project=params.get("project", "dsml-thesis-tpu"),
            name=params.get("name"),
            id=params.get("id"),
            dir=params.get("save_dir", logdir),
            mode="offline" if params.get("offline") else
                 params.get("mode", "online"),
            resume="allow",
        )

    def log_metrics(self, metrics: Dict, step: int, split: str):
        self._wandb.log(
            {f"{split}/{k}": float(v) for k, v in metrics.items()}, step=step)

    def finalize(self):
        self.run.finish()


def build_logger(lightning_cfg: Dict, logdir: str) -> Optional[object]:
    """lightning.logger config -> backend instance (None = jsonl only)."""
    lg = (lightning_cfg or {}).get("logger")
    if not lg:
        return None
    target = lg.get("target", "")
    params = dict(lg.get("params", {}))
    if target.endswith("WandbLogger"):
        try:
            import wandb  # noqa: F401
        except ImportError:
            print("logger: wandb not installed; falling back to csv backend",
                  file=sys.stderr)
            return CsvBackend(logdir)
        return WandbBackend(logdir, params)
    if target.endswith(("TestTubeLogger", "CSVLogger")):
        return CsvBackend(logdir, params.get("name", "metrics"))
    # Reference main.py:552-576 instantiates arbitrary logger targets; a
    # config carried over with e.g. CometLogger should not abort the run
    # before step 0 — degrade to the csv backend (same policy as the
    # wandb-absent path above) and say so loudly.
    print(f"logger: unrecognized target {target!r} (supported: WandbLogger, "
          "TestTubeLogger, CSVLogger); falling back to csv backend",
          file=sys.stderr)
    return CsvBackend(logdir, params.get("name", "metrics"))
