"""Shared top-k checkpoint bookkeeping.

Reference: PyTorch Lightning ModelCheckpoint with save_top_k and
metric-embedded filenames (main.py:588-599). mode="min" (losses, the
reference default) or mode="max" (e.g. a PSNR monitor).
"""
from __future__ import annotations

import os
import shutil
from typing import Callable, List, Optional, Tuple

from ..parallel import is_main_process


def save_topk(
    topk: List[Tuple[float, str]],
    save_top_k: int,
    score: float,
    name: str,
    save_fn: Callable[[str], None],
    ckpt_dir: str,
    wait_fn: Optional[Callable[[], None]] = None,
    mode: str = "min",
) -> None:
    """Insert (score, name) into the best-first `topk` list in place, saving
    via save_fn and evicting the worst on overflow. Skips the (multi-GB)
    serialization outright when the score cannot enter the top-k. wait_fn
    blocks on in-flight async saves before eviction deletes directories.

    Lightning-legal sentinels: save_top_k == 0 disables monitored
    checkpointing entirely; save_top_k < 0 keeps every checkpoint."""
    assert mode in ("min", "max")
    if save_top_k == 0:
        return
    if save_top_k < 0:
        save_fn(name)
        topk.append((score, name))
        topk.sort(key=lambda t: t[0], reverse=(mode == "max"))
        return
    worse = (lambda a, b: a >= b) if mode == "min" else (lambda a, b: a <= b)
    if len(topk) >= save_top_k and worse(score, topk[-1][0]):
        return
    save_fn(name)
    topk.append((score, name))
    topk.sort(key=lambda t: t[0], reverse=(mode == "max"))
    if wait_fn is not None and len(topk) > save_top_k:
        wait_fn()  # don't delete an in-flight save
    while len(topk) > save_top_k:
        _, worst = topk.pop()
        if is_main_process():  # shared fs: evict once
            shutil.rmtree(os.path.join(ckpt_dir, worst), ignore_errors=True)
