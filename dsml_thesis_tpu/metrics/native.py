"""ctypes bindings for the native batched edit-distance kernel.

Builds native/libeditdist.so on first use through the shared thread-safe
loader (native_lib.py); falls back to None so callers use the pure-Python
DP (metrics/lipread.py).
"""
from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from ..native_lib import load_native_lib


def _declare(lib: ctypes.CDLL) -> None:
    lib.edit_distance_i32.restype = ctypes.c_int64
    lib.edit_distance_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.edit_distance_batch_i32.restype = None
    lib.edit_distance_batch_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]


def _load() -> Optional[ctypes.CDLL]:
    return load_native_lib("libeditdist.so", _declare)


def edit_distance_batch(refs: Sequence[Sequence],
                        hyps: Sequence[Sequence]) -> Optional[np.ndarray]:
    """Native batched edit distances, or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if len(refs) != len(hyps):  # explicit: python -O strips asserts and the
        raise ValueError(       # C kernel would read offsets out of bounds
            f"refs/hyps length mismatch: {len(refs)} vs {len(hyps)}"
        )
    # shared vocab so equal tokens get equal ids across both sides
    vocab: dict = {}

    def encode(seqs):
        flat, offs = [], [0]
        for s in seqs:
            for tok in s:
                flat.append(vocab.setdefault(tok, len(vocab)))
            offs.append(len(flat))
        return (np.asarray(flat or [0], np.int32), np.asarray(offs, np.int64))

    fa, oa = encode(refs)
    fb, ob = encode(hyps)
    out = np.zeros(len(refs), dtype=np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.edit_distance_batch_i32(
        fa.ctypes.data_as(i32p), oa.ctypes.data_as(i64p),
        fb.ctypes.data_as(i32p), ob.ctypes.data_as(i64p),
        len(refs), out.ctypes.data_as(i64p),
    )
    return out
