"""ctypes bindings for the native image-loading pipeline (native/imagepipe.cc).

The C++ library fuses decode (libjpeg/libpng) + the PIL-equivalent bicubic
smallest-side resize + crop + [-1, 1] fp32 normalization, resampling ONLY
the crop window — and ctypes releases the GIL for the duration of each
call, so the threaded DataLoader (data/datasets.py) gets true decode
parallelism. TPU-native counterpart of the reference's torch DataLoader
worker processes (face_reenactment/main.py:733 `num_workers`).

Opt-in via DSML_NATIVE_IMAGE=1 (datasets.load_image dispatches here): the
resample matches PIL's two-pass design including the uint8 quantization of
the horizontal intermediate; the only remaining divergence is PIL's
fixed-point filter weights vs fp64 here, ≤1-2/255 per pixel — the oracle
dataset-parity tests therefore pin the PIL path. Builds the .so on first
use (thread-safe, see native_lib.py); every entry returns None on any
failure so callers fall back to PIL per file.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ..flags import env_flag
from ..native_lib import load_native_lib


def _declare(lib: ctypes.CDLL) -> None:
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ip_load_image.restype = ctypes.c_int
    lib.ip_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.ip_probe_resized.restype = ctypes.c_int
    lib.ip_probe_resized.argtypes = [
        ctypes.c_char_p, ctypes.c_int, i32p, i32p,
    ]
    lib.ip_load_batch.restype = ctypes.c_int
    lib.ip_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        i32p, f32p, ctypes.c_int, i32p,
    ]


def _load() -> Optional[ctypes.CDLL]:
    return load_native_lib("libimagepipe.so", _declare)


def available() -> bool:
    return _load() is not None


def enabled() -> bool:
    """The datasets dispatch gate: opt-in env + loadable library."""
    return env_flag("DSML_NATIVE_IMAGE", False) and available()


def probe_resized(path: str, size: int) -> Optional[Tuple[int, int]]:
    """Post-resize (w, h) from the image header alone, or None. Lets the
    caller draw random-crop offsets with rng semantics byte-identical to
    the PIL path before the (expensive) decode."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    rc = lib.ip_probe_resized(os.fsencode(path), int(size),
                              ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return int(w.value), int(h.value)


def load_image_native(path: str, size: int,
                      crop_xy: Optional[Tuple[int, int]] = None
                      ) -> Optional[np.ndarray]:
    """Fused decode+resize+crop+normalize: fp32 [size, size, 3] in [-1, 1],
    or None on any failure (caller falls back to PIL). crop_xy is the crop
    origin in the resized image; None = center crop."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), dtype=np.float32)
    x0, y0 = crop_xy if crop_xy is not None else (-1, -1)
    rc = lib.ip_load_image(
        os.fsencode(path), int(size), int(x0), int(y0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return out


def load_image_batch(paths: Sequence[str], size: int,
                     crop_xy: Optional[np.ndarray] = None,
                     threads: int = 8
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Batch decode through the library's internal thread pool. Returns
    (images [N, size, size, 3] fp32, status [N] int32 — 0 ok, negative
    failed; failed rows are undefined and must be refilled by the caller),
    or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    if n <= 0 or size <= 0:
        # the C++ entry returns early WITHOUT touching status for these —
        # an np.empty buffer would come back as 'successfully decoded' junk
        raise ValueError(f"load_image_batch needs n > 0 and size > 0 "
                         f"(got n={n}, size={size})")
    out = np.empty((n, size, size, 3), dtype=np.float32)
    status = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    i32p = ctypes.POINTER(ctypes.c_int32)
    xy = None
    if crop_xy is not None:
        xy = np.ascontiguousarray(crop_xy, dtype=np.int32)
        if xy.shape != (n, 2):
            raise ValueError(f"crop_xy must be [N, 2], got {xy.shape}")
    lib.ip_load_batch(
        arr, n, int(size),
        xy.ctypes.data_as(i32p) if xy is not None else None,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(threads), status.ctypes.data_as(i32p),
    )
    return out, status
