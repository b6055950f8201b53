"""Shared loader for the native C++ libraries under native/.

Build-on-first-use (make is a no-op when the .so is fresh, a rebuild when
the source changed — the gitignored .so otherwise goes stale) + ctypes
load + symbol declaration, cached per library. Thread-safe: the threaded
DataLoader hits this from worker threads, and two racing `make` runs can
leave a half-written .so that CDLL then loads — a double-checked lock
serializes the build/load and makes late arrivals wait for the winner
instead of silently falling back.

Used by metrics/native.py (libeditdist) and data/native_image.py
(libimagepipe). Returns None on ANY failure so callers use their pure
fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")

_lock = threading.Lock()
_cache: dict = {}  # so_name -> CDLL or None (None = tried and failed)


def load_native_lib(so_name: str,
                    declare: Callable[[ctypes.CDLL], None]
                    ) -> Optional[ctypes.CDLL]:
    """Build (if possible) and load native/<so_name>, run `declare(lib)` to
    set restype/argtypes, cache the result. None if unavailable."""
    if so_name in _cache:  # fast path, no lock once resolved
        return _cache[so_name]
    with _lock:
        if so_name in _cache:
            return _cache[so_name]
        lib_path = os.path.join(NATIVE_DIR, so_name)
        try:
            subprocess.run(["make", "-C", NATIVE_DIR, so_name],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(lib_path):
                _cache[so_name] = None
                return None
        try:
            lib = ctypes.CDLL(lib_path)
            declare(lib)
        except (OSError, AttributeError):
            # unloadable .so, or a stale one missing the expected symbols
            lib = None
        _cache[so_name] = lib
        return lib
