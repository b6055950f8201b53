"""Strict parsing for the DSML_* environment flags.

The repo's perf methodology is env-flag A/Bs recorded in PROFILE.md, so a
misparsed flag silently measures the wrong arm. Two historical hazards this
module removes:

- opposite parse directions at different sites ("== '1'" vs "!= '0'"): a
  user exporting FLAG=true could silently DISABLE one default-on lever and
  leave another ON via FLAG=false;
- unrecognized values silently selecting a default mode (a typo'd
  DSML_GN_EPILOGUE=res_interpret benchmarking the unfused baseline under a
  "fusion" label).

Both now raise. All boolean flags accept 1/true/on/yes and 0/false/off/no
(case-insensitive); mode flags accept their documented vocabulary with the
boolean spellings normalized first (so FLAG=true selects the "1" mode).
"""
from __future__ import annotations

import os

_TRUE = ("1", "true", "on", "yes")
_FALSE = ("0", "false", "off", "no")


def _normalize(name: str, raw: str) -> str:
    v = raw.strip().lower()
    if v in _TRUE:
        return "1"
    if v in _FALSE:
        return "0"
    return v


def env_flag(name: str, default: bool) -> bool:
    """Boolean env flag: unset -> default; unrecognized values raise."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    v = _normalize(name, raw)
    if v == "1":
        return True
    if v == "0":
        return False
    raise ValueError(
        f"{name}={raw!r}: expected a boolean "
        f"({'/'.join(_TRUE)} or {'/'.join(_FALSE)})")


def env_mode(name: str, default: str, choices: tuple) -> str:
    """Mode env flag (e.g. 'auto'/'1'/'0', or the GN-epilogue modes):
    unset -> default; boolean spellings normalize to '1'/'0'; anything
    outside `choices` raises instead of silently selecting a fallback."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    v = _normalize(name, raw)
    if v in choices:
        return v
    raise ValueError(f"{name}={raw!r}: expected one of {choices}")
