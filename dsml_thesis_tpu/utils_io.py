"""Parameter loading: torch reference checkpoints, Orbax dirs, or fresh init."""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax


def probe_backend_with_retry(max_tries: Optional[int] = None,
                             sleep_s: Optional[float] = None,
                             probe_s: Optional[float] = None) -> bool:
    """Bounded liveness probe for the TPU backend, in a CHILD process.

    The backend rides a remote tunnel that can be transiently down — and a
    downed tunnel makes backend init (the first device-array creation)
    HANG rather than raise, which turns any tool that merely imports
    flax/optax into a silent infinite wait. Probing `jax.devices()` in a
    bounded subprocess keeps this process's backend state clean; retries
    are spaced DSML_BENCH_RETRY_SLEEP s (default 180) apart, up to
    DSML_BENCH_RETRIES times (default 3), each with a
    DSML_BENCH_PROBE_TIMEOUT s cap (default 120). Returns True if a probe
    succeeded; False means "proceed anyway and let the real init surface
    the error". Shared by bench.py and scripts/parity_e2e.py."""
    import subprocess
    import sys
    import time

    max_tries = int(os.environ.get("DSML_BENCH_RETRIES", "3")
                    if max_tries is None else max_tries)
    sleep_s = float(os.environ.get("DSML_BENCH_RETRY_SLEEP", "180")
                    if sleep_s is None else sleep_s)
    probe_s = float(os.environ.get("DSML_BENCH_PROBE_TIMEOUT", "120")
                    if probe_s is None else probe_s)
    for attempt in range(1 + max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('BACKEND_OK')"],
                timeout=probe_s, capture_output=True)
            if r.returncode == 0 and b"BACKEND_OK" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt == max_tries:
            print("# backend probe never succeeded; proceeding anyway",
                  file=sys.stderr)
            return False
        print(f"# backend probe failed (tunnel down?); retry "
              f"{attempt + 1}/{max_tries} in {sleep_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(sleep_s)
    return False


def cast_sampling_params(params: Dict, dtype=None) -> Dict:
    """Cast fp32 params to bf16 for inference/sampling.

    Halves per-eval weight HBM traffic in the denoising loop (the UNet
    computes in bf16 anyway; norms upcast internally). Training/EMA state
    stays fp32 — use only on sampling paths.
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    return jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        params,
    )


def _flatten(tree: Dict, prefix: str = ""):
    for k, v in tree.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _flatten(v, path + "/")
        else:
            yield path, v


def surgical_load(
    template: Dict,
    loaded: Dict,
    ignore_keys: Sequence[str] = (),
    only: Optional[Sequence[str]] = (),
) -> Dict:
    """Merge `loaded` params into a fresh `template` tree.

    Parity with the reference's init_from_ckpt(ignore_keys, only_model)
    (ddpm.py:186-201): entries whose path starts with any ignore_keys prefix
    keep the template (fresh) value; if `only` is non-empty, ONLY paths under
    those prefixes are taken from `loaded`. Missing/extra keys are tolerated
    (kept fresh / dropped) like torch load_state_dict(strict=False).
    """
    loaded_flat = dict(_flatten(loaded))

    def rebuild(node, prefix=""):
        out = {}
        for k, v in node.items():
            path = f"{prefix}{k}"
            if isinstance(v, dict):
                out[k] = rebuild(v, path + "/")
                continue
            use_loaded = path in loaded_flat
            if use_loaded and any(path.startswith(ig) for ig in ignore_keys):
                use_loaded = False
            if use_loaded and only and not any(path.startswith(o) for o in only):
                use_loaded = False
            out[k] = loaded_flat[path] if use_loaded else v
        return out

    return rebuild(template)


def load_params(
    ckpt: Optional[str],
    ldm,
    model_cfg: Dict,
    use_ema: bool = True,
    example_batch: Optional[Dict] = None,
    seed: int = 0,
) -> Dict:
    """Resolve a params pytree from:
      - a torch `.ckpt`/`.pt` file (reference Lightning checkpoint, converted;
        EMA weights preferred like the reference's ema_scope sampling)
      - an Orbax checkpoint directory saved by training.trainer (ema_params
        preferred)
      - None -> fresh random init from example_batch (smoke/benchmark use)
    """
    if ckpt is None:
        assert example_batch is not None, "need example batch for fresh init"
        return ldm.init_params(jax.random.PRNGKey(seed), example_batch)
    if os.path.isdir(ckpt):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # trainer checkpoints store a full TrainState; accept either layout
        try:
            state = ckptr.restore(os.path.abspath(ckpt))
            if isinstance(state, dict) and "ema_params" in state:
                # ema_params shadows the trainable groups only; merge over the
                # full tree (frozen first stage lives in params)
                if use_ema:
                    return {**state["params"], **state["ema_params"]}
                return state["params"]
            return state
        except Exception as e:
            # fallback: some layouts need a structure template — built only
            # here (a full random init is a multi-minute remote compile on
            # axon, wasted in the common templateless-success case)
            assert example_batch is not None, (
                f"templateless restore failed ({e}) and no example_batch "
                "was given to build a template"
            )
            template = ldm.init_params(jax.random.PRNGKey(seed), example_batch)
            try:
                return ckptr.restore(os.path.abspath(ckpt), template)
            except Exception as e2:
                raise RuntimeError(
                    f"checkpoint restore failed with and without template: "
                    f"{e!r} / {e2!r}"
                ) from e2
    from .convert import load_ema_or_raw

    return load_ema_or_raw(ckpt, ldm, model_cfg, use_ema=use_ema)
