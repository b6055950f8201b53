"""Parameter loading: torch reference checkpoints, Orbax dirs, or fresh init."""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax


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

        assert example_batch is not None
        template = ldm.init_params(jax.random.PRNGKey(seed), example_batch)
        ckptr = ocp.StandardCheckpointer()
        # trainer checkpoints store a full TrainState; accept either layout
        try:
            from .training.train_state import TrainState
            import jax.numpy as jnp
            import optax

            state = ckptr.restore(os.path.abspath(ckpt))
            if isinstance(state, dict) and "ema_params" in state:
                return state["ema_params"] if use_ema else state["params"]
            return state
        except Exception:
            return ckptr.restore(os.path.abspath(ckpt), template)
    from .convert import load_ema_or_raw

    return load_ema_or_raw(ckpt, ldm, model_cfg, use_ema=use_ema)
