"""XLA cost-analysis roofline for the flagship sampling pipeline.

Rates measured throughput against v5e hardware peaks so "fast" is a
hardware statement, not just a target ratio. XLA's compiled cost analysis
counts a lax.scan body ONCE, so pipeline totals are assembled from
per-component analyses (UNet eval, VQ encode, VQ decode) times their trip
counts — the same structure bench.py executes (S*F UNet evals + B*F
masked-frame encodes [identity folded in] + B*F decodes).

Shared by scripts/perf_breakdown.py --mfu and bench.py (which emits the
utilization as `mfu` / `hbm_util` JSON fields so BENCH_r*.json records
track utilization alongside fps).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .flags import env_flag

V5E_PEAK_BF16 = 197e12   # FLOP/s per chip
V5E_HBM_BW = 819e9       # bytes/s per chip


def _cost(jitted, *a):
    ca = jitted.lower(*a).compile().cost_analysis()
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def component_costs(ldm, cfg, params, B: int, F: int, res: int,
                    guidance: float = 2.0) -> Dict[str, tuple]:
    """FLOPs + HBM bytes of one UNet eval (in the exact CFG/dedup form the
    pipeline runs), one B*F-frame VQ encode, and one B*F-frame VQ decode
    (the pipeline batch-encodes the masked frames and vmap-decodes the
    clip, so one big call is the right weight-traffic model)."""
    mp = cfg["model"]["params"]
    ctx_dim = mp["unet_config"]["params"]["context_dim"]
    ddc = mp["first_stage_config"]["params"]["ddconfig"]
    zc = ddc["z_channels"]
    lat = res // (1 << (len(ddc["ch_mult"]) - 1))

    cfg_on = guidance != 1.0
    # env_flag, not a raw read: the cost model must see the SAME dedup
    # decision the pipeline makes (and a typo'd value must raise, not
    # silently model the wrong UNet batch)
    dedup = cfg_on and env_flag("DSML_CFG_DEDUP", True)
    nb = 2 * B if (cfg_on and not dedup) else B
    ctx = jnp.zeros((2 * B if cfg_on else B, 1, ctx_dim))
    x = jnp.zeros((nb, lat, lat, zc))
    t = jnp.zeros((nb,), jnp.int32)
    cc = jnp.zeros((nb, lat, lat, 2 * zc))
    unet_fn = jax.jit(
        lambda p, x, t, c, cc: ldm.apply_model(
            p, x, t, {"crossattn": c, "concat": cc}, cfg_pairs=dedup))
    enc_fn = jax.jit(lambda p, im: ldm.encode_first_stage(p, im))
    dec_fn = jax.jit(lambda p, z: ldm.decode_first_stage(p, z))

    return {
        "unet": _cost(unet_fn, params, x, t, ctx, cc),
        "encode": _cost(enc_fn, params, jnp.zeros((B * F, res, res, 3))),
        "decode": _cost(dec_fn, params, jnp.zeros((B * F, lat, lat, zc))),
    }


def pipeline_totals(costs: Dict[str, tuple], F: int, S: int):
    """(FLOPs, bytes) of the full B-clip pipeline: S*F UNet evals + the
    B*F masked-frame encode (identity encode ~B extra, folded in) + the
    B*F clip decode."""
    uf, ub = costs["unet"]
    ef, eb = costs["encode"]
    df, db = costs["decode"]
    return (S * F * uf + ef + df, S * F * ub + eb + db)


def utilization(flops: float, bytes_: float, frames: int, fps_chip: float):
    """MFU + HBM fractions at a measured whole-program frames/s/chip.

    Caveat on the HBM figure: XLA's "bytes accessed" is an UPPER BOUND on
    DRAM traffic (it counts logical buffer accesses; fusion/VMEM-resident
    reuse can serve many of them on-chip), so hbm_util can exceed 1.0 when
    the program beats the bound — observed at bs1/DDIM-200 (117%). Read it
    as "fraction of the bound's speed-of-light", not a measured counter.
    MFU has no such slack: FLOPs are exact for dense programs."""
    t_iter = frames / fps_chip
    return flops / t_iter / V5E_PEAK_BF16, bytes_ / t_iter / V5E_HBM_BW
