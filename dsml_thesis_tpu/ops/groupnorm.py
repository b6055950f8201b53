"""Fused GroupNorm(+SiLU) for NHWC tensors: Pallas kernel + jnp reference.

The reference's hot elementwise chain is GroupNorm32 -> SiLU -> conv in every
ResBlock (openaimodel.py:199-215, model.py:37-39). GroupNorm is HBM-bandwidth
bound; the Pallas kernel does stats + normalize + affine + SiLU in a single
VMEM pass per batch row. Group statistics are computed with a (C x G)
indicator matmul on the MXU, avoiding lane-unfriendly reshapes of the channel
axis (C/G = 5 for the reference's 160-ch UNet).

eps follows the torch defaults the reference uses: 1e-5 for the UNet
(GroupNorm32) and 1e-6 for the VQGAN nets (model.py:35).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..flags import env_mode
from .attention import _vmem_limit


def group_norm_silu_reference(
    x, gamma, beta, num_groups: int = 32, eps: float = 1e-5, silu: bool = True
):
    """jnp spec: x [B, H, W, C] (or [B, N, C]); stats in fp32 per (batch, group).

    Stats are computed channel-major: reduce over the spatial axis per channel
    (lane-efficient: C lanes), then combine channels into groups on the tiny
    [B, C] result. Reshaping the full tensor to (..., G, C/G) instead puts
    C/G (= 5 for the reference nets) on the lane axis and devolves into tens
    of thousands of tiny convert+reduce kernels — profiled at 40% of total
    sampling device time.
    """
    import os

    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    cg = c // num_groups
    variant = os.environ.get("DSML_GN_VARIANT", "ref")
    if "barrier" in variant:
        # materialize x once so the stats reduces and the normalize pass share
        # one buffer instead of each re-fusing (and re-running) the producer
        x = jax.lax.optimization_barrier(x)
    xf = x.astype(jnp.float32).reshape(b, -1, c)
    n_spatial = xf.shape[1]
    inv_count = 1.0 / (n_spatial * cg)

    if "cat" in variant:
        # single-pass stats: one reduce over [x, x^2] concatenated on lanes
        # (one read of x instead of two separate convert+reduce fusions)
        both = jnp.sum(jnp.concatenate([xf, xf * xf], axis=-1), axis=1)
        ch_sum, ch_sq = both[:, :c], both[:, c:]
    elif "mm" in variant:
        # MXU stats: append a ones lane and take one Gram contraction
        # z^T z per batch — row C is the channel sums (ones · x), the
        # diagonal is the sums of squares. One streamed pass on the MXU
        # (C+1 x C+1 output is tiny) instead of two VPU convert+reduce
        # fusions. bf16 inputs stay bf16 for the dot (f32 accumulate):
        # halves the stream, per-element x^2 rounding averages out over
        # the ~20k samples behind each group stat.
        zdt = jnp.bfloat16 if orig_dtype == jnp.bfloat16 else jnp.float32
        z = jnp.concatenate(
            [x.reshape(b, -1, c).astype(zdt),
             jnp.ones((b, n_spatial, 1), zdt)], axis=-1)
        gram = jnp.einsum("bnc,bnd->bcd", z, z,
                          preferred_element_type=jnp.float32)
        ch_sum = gram[:, c, :c]
        ch_sq = jnp.diagonal(gram, axis1=1, axis2=2)[:, :c]
    elif "pair" in variant:
        # variadic reduce: (sum, sum_sq) in ONE reduction op — single read of
        # x, no concat materialization
        zero = jnp.zeros((), jnp.float32)
        ch_sum, ch_sq = jax.lax.reduce(
            (xf, xf * xf), (zero, zero),
            lambda a, b: (a[0] + b[0], a[1] + b[1]), (1,),
        )
    else:
        ch_sum = jnp.sum(xf, axis=1)          # [B, C]
        ch_sq = jnp.sum(xf * xf, axis=1)      # [B, C]
    g_mean = jnp.sum(ch_sum.reshape(b, num_groups, cg), axis=-1) * inv_count
    g_sq = jnp.sum(ch_sq.reshape(b, num_groups, cg), axis=-1) * inv_count
    # E[x^2]-E[x]^2 can go slightly negative from fp32 cancellation when
    # |mean| >> std; clamp like flax GroupNorm or rsqrt returns NaN
    g_rstd = jax.lax.rsqrt(jnp.maximum(g_sq - g_mean**2, 0.0) + eps)

    c_mean = jnp.repeat(g_mean, cg, axis=-1)[:, None, :]   # [B, 1, C]
    c_rstd = jnp.repeat(g_rstd, cg, axis=-1)[:, None, :]
    xn = (xf - c_mean) * c_rstd * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32
    )
    if silu:
        xn = xn * jax.nn.sigmoid(xn)
    return xn.reshape(x.shape).astype(orig_dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, ind_ref, o_ref, *, eps, inv_count, silu):
    x = x_ref[0].astype(jnp.float32)  # [N, C]
    ind = ind_ref[:]                  # [C, G] one-hot group indicator
    # per-channel sums -> per-group stats via MXU
    ch_sum = jnp.sum(x, axis=0, keepdims=True)          # [1, C]
    ch_sq = jnp.sum(x * x, axis=0, keepdims=True)       # [1, C]
    g_sum = jnp.dot(ch_sum, ind, preferred_element_type=jnp.float32)  # [1, G]
    g_sq = jnp.dot(ch_sq, ind, preferred_element_type=jnp.float32)    # [1, G]
    g_mean = g_sum * inv_count
    g_var = jnp.maximum(g_sq * inv_count - g_mean * g_mean, 0.0)
    g_rstd = jax.lax.rsqrt(g_var + eps)
    # broadcast group stats back to channels: [1, G] @ [G, C]
    c_mean = jnp.dot(g_mean, ind.T, preferred_element_type=jnp.float32)
    c_rstd = jnp.dot(g_rstd, ind.T, preferred_element_type=jnp.float32)
    y = (x - c_mean) * c_rstd * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(
        jnp.float32
    )
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def group_norm_silu_pallas(
    x, gamma, beta, num_groups: int = 32, eps: float = 1e-5, silu: bool = True,
    interpret: bool = False,
):
    """x: [B, ..., C] -> same shape. One grid step per batch row."""
    shape = x.shape
    b, c = shape[0], shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    n = int(np.prod(shape[1:-1]))
    x3 = x.reshape(b, n, c)
    group_ids = np.repeat(np.arange(num_groups), c // num_groups)
    # host-side constant (a traced scatter would re-fold per compile)
    ind = jnp.asarray(np.eye(num_groups, dtype=np.float32)[group_ids])
    inv_count = 1.0 / (n * (c // num_groups))

    # one batch row resident in VMEM: input + fp32 working copy + result +
    # output, plus grid double-buffering headroom
    # _vmem_limit floors at 32MB: Mosaic's minimum schedulable stack can
    # exceed a small working-set estimate (see ops/attention.py)
    vmem_limit = _vmem_limit(6 * (n * c * 4) + (1 << 21))
    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, inv_count=inv_count, silu=silu),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x3, gamma.reshape(1, c), beta.reshape(1, c), ind)
    return out.reshape(shape)


def _gn_stats_kernel(x_ref, out_ref):
    """Accumulate per-channel sum and sum-of-squares over spatial blocks.

    One fused read of x per block (vs XLA's two separate convert+reduce
    passes, profiled at ~5% of HBM bandwidth); outputs rows 0/1 of an
    (8, C) f32 block (padded to the sublane tile).
    """
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    s = jnp.sum(x, axis=0, keepdims=True)
    sq = jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0, 0:1] += s
    out_ref[0, 1:2] += sq


def _gn_channel_stats_pallas(x3: jnp.ndarray, interpret: bool = False):
    """x3: [B, N, C] -> (ch_sum, ch_sq) each [B, C] fp32, one read of x."""
    b, n, c = x3.shape
    # spatial block: ~2MB of input per grid step, multiple-of-8 rows
    bn = max(8, min(n, (2 * (1 << 20)) // max(c * x3.dtype.itemsize, 1) // 8 * 8))
    pad = (-n) % bn
    if pad:
        x3 = jnp.pad(x3, ((0, 0), (0, pad), (0, 0)))  # zero rows add nothing
    grid = (b, (n + pad) // bn)
    out = pl.pallas_call(
        _gn_stats_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(10 * bn * c * 4 + (1 << 21))
        ),
        interpret=interpret,
    )(x3)
    return out[:, 0], out[:, 1]


def group_norm_silu_from_stats(x, ch_sum, ch_sq, gamma, beta,
                               num_groups: int = 32, eps: float = 1e-5,
                               silu: bool = True):
    """GroupNorm(+SiLU) from precomputed per-channel (sum, sum²) [B, C]
    f32 pairs — THE canonical stats->normalize fold (group fold,
    E[x²]−E[x]² clamp-at-0, eps inside the rsqrt, fp32 affine). Both the
    Pallas stats-kernel path (group_norm_silu_stats_fused below) and the
    conv-epilogue lever (ops/conv_gn.py group_norm_silu_apply) route
    through this ONE implementation, so an oracle-driven numerics fix
    cannot silently diverge the fused and unfused paths.

    CONTRACT: the stats must cover exactly x's per-sample spatial extent —
    the element count is derived from x's shape, so stats threaded across
    any spatial resize would mis-normalize silently (callers null the
    thread at every Down/Upsample)."""
    shape = x.shape
    b, c = shape[0], shape[-1]
    cg = c // num_groups
    x3 = x.reshape(b, -1, c)
    n = x3.shape[1]
    inv_count = 1.0 / (n * cg)
    g_mean = jnp.sum(ch_sum.reshape(b, num_groups, cg), axis=-1) * inv_count
    g_sq = jnp.sum(ch_sq.reshape(b, num_groups, cg), axis=-1) * inv_count
    g_rstd = jax.lax.rsqrt(jnp.maximum(g_sq - g_mean**2, 0.0) + eps)
    c_mean = jnp.repeat(g_mean, cg, axis=-1)[:, None, :]
    c_rstd = jnp.repeat(g_rstd, cg, axis=-1)[:, None, :]
    y = (x3.astype(jnp.float32) - c_mean) * c_rstd * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(shape).astype(x.dtype)


def group_norm_silu_stats_fused(
    x, gamma, beta, num_groups: int = 32, eps: float = 1e-5, silu: bool = True,
    interpret: bool = False,
):
    """GroupNorm(+SiLU) with Pallas single-pass statistics and jnp
    normalize/affine/SiLU (so XLA fuses the apply into consumers)."""
    b, c = x.shape[0], x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    ch_sum, ch_sq = _gn_channel_stats_pallas(x.reshape(b, -1, c),
                                             interpret=interpret)
    return group_norm_silu_from_stats(x, ch_sum, ch_sq, gamma, beta,
                                      num_groups=num_groups, eps=eps,
                                      silu=silu)


def _gn_reference_bwd(num_groups, eps, silu, interpret, res, g):
    """Shared backward for both Pallas-forward variants: differentiate the
    jnp reference (numerically identical GN; XLA fuses the bwd well)."""
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, gamma, beta: group_norm_silu_reference(
            x, gamma, beta, num_groups=num_groups, eps=eps, silu=silu
        ),
        x, gamma, beta,
    )
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_stats_fused_diff(x, gamma, beta, num_groups, eps, silu, interpret):
    return group_norm_silu_stats_fused(x, gamma, beta, num_groups, eps, silu,
                                       interpret=interpret)


def _gn_sf_fwd(x, gamma, beta, num_groups, eps, silu, interpret):
    return (_gn_stats_fused_diff(x, gamma, beta, num_groups, eps, silu, interpret),
            (x, gamma, beta))


_gn_stats_fused_diff.defvjp(_gn_sf_fwd, _gn_reference_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_silu_diff(x, gamma, beta, num_groups, eps, silu, interpret):
    return group_norm_silu_pallas(x, gamma, beta, num_groups=num_groups,
                                  eps=eps, silu=silu, interpret=interpret)


def _gn_fwd(x, gamma, beta, num_groups, eps, silu, interpret):
    return (_gn_silu_diff(x, gamma, beta, num_groups, eps, silu, interpret),
            (x, gamma, beta))


_gn_silu_diff.defvjp(_gn_fwd, _gn_reference_bwd)


def group_norm_silu(
    x, gamma, beta, num_groups: int = 32, eps: float = 1e-5, silu: bool = True,
    use_pallas=None, interpret: bool = False,
):
    """Dispatch:
      DSML_PALLAS_GN=0 (default) -> jnp reference (XLA-fused)
      DSML_PALLAS_GN=1           -> whole-row Pallas kernel (VMEM-guarded:
                                    falls back on rows over 8MB)
      DSML_PALLAS_GN=stats       -> Pallas stats kernel + jnp apply (tiles
                                    spatially; no row-size limit)
    use_pallas=True forces the whole-row kernel when no env mode is set;
    interpret=True runs the SAME differentiable wrappers in interpret mode.

    Default rationale (flagship-bench A/Bs on v5e): XLA 6.07 fps >
    stats kernel 5.56 > whole-row kernel 5.52. XLA's stat reduces look slow
    in per-op traces but overlap with neighboring work, while any pallas_call
    boundary here breaks producer fusion. Both kernels kept for A/B."""
    import os

    from .attention import _on_tpu

    mode = env_mode("DSML_PALLAS_GN", "0", ("0", "1", "stats"))
    if use_pallas is None:
        on_dev = _on_tpu() or interpret
        if mode == "1":
            n = int(np.prod(x.shape[1:-1])) * x.shape[-1]
            use_pallas = on_dev and 4 * n <= 8 * 1024 * 1024
        elif mode != "0":
            use_pallas = on_dev  # stats kernel tiles: any size works
        else:
            use_pallas = False
    if not use_pallas:
        return group_norm_silu_reference(
            x, gamma, beta, num_groups=num_groups, eps=eps, silu=silu
        )
    variant = mode if mode in ("1", "stats") else "1"
    if variant == "1":
        return _gn_silu_diff(x, gamma, beta, num_groups, eps, silu, interpret)
    return _gn_stats_fused_diff(x, gamma, beta, num_groups, eps, silu, interpret)
