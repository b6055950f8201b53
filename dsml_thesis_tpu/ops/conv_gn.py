"""Conv3x3 with a GroupNorm-statistics epilogue (Pallas) + fused GN apply.

Motivation (PROFILE.md "GroupNorm findings"): the GN statistics reductions are
the single largest device-time bucket of the flagship sampler (39.5%), running
at ~23 GB/s — far below HBM peak — because XLA emits two separate
convert+reduce passes re-reading every pre-GN tensor from HBM. All eight
restructurings of the *standalone* stats computation lost end-to-end (they
still re-read from HBM and broke producer fusion). This kernel is the ninth,
structurally different attempt the round-2 verdict asked for: the statistics
are computed in the EPILOGUE of the convolution that produces the tensor,
while the conv output is still in VMEM — the dedicated stats passes disappear
entirely instead of being reorganized.

Fusion target (models/unet.py ResBlock, behavioral parity with the
reference's openaimodel.py:163-276): `in_conv` -> `+ emb` -> `out_norm`.
The timestep-embedding FiLM vector is per-batch constant over space, so it
folds into the conv bias; the kernel emits the conv output plus per-channel
sum / sum-of-squares, and `group_norm_silu_apply` normalizes from those
precomputed statistics (one read of y, fused by XLA into consumers).

HBM traffic per fused GN: write y + read y (apply), versus the XLA path's
write y + 2 stat-pass reads + apply read.

An optional `skip` input lets the same kernel fuse `out_conv + residual add`
with the stats of the FOLLOWING block's `in_norm` (phase 2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv_gn_fits(hh: int, ww: int, cin: int, cout: int, itemsize: int,
                 has_skip: bool = False, ksize: int = 3) -> bool:
    """Whole-image VMEM fit for the epilogue kernel (one batch element per
    grid step): input (+padded VMEM copy, +double buffer, +one live shifted
    patch), resident weights, fp32 accumulator, output (+double buffer).
    Shapes that do not fit (e.g. the 256px VQGAN top level) fall back to the
    unfused path instead of dying in a Mosaic VMEM error at compile time."""
    xb = hh * ww * cin * itemsize
    xpad = (hh + 2) * (ww + 2) * cin * itemsize if ksize == 3 else 0
    wb = ksize * ksize * cin * cout * itemsize
    acc = hh * ww * cout * 4
    yb = hh * ww * cout * itemsize
    total = (3 * xb + xpad + 2 * wb + acc + 3 * yb
             + (3 * yb if has_skip else 0) + (1 << 22))
    return total <= 100 * (1 << 20)


def _conv_kernel(x_ref, w_ref, bias_ref, *rest, hh, ww, cin, cout, has_skip,
                 ksize):
    """One batch element: KxK SAME conv as K*K shifted [H*W, Cin] @
    [Cin, Cout] MXU contractions accumulated in fp32 (one unshifted matmul
    for 1x1), plus per-channel sum / sum-of-squares of the (cast) output
    computed while it is still in VMEM."""
    if has_skip:
        skip_ref, o_ref, s_ref = rest
    else:
        o_ref, s_ref = rest
    x = x_ref[0]  # [H, W, Cin], input dtype
    acc = jnp.zeros((hh * ww, cout), jnp.float32)
    if ksize == 1:
        acc = acc + jnp.dot(x.reshape(hh * ww, cin), w_ref[0, 0],
                            preferred_element_type=jnp.float32)
    else:
        xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
        for di in range(3):
            for dj in range(3):
                patch = xp[di:di + hh, dj:dj + ww, :].reshape(hh * ww, cin)
                acc = acc + jnp.dot(
                    patch, w_ref[di, dj], preferred_element_type=jnp.float32
                )
    acc = acc + bias_ref[0].astype(jnp.float32)  # [1, Cout] broadcast row
    if has_skip:
        acc = acc + skip_ref[0].reshape(hh * ww, cout).astype(jnp.float32)
    y = acc.astype(o_ref.dtype)
    o_ref[0] = y.reshape(hh, ww, cout)
    # stats of the STORED values (what the normalize pass will read), fp32
    yf = y.astype(jnp.float32)
    s_ref[0, 0:1] = jnp.sum(yf, axis=0, keepdims=True)
    s_ref[0, 1:2] = jnp.sum(yf * yf, axis=0, keepdims=True)


def conv_stats_pallas(x, w, bias, skip=None, interpret: bool = False):
    """KxK (K in {1, 3}) SAME stride-1 conv with per-batch bias and
    channel-stats epilogue.

    x: [B, H, W, Cin]; w: [K, K, Cin, Cout]; bias: [B, Cout] (the conv bias
    plus any per-batch FiLM vector, fp32); skip: optional [B, H, W, Cout]
    added to the conv output (residual fusion).
    Returns (y [B, H, W, Cout] in x.dtype, ch_sum [B, Cout] f32,
    ch_sq [B, Cout] f32) where the stats are over the spatial axes of y.
    """
    b, hh, ww, cin = x.shape
    ksize, cout = w.shape[0], w.shape[-1]
    assert ksize in (1, 3) and w.shape[1] == ksize
    itemsize = jnp.dtype(x.dtype).itemsize
    xb = hh * ww * cin * itemsize
    xpad = (hh + 2) * (ww + 2) * cin * itemsize if ksize == 3 else 0
    yb = hh * ww * cout * itemsize
    wb = ksize * ksize * cin * cout * itemsize
    # EXACTLY the conv_gn_fits working set (a fit-approved shape must never
    # die on this limit), capped at the physical budget
    vmem_limit = min(
        3 * xb + xpad + 2 * wb + hh * ww * cout * 4 + 3 * yb
        + (3 * yb if skip is not None else 0) + (1 << 22),
        110 * (1 << 20),
    )
    kernel = functools.partial(
        _conv_kernel, hh=hh, ww=ww, cin=cin, cout=cout,
        has_skip=skip is not None, ksize=ksize,
    )
    in_specs = [
        pl.BlockSpec((1, hh, ww, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ksize, ksize, cin, cout), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w, bias]
    if skip is not None:
        in_specs.append(
            pl.BlockSpec((1, hh, ww, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(skip)
    y, stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hh, ww, cout), x.dtype),
            # rows 0/1 of an (8, C) f32 block (sublane-tile padded)
            jax.ShapeDtypeStruct((b, 8, cout), jnp.float32),
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hh, ww, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)
    return y, stats[:, 0], stats[:, 1]


def group_norm_silu_apply(x, ch_sum, ch_sq, gamma, beta, num_groups: int = 32,
                          eps: float = 1e-5, silu: bool = True):
    """GroupNorm(+SiLU) from precomputed per-channel statistics.

    Identical group-fold / clamp / affine math to
    groupnorm.group_norm_silu_reference — only the stats source differs
    (they arrive from a producer's epilogue instead of a dedicated reduce).
    jnp on purpose: XLA fuses this elementwise apply into consumers.
    """
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


def _conv_stats_reference(x, w, bias, skip=None):
    """jnp spec of the kernel (also its backward): fp32-accumulated conv +
    per-batch bias (+skip), cast to x.dtype, channel stats of the cast
    values."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + bias[:, None, None, :].astype(jnp.float32)
    if skip is not None:
        y = y + skip.astype(jnp.float32)
    y = y.astype(x.dtype)
    b, c = y.shape[0], y.shape[-1]
    yf = y.astype(jnp.float32).reshape(b, -1, c)
    return y, jnp.sum(yf, axis=1), jnp.sum(yf * yf, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv_stats_diff(x, w, bias, has_skip, interpret, skip):
    return conv_stats_pallas(x, w, bias, skip=skip if has_skip else None,
                             interpret=interpret)


def _conv_stats_fwd(x, w, bias, has_skip, interpret, skip):
    return (_conv_stats_diff(x, w, bias, has_skip, interpret, skip),
            (x, w, bias, skip))


def _conv_stats_bwd(has_skip, interpret, res, g):
    """Differentiate the jnp spec (recompute-based: the fused path is a
    sampling optimization; training gradients go through the reference
    composition, which XLA fuses well)."""
    x, w, bias, skip = res
    if has_skip:
        _, vjp = jax.vjp(
            lambda x, w, bias, skip: _conv_stats_reference(x, w, bias, skip),
            x, w, bias, skip,
        )
        dx, dw, dbias, dskip = vjp(g)
        return dx, dw, dbias, dskip
    _, vjp = jax.vjp(
        lambda x, w, bias: _conv_stats_reference(x, w, bias), x, w, bias
    )
    dx, dw, dbias = vjp(g)
    return dx, dw, dbias, None


_conv_stats_diff.defvjp(_conv_stats_fwd, _conv_stats_bwd)


def conv_stats(x, w, bias, skip=None, use_pallas=None,
               interpret: bool = False):
    """Differentiable fused `convKxK (+per-batch bias, +optional skip)` with
    channel-stats epilogue: returns (y, ch_sum, ch_sq). K = w.shape[0]
    (1 or 3).

    Dispatch mirrors attention/groupnorm: the Pallas epilogue kernel on TPU
    (or in interpret mode for CPU tests), the jnp spec otherwise — numerics
    match either way. Feed the stats to GroupNormSiLU(stats=...) /
    group_norm_silu_apply."""
    if w.shape[0] not in (1, 3) or w.shape[1] != w.shape[0]:
        # checked at dispatch so the contract is platform-independent (the
        # jnp fallback would happily run any K the Pallas kernel can't take)
        raise ValueError(
            f"conv_stats supports square 1x1/3x3 kernels, got {w.shape[:2]}"
        )
    if use_pallas is None:
        from .attention import _on_tpu

        use_pallas = _on_tpu() or interpret
    b, hh, ww, cin = x.shape
    if use_pallas and not conv_gn_fits(hh, ww, cin, w.shape[-1],
                                       jnp.dtype(x.dtype).itemsize,
                                       skip is not None, w.shape[0]):
        use_pallas = False
    if not use_pallas:
        return _conv_stats_reference(x, w, bias, skip)

    from .attention import _ATTN_MESH

    mesh = _ATTN_MESH
    if mesh is not None and mesh.size > 1:
        # pallas_call is opaque to GSPMD: on a multi-device mesh, shard_map
        # the kernel over the data axis (grid/stats are per-batch-element, so
        # batch sharding needs zero collectives). Anything that doesn't
        # shard cleanly runs the jnp spec, which GSPMD partitions itself.
        from jax.sharding import PartitionSpec as P

        nd = mesh.shape.get("data", 1)
        if nd <= 1 or b % nd != 0:
            return _conv_stats_reference(x, w, bias, skip)
        xs = P("data", None, None, None)
        wspec = P(None, None, None, None)
        bspec = P("data", None)
        outs = (xs, bspec, bspec)
        if skip is not None:
            run = jax.shard_map(
                lambda xx, ww, bb, ss: _conv_stats_diff(
                    xx, ww, bb, True, interpret, ss),
                mesh=mesh, in_specs=(xs, wspec, bspec, xs), out_specs=outs,
                check_vma=False,
            )
            return run(x, w, bias, skip)
        run = jax.shard_map(
            lambda xx, ww, bb: _conv_stats_diff(xx, ww, bb, False, interpret,
                                                None),
            mesh=mesh, in_specs=(xs, wspec, bspec), out_specs=outs,
            check_vma=False,
        )
        return run(x, w, bias)
    return _conv_stats_diff(x, w, bias, skip is not None, interpret, skip)


# existing callers use the 3x3 name; the dispatch is kernel-size generic
conv3x3_stats = conv_stats
