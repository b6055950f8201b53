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


def _conv_gn_bytes(hh: int, ww: int, cin: int, cout: int, itemsize: int,
                   has_skip: bool = False, ksize: int = 3,
                   has_gn: bool = False) -> int:
    """Working-set bytes of one epilogue-kernel program (one batch element
    per grid step): input (+padded VMEM copy, +double buffer, +one live
    shifted patch), resident weights, fp32 accumulator, output (+double
    buffer), plus the fp32 normalize working copy when the input GN is
    folded in.

    Channel dims are LANE dims in VMEM and tile in units of 128 — a
    3-channel stem input physically occupies 128 lanes per element. The
    pre-padding model approved the 256px VQGAN stem at ~85M while Mosaic
    measured 143.84M (on-chip OOM, round 3f); with lane padding the model
    says 156M and the shape correctly routes to the jnp fallback. The
    second-minor (W) dim sublane-pads to the dtype tile (8 rows fp32, 16
    bf16) — counted too, so non-power-of-2 widths don't under-count.
    Single source of truth for conv_gn_fits; conv_stats_pallas compiles
    against the full physical cap so a model under-estimate can only cost
    a missed fusion, never a fit-approved compile OOM."""
    sub = max(8, 32 // max(itemsize, 1))  # sublane tile rows for the dtype
    ww_s = -(-ww // sub) * sub
    cin_l = -(-cin // 128) * 128   # lane padding (trailing dim)
    cout_l = -(-cout // 128) * 128
    cin_s = -(-cin // sub) * sub   # sublane padding (weights' 3rd dim)
    xb = hh * ww_s * cin_l * itemsize
    xpad = (hh + 2) * (-(-(ww + 2) // sub) * sub) * cin_l * itemsize \
        if ksize == 3 else 0
    wb = ksize * ksize * cin_s * cout_l * itemsize
    acc = hh * ww_s * cout_l * 4
    yb = hh * ww_s * cout_l * itemsize
    return (3 * xb + xpad + 2 * wb + acc + 3 * yb
            + (3 * yb if has_skip else 0)
            + (hh * ww_s * cin_l * 4 if has_gn else 0) + (1 << 22))


def conv_gn_fits(hh: int, ww: int, cin: int, cout: int, itemsize: int,
                 has_skip: bool = False, ksize: int = 3,
                 has_gn: bool = False) -> bool:
    """Whole-image VMEM fit for the epilogue kernel. Shapes that do not fit
    (e.g. the 256px VQGAN stem) fall back to the unfused path instead of
    dying in a Mosaic VMEM error at compile time."""
    return _conv_gn_bytes(hh, ww, cin, cout, itemsize, has_skip, ksize,
                          has_gn) <= 100 * (1 << 20)


def _conv_kernel(x_ref, w_ref, bias_ref, *rest, hh, ww, cin, cout, has_skip,
                 ksize, apply_gn, eps=1e-5, inv_count=0.0, silu_in=True):
    """One batch element: KxK SAME conv as K*K shifted [H*W, Cin] @
    [Cin, Cout] MXU contractions accumulated in fp32 (one unshifted matmul
    for 1x1), plus per-channel sum / sum-of-squares of the (cast) output
    computed while it is still in VMEM.

    With apply_gn, the INPUT is first GroupNorm(+SiLU)-normalized in VMEM
    from precomputed channel stats (stats_ref rows 0/1, the producer's
    epilogue output), exactly the _gn_kernel formulation (groupnorm.py:100) —
    so norm -> conv chains cross HBM once instead of three times (normalize
    write + conv read on top of the raw read)."""
    if apply_gn:
        stats_ref, ind_ref, gamma_ref, beta_ref = rest[:4]
        rest = rest[4:]
    if has_skip:
        skip_ref, o_ref, s_ref = rest
    else:
        o_ref, s_ref = rest
    x = x_ref[0]  # [H, W, Cin], input dtype
    if apply_gn:
        xf = x.reshape(hh * ww, cin).astype(jnp.float32)
        ind = ind_ref[:]  # [Cin, G] one-hot group indicator
        g_sum = jnp.dot(stats_ref[0, 0:1], ind,
                        preferred_element_type=jnp.float32)  # [1, G]
        g_sq = jnp.dot(stats_ref[0, 1:2], ind,
                       preferred_element_type=jnp.float32)
        g_mean = g_sum * inv_count
        g_var = jnp.maximum(g_sq * inv_count - g_mean * g_mean, 0.0)
        g_rstd = jax.lax.rsqrt(g_var + eps)
        c_mean = jnp.dot(g_mean, ind.T, preferred_element_type=jnp.float32)
        c_rstd = jnp.dot(g_rstd, ind.T, preferred_element_type=jnp.float32)
        xf = (xf - c_mean) * c_rstd * gamma_ref[:].astype(jnp.float32) \
            + beta_ref[:].astype(jnp.float32)
        if silu_in:
            xf = xf * jax.nn.sigmoid(xf)
        # cast to the conv compute dtype, like the standalone GN would store
        x = xf.astype(x.dtype).reshape(hh, ww, cin)
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


def conv_stats_pallas(x, w, bias, skip=None, in_stats=None, gamma=None,
                      beta=None, num_groups: int = 32, eps: float = 1e-5,
                      silu_in: bool = True, interpret: bool = False):
    """KxK (K in {1, 3}) SAME stride-1 conv with per-batch bias and
    channel-stats epilogue, optionally normalizing the INPUT in VMEM first.

    x: [B, H, W, Cin]; w: [K, K, Cin, Cout]; bias: [B, Cout] (the conv bias
    plus any per-batch FiLM vector, fp32); skip: optional [B, H, W, Cout]
    added to the conv output (residual fusion). in_stats: optional
    (ch_sum, ch_sq) [B, Cin] f32 pairs — the input is GroupNorm(+SiLU if
    silu_in)-normalized from them inside the kernel (gamma/beta [Cin]), so
    norm -> conv chains skip the standalone normalize pass entirely.
    Returns (y [B, H, W, Cout] in x.dtype, ch_sum [B, Cout] f32,
    ch_sq [B, Cout] f32) where the stats are over the spatial axes of y.
    """
    b, hh, ww, cin = x.shape
    ksize, cout = w.shape[0], w.shape[-1]
    assert ksize in (1, 3) and w.shape[1] == ksize
    itemsize = jnp.dtype(x.dtype).itemsize
    # compile against the full physical cap, NOT the byte-model estimate:
    # conv_gn_fits (100M gate on _conv_gn_bytes) decides WHETHER to fuse,
    # and giving Mosaic the whole budget means a model under-estimate can
    # never turn a fit-approved shape into a scoped-VMEM compile error —
    # the round-3f stem failure class (estimate 85M vs measured 143.84M)
    vmem_limit = 110 * (1 << 20)
    kernel = functools.partial(
        _conv_kernel, hh=hh, ww=ww, cin=cin, cout=cout,
        has_skip=skip is not None, ksize=ksize,
        apply_gn=in_stats is not None, eps=eps,
        inv_count=(1.0 / (hh * ww * (cin // num_groups))
                   if in_stats is not None else 0.0),
        silu_in=silu_in,
    )
    in_specs = [
        pl.BlockSpec((1, hh, ww, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ksize, ksize, cin, cout), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        # bias rides as [B, 1, Cout]: Mosaic requires the trailing two block
        # dims to be 8/128-divisible or equal to the array dims, and a
        # (1, Cout) block on a [B, Cout] array violates the sublane rule
        pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w, bias.reshape(b, 1, cout)]
    if in_stats is not None:
        group_ids = np.repeat(np.arange(num_groups), cin // num_groups)
        ind = jnp.asarray(np.eye(num_groups, dtype=np.float32)[group_ids])
        stats2 = jnp.stack(
            [in_stats[0].astype(jnp.float32), in_stats[1].astype(jnp.float32)],
            axis=1,
        )  # [B, 2, Cin]
        in_specs += [
            pl.BlockSpec((1, 2, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [stats2, ind, gamma.reshape(1, cin).astype(jnp.float32),
                 beta.reshape(1, cin).astype(jnp.float32)]
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
    """GroupNorm(+SiLU) from a producer epilogue's precomputed per-channel
    statistics. Delegates to groupnorm.group_norm_silu_from_stats — the
    single canonical stats->normalize fold — so the fused and unfused
    paths can never diverge numerically. jnp on purpose: XLA fuses this
    elementwise apply into consumers.

    CONTRACT (see group_norm_silu_from_stats): the stats must cover
    exactly x's per-sample spatial extent; callers null the stats thread
    at every spatial resize (Down/Upsample) — a pair carried across one
    would mis-normalize silently.
    """
    from .groupnorm import group_norm_silu_from_stats

    return group_norm_silu_from_stats(x, ch_sum, ch_sq, gamma, beta,
                                      num_groups=num_groups, eps=eps,
                                      silu=silu)


def _conv_stats_reference(x, w, bias, skip=None, in_stats=None, gamma=None,
                          beta=None, num_groups: int = 32, eps: float = 1e-5,
                          silu_in: bool = True):
    """jnp spec of the kernel (also its backward): optional GroupNorm(+SiLU)
    of the input from precomputed stats, fp32-accumulated conv + per-batch
    bias (+skip), cast to x.dtype, channel stats of the cast values."""
    if in_stats is not None:
        x = group_norm_silu_apply(x, in_stats[0], in_stats[1], gamma, beta,
                                  num_groups=num_groups, eps=eps,
                                  silu=silu_in)
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


# cfg = (has_skip, has_gn, interpret, num_groups, eps, silu_in) — hashable
# static config so the differentiable wrapper has one signature for every
# fusion variant
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_stats_diff(cfg, x, w, bias, skip, s1, s2, gamma, beta):
    has_skip, has_gn, interpret, num_groups, eps, silu_in = cfg
    return conv_stats_pallas(
        x, w, bias, skip=skip if has_skip else None,
        in_stats=(s1, s2) if has_gn else None, gamma=gamma, beta=beta,
        num_groups=num_groups, eps=eps, silu_in=silu_in, interpret=interpret,
    )


def _conv_stats_fwd(cfg, x, w, bias, skip, s1, s2, gamma, beta):
    return (_conv_stats_diff(cfg, x, w, bias, skip, s1, s2, gamma, beta),
            (x, w, bias, skip, s1, s2, gamma, beta))


def _conv_stats_bwd(cfg, res, g):
    """Differentiate the jnp spec (recompute-based: the fused path is a
    sampling optimization; training gradients go through the reference
    composition, which XLA fuses well). None primals (absent skip/GN args)
    yield None cotangents."""
    has_skip, has_gn, interpret, num_groups, eps, silu_in = cfg
    _, vjp = jax.vjp(
        lambda x, w, bias, skip, s1, s2, gamma, beta: _conv_stats_reference(
            x, w, bias, skip if has_skip else None,
            (s1, s2) if has_gn else None, gamma, beta,
            num_groups, eps, silu_in),
        *res,
    )
    return vjp(g)


_conv_stats_diff.defvjp(_conv_stats_fwd, _conv_stats_bwd)


def conv_stats(x, w, bias, skip=None, in_stats=None, gamma=None, beta=None,
               num_groups: int = 32, eps: float = 1e-5, silu_in: bool = True,
               use_pallas=None, interpret: bool = False):
    """Differentiable fused `[GroupNorm(+SiLU) from in_stats ->] convKxK
    (+per-batch bias, +optional skip)` with channel-stats epilogue: returns
    (y, ch_sum, ch_sq). K = w.shape[0] (1 or 3).

    Dispatch mirrors attention/groupnorm: the Pallas kernel on TPU (or in
    interpret mode for CPU tests), the jnp spec otherwise — numerics match
    either way. Feed the output stats to the next conv_stats(in_stats=...) /
    GroupNormSiLU(stats=...)."""
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
    if use_pallas and (
        # tiny output widths (the 3-channel final convs) would run the MXU
        # at ~2% lane utilization AND add new Mosaic shape classes for one
        # conv per forward — the jnp fallback below still normalizes from
        # the precomputed stats, which is where the saving lives
        w.shape[-1] < 32
        or not conv_gn_fits(hh, ww, cin, w.shape[-1],
                            jnp.dtype(x.dtype).itemsize,
                            skip is not None, w.shape[0],
                            in_stats is not None)
    ):
        use_pallas = False
    if not use_pallas:
        return _conv_stats_reference(x, w, bias, skip, in_stats, gamma, beta,
                                     num_groups, eps, silu_in)

    has_gn = in_stats is not None
    cfg = (skip is not None, has_gn, interpret, num_groups, eps, silu_in)
    s1, s2 = in_stats if has_gn else (None, None)

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
            return _conv_stats_reference(x, w, bias, skip, in_stats, gamma,
                                         beta, num_groups, eps, silu_in)
        xs = P("data", None, None, None)
        bspec = P("data", None)
        # optional args ride a dict pytree so one shard_map covers every
        # fusion variant (closing over traced arrays is not allowed inside
        # shard_map — everything must be an explicit sharded input)
        tensors = {"x": x, "w": w, "bias": bias}
        specs = {"x": xs, "w": P(None, None, None, None), "bias": bspec}
        if skip is not None:
            tensors["skip"], specs["skip"] = skip, xs
        if has_gn:
            tensors.update(s1=s1, s2=s2, gamma=gamma, beta=beta)
            specs.update(s1=bspec, s2=bspec, gamma=P(None), beta=P(None))
        run = jax.shard_map(
            lambda t: _conv_stats_diff(
                cfg, t["x"], t["w"], t["bias"], t.get("skip"),
                t.get("s1"), t.get("s2"), t.get("gamma"), t.get("beta")),
            mesh=mesh, in_specs=(specs,), out_specs=(xs, bspec, bspec),
            check_vma=False,
        )
        return run(tensors)
    return _conv_stats_diff(cfg, x, w, bias, skip, s1, s2, gamma, beta)


# existing callers use the 3x3 name; the dispatch is kernel-size generic
conv3x3_stats = conv_stats
