"""Attention ops: Pallas flash-attention for latent self-attention + jnp paths.

The reference computes attention as two einsums with a materialized B*H x N x N
score matrix (face_reenactment/ldm/modules/attention.py:170-193). On TPU we
instead run a Pallas kernel that blocks over queries and keeps K/V resident in
VMEM, never materializing the full score matrix in HBM. Cross-attention over
tiny contexts (1 class token / 17 audio tokens) stays on the jnp path — XLA
fuses it; a flash kernel would only add overhead.

Shapes are (B, H, N, D) with D = head_dim (32 for all reference configs).
"""
from __future__ import annotations

import contextlib
import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..flags import env_flag, env_mode


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# Scoped dispatch override (None = env/default), an A/B hook: jit runs the
# Python body only while TRACING, so tracing a step function under this
# context pins the flash-vs-XLA decision for exactly the programs traced
# inside it — unlike an os.environ mutation, nothing leaks to later models
# in the process and an explicit user DSML_FLASH_ATTN setting stays intact.
# (Multi-device programs don't need it anymore: scoped_attention_mesh below
# routes flash through shard_map instead of disabling it.)
_FLASH_OVERRIDE = None


@contextlib.contextmanager
def flash_attention_override(enabled):
    global _FLASH_OVERRIDE
    prev = _FLASH_OVERRIDE
    _FLASH_OVERRIDE = enabled
    try:
        yield
    finally:
        _FLASH_OVERRIDE = prev


# Mesh context for multi-device dispatch. pallas_call is opaque to the GSPMD
# partitioner — inside a jit over a >1-device mesh XLA would all-gather
# q/k/v around the kernel. With a mesh in scope, multi_head_attention wraps
# the kernel in jax.shard_map instead: each device runs the SAME single-
# device flash program on its local (batch-, and under TP head-) shard, with
# zero collectives (attention rows/heads are independent). Trace-scoped like
# _FLASH_OVERRIDE above.
_ATTN_MESH = None


@contextlib.contextmanager
def attention_mesh(mesh):
    global _ATTN_MESH
    prev = _ATTN_MESH
    _ATTN_MESH = mesh
    try:
        yield
    finally:
        _ATTN_MESH = prev


def scoped_attention_mesh(fn, mesh):
    """Wrap fn so every trace of it dispatches flash attention through
    shard_map over the given mesh (Trainer._jit uses this on any
    multi-device mesh)."""

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with attention_mesh(mesh):
            return fn(*a, **kw)

    return wrapped


def _mesh_axis_split(mesh, b: int, h: int):
    """Shared divisibility gating for both attention layouts: batch over
    `data`, heads over `model` (head-parallel attention needs no
    communication). Returns (spec_b, spec_h) axis names (None = replicated);
    (None, None) means nothing divides and the caller must fall back."""
    nd = mesh.shape.get("data", 1)
    nm = mesh.shape.get("model", 1)
    spec_b = "data" if nd > 1 and b % nd == 0 else None
    spec_h = "model" if nm > 1 and h % nm == 0 else None
    return spec_b, spec_h


def _attention_partition_spec(mesh, b: int, h: int):
    """Largest [B, H, N, D] partitioning the mesh and shape allow. None when
    nothing divides — the caller falls back to the XLA path, which GSPMD can
    partition on its own."""
    from jax.sharding import PartitionSpec as P

    spec_b, spec_h = _mesh_axis_split(mesh, b, h)
    if spec_b is None and spec_h is None:
        return None
    return P(spec_b, spec_h, None, None)


def _flash_flags(nk: int):
    """Resolve the env-tunable kernel reformulation flags for a KV length.

    Single source of truth for the split-head AND packed entries, so a
    threshold retune cannot diverge the two dispatches:
    - defer_div: denominator rides P@V as a ones column (always on unless
      DSML_FLASH_DEFER_DIV=0).
    - pv_transpose: transposed P@V pays off when the contraction is long
      enough to amortize its M=D+1 row stream — v5e A/Bs: N=4096 fullattn
      3.149 -> 3.275 f/s/chip, but N<=1024 training 225.0 -> 220.2 img/s
      (PROFILE.md), hence the nk>=2048 auto threshold.
    - norm_bound: Cauchy-Schwarz shift instead of the row-max pass; wins
      where the score matrix is big (fullattn N=4096: 3.314 -> 3.343).

    Parse contract: defer_div is DEFAULT-ON with a kill switch — only the
    literal "0" disables it (any other value, including 'false' or '',
    leaves it on). The opt-in levers (pv_transpose / norm_bound / staged)
    parse "auto" / "1" = on, anything else = off, so a stray value can never
    silently ENABLE one of those. pv_transpose only exists inside the
    defer-div formulation (the transposed product carries the ones-column
    denominator), so it is forced off when defer_div is disabled rather
    than silently ignored.
    """
    defer_div = env_flag("DSML_FLASH_DEFER_DIV", True)
    pv_env = env_mode("DSML_FLASH_PV_T", "auto", ("auto", "1", "0"))
    pv_transpose = ((nk >= 2048) if pv_env == "auto" else pv_env == "1")
    pv_transpose = pv_transpose and defer_div
    nb_env = env_mode("DSML_FLASH_NORM_BOUND", "auto", ("auto", "1", "0"))
    norm_bound = (nk >= 2048) if nb_env == "auto" else nb_env == "1"
    # staged: software-pipelined head loop (packed kernel only) — emit head
    # h's QK before head h-1's exp/PV so MXU and VPU work overlap under
    # in-order issue. Bitwise-identical outputs; opt-in pending on-chip A/B.
    st_env = env_mode("DSML_FLASH_STAGED", "0", ("auto", "1", "0"))
    staged = ((nk >= 2048) if st_env == "auto" else st_env == "1")
    staged = staged and defer_div
    return defer_div, pv_transpose, norm_bound, staged


def _vmem_limit(nbytes: int) -> int:
    """Compile-time scoped-VMEM limit from a working-set estimate.

    The byte formulas below size the FIT decision (which block shape / which
    dispatch path); the limit handed to Mosaic gets a 32MB floor on top:
    Mosaic demands a minimum schedulable stack that can exceed a small
    formula value — measured: the packed fwd kernel at [*, 256, 640]
    (20 heads) needs 10.63M of stack while the formula says 9.25M, an
    unconditional compile failure ("scoped vmem limit exceeded") no batch
    size or block choice avoids. The floor only lifts small programs (big
    kernels' formula values already exceed it, so their compiles — and the
    benchmarked schedules — are untouched); 32MB of 128MB VMEM leaves the
    pipeline double-buffers of any fit-approved shape intact."""
    return min(max(nbytes, 32 * (1 << 20)), 110 * (1 << 20))


def _packed_fwd_bytes(bq: int, nk: int, hd: int) -> int:
    """Working-set bytes of one packed FORWARD program, sized conservatively
    in fp32. Single source of truth for the vmem_limit pallas_call compiles
    with AND the _fit_block_q_packed approval, so a fit-approved shape
    cannot die in a Mosaic VMEM-limit error: packed K/V (+ pipeline double
    buffers), 4 live fp32 [bq, nk] score matrices (heads run sequentially
    but the unrolled loop overlaps), q/out blocks + the per-head output
    list and its concat result."""
    kv_resident = 4 * nk * hd * 4
    scores = 4 * (bq * nk * 4)
    blocks = 6 * bq * hd * 4
    return kv_resident + scores + blocks + (1 << 21)


def _packed_bwd_bytes(bq: int, nk: int, hd: int) -> int:
    """Working-set bytes of one packed BACKWARD program (fp32 sizing), the
    single source for both the compile-time vmem_limit and the fit check:
    packed K/V (+ double buffers) + fp32 dk/dv output accumulators + the
    per-head dk/dv contribution buffers that stay live across the whole
    unrolled head loop AND their full-width concat results + 12 fp32
    [bq, nk] score temporaries + q/do/dq blocks. The score count is
    empirical: Mosaic's scheduler overlaps head iterations of the unrolled
    loop, so at 10 heads the measured stack peak was ~9.3 live [bq, nk]
    matrices (61.95M total vs the 46M a 6-matrix model predicted — on-chip
    probe, round 3e); 12 covers that with margin."""
    kv_resident = 4 * nk * hd * 4
    accum = 2 * nk * hd * 4            # dk/dv output accumulators
    head_contribs = 4 * nk * hd * 4    # per-head dk/dv lists + concat results
    kv_f32 = 2 * nk * hd * 4           # per-head fp32 k/v casts for the dots
    scores = 12 * (bq * nk * 4)
    blocks = 6 * bq * hd * 4
    return (kv_resident + accum + head_contribs + kv_f32 + scores + blocks
            + (1 << 21))


def attention_reference(q, k, v, scale=None):
    """Plain jnp attention, numerically the spec for the Pallas kernel.

    q: [B, H, Nq, D], k/v: [B, H, Nk, D] -> [B, H, Nq, D]. Softmax in fp32.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    sim = sim * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
    return out


def _qk_stage(q, k, *, scale: float, norm_bound: bool):
    """Stage 1 of the fused head: scores off the MXU (scale folded into Q in
    the log2 domain) + the softmax shift. Returns ([Bq, Nk] fp32 sim, m)."""
    c = jnp.asarray(scale * 1.4426950408889634, q.dtype)  # log2(e)
    qc = q * c
    sim = jax.lax.dot_general(
        qc, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Nk] fp32, scaled, log2 domain
    if norm_bound:
        # Cauchy-Schwarz bound instead of the row-max pass — see
        # _attend_one_head for the exactness/flush analysis
        qn = jnp.sqrt(jnp.sum(qc.astype(jnp.float32) ** 2, axis=-1,
                              keepdims=True))
        kn = jnp.sqrt(jnp.max(jnp.sum(k.astype(jnp.float32) ** 2, axis=-1)))
        m = qn * kn
    else:
        m = jnp.max(sim, axis=-1, keepdims=True)
    return sim, m


def _exp_stage(sim, m, dtype):
    """Stage 2: the one VPU pass over the score matrix (sub + exp2 + cast)."""
    return jnp.exp2(sim - m).astype(dtype)


def _append_ones_column(v):
    """[Nk, D] -> [Nk, D+1] with a ones column appended: the defer-div
    convention that makes the softmax denominator ride the P@V matmul.
    Single source for the resident (_pv_stage) AND streaming kernels — the
    column position is load-bearing for _defer_div_finish below."""
    return jnp.concatenate(
        [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1
    )  # the pad column costs nothing (lane tile is 128-wide)


def _defer_div_finish(acc, d: int, out_dtype):
    """Extract the ones-column denominator from a [Bq, D+1] accumulator and
    normalize. The 1e-30 clamp is the norm_bound flush guard (see
    _attend_one_head: a loose Cauchy-Schwarz shift can flush a whole softmax
    row to zero, and an unclamped denominator turns that into 0/0 = NaN).
    Shared by the resident and streaming kernels so the clamp and the
    column convention cannot diverge."""
    denom = jnp.maximum(acc[:, d:d + 1], jnp.float32(1e-30))
    return (acc[:, :d] / denom).astype(out_dtype)


def _pv_stage(p, v, *, pv_transpose: bool, out_dtype):
    """Stage 3 (defer-div form): P@V with the softmax denominator riding as
    a ones column of V, then the [Bq, D]-sized normalize."""
    d = v.shape[-1]
    v1 = _append_ones_column(v)  # [Nk, D+1]
    if pv_transpose:
        # [D+1, Bq] = V1^T @ P^T: contraction Nk (full 128 depth) AND
        # output width Bq (full 128 lanes) — vs [Bq, Nk]@[Nk, D+1] whose
        # 33-wide output uses 26% of the lanes; M=D+1 rows stream
        out_t = jax.lax.dot_general(
            v1, p, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = out_t.T  # [Bq, D+1] relayout in VMEM
    else:
        out = jnp.dot(p, v1, preferred_element_type=jnp.float32)
    return _defer_div_finish(out, d, out_dtype)


def _attend_one_head(q, k, v, *, scale: float, defer_div: bool = True,
                     pv_transpose: bool = False, norm_bound: bool = False,
                     out_dtype=None):
    """Single-head fused attention core shared by the flash kernels:
    q [Bq, D] vs full K/V [Nk, D] in VMEM -> [Bq, D].

    For the model family's sequence lengths (<= 4096) the whole K/V for one
    head fits comfortably in VMEM, so no online-softmax accumulation is
    needed — a single fused pass computes exact softmax per q-row.

    defer_div rides the softmax denominator on the P@V matmul (a ones column
    appended to V) and normalizes the [Bq, D] output instead: two fewer VPU
    passes (row-sum + divide) over the [Bq, Nk] score matrix, which is where
    the VPU time is at N=4096. Exact — bf16 relative rounding of P is
    scale-invariant, so normalizing after the cast is as accurate as before.
    """
    out_dtype = out_dtype or q.dtype
    # scale folds into Q in the log2 domain BEFORE the matmul (_qk_stage):
    # the scores come off the MXU already scaled and exp2 replaces exp, so
    # the VPU never runs a separate multiply pass over the [Bq, Nk] matrix.
    # exp(s*scale - m) == exp2(s*scale*log2e - m') exactly (m' = row max of
    # the folded scores); bf16 rounding of q*c is scale-invariant, same
    # relative error as bf16 q itself. With norm_bound the row-max pass is
    # replaced by a Cauchy-Schwarz bound: |sim[i,j]| <= ||qc_i||*max||k_j||
    # in O(Bq*D + Nk*D). Softmax is shift-invariant and fp32 relative
    # precision is scale-invariant, so any shift >= rowmax is exact up to
    # flushing terms below ~2^-120 of the max — which standard softmax
    # rounds away in the sum anyway. If the bound's slack over the true row
    # max exceeds the bf16 exponent range (~133 log2 units, needs
    # ||q||*||k|| ~ 2^130) the WHOLE row flushes; _pv_stage's denominator
    # clamp turns that into a ~0 output row instead of 0/0 = NaN.
    sim, m = _qk_stage(q, k, scale=scale, norm_bound=norm_bound)
    if defer_div:
        p = _exp_stage(sim, m, v.dtype)
        return _pv_stage(p, v, pv_transpose=pv_transpose,
                         out_dtype=out_dtype)
    else:
        p = jnp.exp2(sim - m)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True),
                            jnp.float32(1e-30))
        p = p / denom
        out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return out.astype(out_dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                  defer_div: bool = True, pv_transpose: bool = False,
                  norm_bound: bool = False):
    """One (batch*head, q-block) program (see _attend_one_head)."""
    o_ref[0] = _attend_one_head(
        q_ref[0], k_ref[0], v_ref[0], scale=scale, defer_div=defer_div,
        pv_transpose=pv_transpose, norm_bound=norm_bound,
        out_dtype=o_ref.dtype,
    )


def _flash_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         heads: int, defer_div: bool = True,
                         pv_transpose: bool = False,
                         norm_bound: bool = False, staged: bool = False):
    """One (batch, q-block) program on the PACKED [N, H*D] activation layout
    the projections produce: the head axis never exists in HBM, so the
    head-split transposes around the kernel (and their HBM round trip,
    ~7-8.5% of device time in the flagship profile) disappear. Heads are
    processed sequentially with STATIC lane slices (h is a Python loop
    index); K/V rows are loaded once per batch and shared by all heads.

    `staged` software-pipelines the head loop at depth 2: head h's QK matmul
    is emitted BEFORE head h-1's exp/PV, so under Mosaic's in-order issue
    the VPU's big [Bq, Nk] exp pass of one head overlaps the MXU matmuls of
    its neighbors (the per-head chains are independent). Identical math —
    the exact same per-element operations, only the cross-head emission
    order changes — so outputs are bitwise-equal to the unstaged loop. At
    most 2 score matrices are live (within _packed_fwd_bytes's budget of 4).
    """
    q = q_ref[0]  # [Bq, H*D]
    k = k_ref[0]  # [Nk, H*D]
    v = v_ref[0]  # [Nk, H*D]
    # one full-width store (a VMEM repack) instead of H lane-sliced stores
    o_ref[0] = _packed_heads_attend(
        q, k, v, heads=heads, out_dtype=o_ref.dtype, scale=scale,
        defer_div=defer_div, pv_transpose=pv_transpose,
        norm_bound=norm_bound, staged=staged)


def _packed_heads_attend(q, k, v, *, heads: int, out_dtype, scale: float,
                         defer_div: bool, pv_transpose: bool,
                         norm_bound: bool, staged: bool):
    """Sequential per-head attention over packed [_, H*D] VMEM tensors —
    the body shared by _flash_kernel_packed and the fused-projection
    kernel. Returns the concatenated [Bq, H*D] output."""
    d = q.shape[-1] // heads
    if staged and defer_div and heads > 1:
        outs = [None] * heads
        prev_h, prev_p = None, None
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            sim, m = _qk_stage(q[:, sl], k[:, sl], scale=scale,
                               norm_bound=norm_bound)
            if prev_h is not None:
                pv_sl = slice(prev_h * d, (prev_h + 1) * d)
                outs[prev_h] = _pv_stage(
                    prev_p, v[:, pv_sl], pv_transpose=pv_transpose,
                    out_dtype=out_dtype)
            prev_h, prev_p = h, _exp_stage(sim, m, v.dtype)
        outs[prev_h] = _pv_stage(
            prev_p, v[:, prev_h * d:(prev_h + 1) * d],
            pv_transpose=pv_transpose, out_dtype=out_dtype)
    else:
        outs = []
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            outs.append(_attend_one_head(
                q[:, sl], k[:, sl], v[:, sl], scale=scale, defer_div=defer_div,
                pv_transpose=pv_transpose, norm_bound=norm_bound,
                out_dtype=out_dtype,
            ))
    return jnp.concatenate(outs, axis=-1)


def flash_attention(q, k, v, scale=None, block_q: int = 256, interpret: bool = False):
    """Pallas fused attention. q: [B, H, Nq, D], k/v: [B, H, Nk, D]."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, nq, d = q.shape
    nk = k.shape[2]
    # staged applies to the multi-head packed kernel only (one head per
    # program here — no cross-head ILP to pipeline)
    defer_div, pv_transpose, norm_bound, _ = _flash_flags(nk)
    bh = b * h
    q3 = q.reshape(bh, nq, d)
    k3 = k.reshape(bh, nk, d)
    v3 = v.reshape(bh, nk, d)

    block_q = min(block_q, nq)
    # pad queries to a multiple of block_q (softmax rows are independent)
    pad_q = (-nq) % block_q
    if pad_q:
        q3 = jnp.pad(q3, ((0, 0), (0, pad_q), (0, 0)))
    nq_p = nq + pad_q

    grid = (bh, nq_p // block_q)
    # resident set: K + V (+ their pipeline double-buffers) + q block + fp32
    # scores + output block
    itemsize = jnp.dtype(q.dtype).itemsize
    vmem_limit = _vmem_limit(
        4 * nk * d * itemsize + 2 * (block_q * nk * 4) + 4 * block_q * d * 4
        + (1 << 21)
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, defer_div=defer_div,
                          pv_transpose=pv_transpose, norm_bound=norm_bound),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q3, k3, v3)
    if pad_q:
        out = out[:, :nq]
    return out.reshape(b, h, nq, d)


def _flash_kernel_streaming(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *,
                            scale: float, nk: int, block_k: int):
    """One (batch*head, q-block, k-block) program: online-softmax streaming
    attention for sequences whose whole K/V does NOT fit in VMEM.

    The k-block axis is the innermost grid dimension, so the fp32 running
    row-max (m_ref) and the fp32 accumulator (acc_ref) scratch persist
    across the K/V stream of one q-block. The softmax denominator rides the
    accumulator as a ones column appended to V (the streaming form of the
    resident kernel's defer-div), so each k-step is one [Bq, Bk] matmul +
    one [Bq, Bk]@[Bk, D+1] matmul + the rescale — no separate row-sum pass.

    Masking uses a large FINITE negative (-1e30) instead of -inf: a k-block
    that is entirely padding then yields m_new == m_prev == -1e30, alpha =
    exp2(0) = 1 and p rows that are explicitly zeroed — no (-inf) - (-inf)
    NaNs, and padded keys contribute exactly nothing to the denominator.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [Bq, D]
    k = k_ref[0]  # [Bk, D]
    v = v_ref[0]  # [Bk, D]
    d = q.shape[-1]
    # exp2 scale folding, exactly as the resident kernel (_attend_one_head)
    c = jnp.asarray(scale * 1.4426950408889634, q.dtype)
    s = jax.lax.dot_general(
        q * c, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Bk] fp32, log2 domain
    valid = (j * block_k
             + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)) < nk
    s = jnp.where(valid, s, jnp.float32(-1e30))
    m_prev = m_ref[...]                                   # [Bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.where(valid, jnp.exp2(s - m_new), jnp.float32(0.0))
    v1 = _append_ones_column(v)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p.astype(v.dtype), v1, preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = _defer_div_finish(acc_ref[...], d, o_ref.dtype)


def _streaming_bytes(bq: int, bk: int, d: int) -> int:
    """Working-set bytes of one streaming program, sized conservatively in
    fp32 — the SINGLE source for the compile-time vmem_limit and the
    _fit_blocks_streaming approval (the packed kernels' _packed_*_bytes
    convention, so the two sites cannot diverge): K/V blocks + pipeline
    double buffers, q/out blocks, SIX live [bq, bk] score-sized temporaries
    (the fp32 scores, the masked where result, the int32 iota, the widened
    mask, p, and p's low-precision cast — the packed-bwd on-chip probe
    showed Mosaic keeps ~2x the naive count live across unrolled ops), and
    the m/acc scratch with the (bq, 1) running max lane-padded to 128."""
    kv = 4 * bk * d * 4
    blocks = 4 * bq * d * 4
    scores = 6 * bq * bk * 4
    scratch = bq * 128 * 4 + bq * (128 * ((d + 1 + 127) // 128)) * 4
    return kv + blocks + scores + scratch + (1 << 21)


def _fit_blocks_streaming(nq: int, nk: int, d: int, requested_bq: int,
                          requested_bk: int):
    """(block_q, block_k) whose streaming working set (_streaming_bytes)
    fits the VMEM budget. Unlike the resident kernel this always succeeds
    for sane D — the set scales with the BLOCK sizes, not with Nk — but
    return None rather than shrinking block_q below its floor. BOTH
    requested sizes clamp UP to their floors (block_q to 8, block_k to 128
    — each capped at the actual sequence length, so e.g. a forced-streaming
    nk=64 still evaluates bk=64 instead of vacuously falling back to XLA):
    a tiny request (say a tuner exporting DSML_FLASH_BLOCK_K=64 or
    DSML_FLASH_BLOCK_Q=4) must not silently disable streaming and re-expose
    the O(Nk^2) XLA fallback it exists to avoid."""
    bq_floor = min(8, nq)
    bk_floor = min(128, nk)
    bq = min(max(requested_bq, bq_floor), nq)
    while bq >= bq_floor:
        bk = min(max(requested_bk, bk_floor), nk)
        while bk >= bk_floor:
            if _streaming_bytes(bq, bk, d) <= _VMEM_BUDGET:
                return bq, bk
            bk //= 2
        bq //= 2
    return None


def flash_attention_streaming(q, k, v, scale=None, block_q: int = 512,
                              block_k: int = 1024, interpret: bool = False):
    """Streaming Pallas attention for long sequences. q: [B, H, Nq, D],
    k/v: [B, H, Nk, D] -> [B, H, Nq, D].

    Unlike flash_attention (which keeps one head's whole K/V resident in
    VMEM — _fit_block_q's budget admits that up to Nk ~ 115k at d=32 /
    ~62k at d=64, shrinking block_q as Nk grows), this kernel streams K/V
    in blocks with online-softmax rescaling, so HBM footprint is O(N) and
    VMEM footprint is O(block_q * block_k) — arbitrary sequence lengths.
    The flagship never needs it (Nk <= 4096, resident at full block_q); it
    exists so the dispatch has an honest native path beyond the resident
    kernel's reach instead of falling back to XLA's O(Nk^2)-scores
    attention. Auto dispatch engages it exactly where _fit_block_q returns
    None; DSML_FLASH_STREAMING=1 forces it for any shape."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h
    q3 = q.reshape(bh, nq, d)
    k3 = k.reshape(bh, nk, d)
    v3 = v.reshape(bh, nk, d)

    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    pad_q = (-nq) % block_q
    if pad_q:
        q3 = jnp.pad(q3, ((0, 0), (0, pad_q), (0, 0)))
    pad_k = (-nk) % block_k
    if pad_k:  # padded keys are masked inside the kernel
        k3 = jnp.pad(k3, ((0, 0), (0, pad_k), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, pad_k), (0, 0)))
    nq_p, nk_p = nq + pad_q, nk + pad_k

    grid = (bh, nq_p // block_q, nk_p // block_k)
    vmem_limit = _vmem_limit(_streaming_bytes(block_q, block_k, d))
    out = pl.pallas_call(
        functools.partial(_flash_kernel_streaming, scale=scale, nk=nk,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q3, k3, v3)
    if pad_q:
        out = out[:, :nq]
    return out.reshape(b, h, nq, d)


def _streaming_lse_kernel(q_ref, k_ref, lse_ref, m_ref, l_ref, *,
                          scale: float, nk: int, block_k: int):
    """Recompute pass of the streamed backward: the log2-domain logsumexp of
    the folded scores per q-row (lse2_i = m_i + log2 sum_j 2^(s2_ij - m_i)),
    so the bwd kernels can form exact softmax probabilities p = 2^(s2 - lse2)
    without a running-max rescale. Same online recurrence and finite -1e30
    masking as the forward (_flash_kernel_streaming)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    c = jnp.asarray(scale * 1.4426950408889634, q.dtype)
    s = jax.lax.dot_general(
        q * c, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    valid = (j * block_k
             + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)) < nk
    s = jnp.where(valid, s, jnp.float32(-1e30))
    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.where(valid, jnp.exp2(s - m_new), jnp.float32(0.0))
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        lse_ref[0] = m_ref[...] + jnp.log2(
            jnp.maximum(l_ref[...], jnp.float32(1e-30)))


def _streaming_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                         dq_ref, acc_ref, *, scale: float, nk: int,
                         block_k: int):
    """dq for one (batch*head, q-block): stream K/V blocks (innermost grid
    axis), accumulating ds @ K in fp32 scratch. p is exact via the
    precomputed lse2; ds = p * (do V^T - delta) with delta_i = do_i . o_i
    (the standard flash-bwd row term, computed outside from the saved
    output). Padded keys carry p = 0 and padded q-rows carry do = 0, so both
    contribute exactly zero."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    c = jnp.asarray(scale * 1.4426950408889634, q.dtype)
    s = jax.lax.dot_general(
        q * c, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    valid = (j * block_k
             + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)) < nk
    p = jnp.where(valid, jnp.exp2(s - lse_ref[0]), jnp.float32(0.0))
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dlt_ref[0])
    acc_ref[...] += jnp.dot(ds, k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = (jnp.float32(scale) * acc_ref[...]).astype(dq_ref.dtype)


def _streaming_dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                           dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                           nk: int, block_k: int):
    """dk/dv for one (batch*head, k-block): stream q-blocks (innermost grid
    axis), accumulating ds^T @ Q and p^T @ dO in fp32 scratch. Same p/ds
    construction as _streaming_dq_kernel."""
    jk = pl.program_id(1)
    jq = pl.program_id(2)

    @pl.when(jq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    c = jnp.asarray(scale * 1.4426950408889634, q.dtype)
    s = jax.lax.dot_general(
        q * c, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    valid = (jk * block_k
             + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)) < nk
    p = jnp.where(valid, jnp.exp2(s - lse_ref[0]), jnp.float32(0.0))
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dlt_ref[0])
    dk_acc[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jq == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = jnp.float32(scale) * dk_acc[...]
        dv_ref[0] = dv_acc[...]


def _streaming_bwd_bytes(bq: int, bk: int, d: int) -> int:
    """Working-set bytes of one streamed-backward program (fp32 sizing), the
    single source for the bwd vmem_limit and _fit_blocks_streaming_bwd —
    same convention as _streaming_bytes: k/v/q/do blocks + pipeline double
    buffers, EIGHT live [bq, bk] score temporaries (s, mask, iota, p, dp,
    ds + Mosaic's observed ~2x overlap slack), the dq/dk/dv accumulators,
    and the lse/delta blocks lane-padded to 128."""
    kv = 4 * bk * d * 4
    qdo = 4 * bq * d * 4
    scores = 8 * bq * bk * 4
    acc = (bq + 2 * bk) * d * 4
    aux = 4 * bq * 128 * 4
    return kv + qdo + scores + acc + aux + (1 << 21)


def _fit_blocks_streaming_bwd(nq: int, nk: int, d: int, requested_bq: int,
                              requested_bk: int):
    """(block_q, block_k) for the streamed backward — same clamping policy
    as _fit_blocks_streaming, approved against _streaming_bwd_bytes."""
    bq_floor = min(8, nq)
    bk_floor = min(128, nk)
    bq = min(max(requested_bq, bq_floor), nq)
    while bq >= bq_floor:
        bk = min(max(requested_bk, bk_floor), nk)
        while bk >= bk_floor:
            if _streaming_bwd_bytes(bq, bk, d) <= _VMEM_BUDGET:
                return bq, bk
            bk //= 2
        bq //= 2
    return None


def flash_attention_streaming_bwd(q, k, v, o, do, scale=None,
                                  block_q: int = 512, block_k: int = 1024,
                                  interpret: bool = False):
    """Streamed flash backward: (dq, dk, dv) at O(N) HBM / O(bq*bk) VMEM.

    The O(Nk^2)-residual XLA VJP would OOM at exactly the sequence lengths
    that route to the streaming forward, so the backward streams too:
    one LSE-recompute pass (per-row log2-domain logsumexp), then a dq kernel
    (q-blocks outer, K/V streamed) and a dk/dv kernel (k-blocks outer,
    q-blocks streamed), all accumulating in fp32 scratch. delta_i =
    dO_i . O_i comes from the saved forward output (the standard flash-bwd
    identity sum_j p_ij dp_ij = dO_i . O_i)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h
    fit = _fit_blocks_streaming_bwd(nq, nk, d, block_q, block_k)
    if fit is None:  # unreachable for sane d — explicit beats a Mosaic OOM
        raise ValueError(
            f"streamed attention backward cannot fit VMEM at d={d} "
            f"(nq={nq}, nk={nk}); no supported head size reaches this")
    bq, bk = fit

    q3 = q.reshape(bh, nq, d)
    do3 = do.reshape(bh, nq, d)
    o3 = o.reshape(bh, nq, d)
    k3 = k.reshape(bh, nk, d)
    v3 = v.reshape(bh, nk, d)
    pad_q = (-nq) % bq
    if pad_q:
        q3 = jnp.pad(q3, ((0, 0), (0, pad_q), (0, 0)))
        do3 = jnp.pad(do3, ((0, 0), (0, pad_q), (0, 0)))
        o3 = jnp.pad(o3, ((0, 0), (0, pad_q), (0, 0)))
    pad_k = (-nk) % bk
    if pad_k:
        k3 = jnp.pad(k3, ((0, 0), (0, pad_k), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, pad_k), (0, 0)))
    nq_p, nk_p = nq + pad_q, nk + pad_k

    # delta_i = dO_i . O_i — [bh, nq_p, 1] fp32 (padded rows are exactly 0,
    # which zeroes every padded-row ds in the kernels)
    delta = jnp.sum(do3.astype(jnp.float32) * o3.astype(jnp.float32),
                    axis=-1, keepdims=True)

    vmem_limit = _vmem_limit(_streaming_bwd_bytes(bq, bk, d))
    grid_q = (bh, nq_p // bq, nk_p // bk)
    spec_qblk = pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0),
                             memory_space=pltpu.VMEM)
    spec_kblk = pl.BlockSpec((1, bk, d), lambda i, jq, jk: (i, jk, 0),
                             memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, bq, 1), lambda i, jq, jk: (i, jq, 0),
                            memory_space=pltpu.VMEM)

    lse = pl.pallas_call(
        functools.partial(_streaming_lse_kernel, scale=scale, nk=nk,
                          block_k=bk),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, 1), jnp.float32),
        grid=grid_q,
        in_specs=[spec_qblk, spec_kblk],
        out_specs=spec_row,
        scratch_shapes=[pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q3, k3)

    dq = pl.pallas_call(
        functools.partial(_streaming_dq_kernel, scale=scale, nk=nk,
                          block_k=bk),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
        grid=grid_q,
        in_specs=[spec_qblk, spec_kblk, spec_kblk, spec_qblk, spec_row,
                  spec_row],
        out_specs=spec_qblk,
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta)

    grid_k = (bh, nk_p // bk, nq_p // bq)
    kspec_qblk = pl.BlockSpec((1, bq, d), lambda i, jk, jq: (i, jq, 0),
                              memory_space=pltpu.VMEM)
    kspec_kblk = pl.BlockSpec((1, bk, d), lambda i, jk, jq: (i, jk, 0),
                              memory_space=pltpu.VMEM)
    kspec_row = pl.BlockSpec((1, bq, 1), lambda i, jk, jq: (i, jq, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_streaming_dkdv_kernel, scale=scale, nk=nk,
                          block_k=bk),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nk_p, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nk_p, d), jnp.float32),
        ),
        grid=grid_k,
        in_specs=[kspec_qblk, kspec_kblk, kspec_kblk, kspec_qblk, kspec_row,
                  kspec_row],
        out_specs=(kspec_kblk, kspec_kblk),
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta)

    if pad_q:
        dq = dq[:, :nq]
    if pad_k:
        dk = dk[:, :nk]
        dv = dv[:, :nk]
    return (dq.reshape(b, h, nq, d),
            dk.astype(k.dtype).reshape(b, h, nk, d),
            dv.astype(v.dtype).reshape(b, h, nk, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _streaming_attention_diff(q, k, v, scale, block_q, block_k, interpret):
    return flash_attention_streaming(q, k, v, scale, block_q, block_k,
                                     interpret)


def _streaming_fwd(q, k, v, scale, block_q, block_k, interpret):
    out = flash_attention_streaming(q, k, v, scale, block_q, block_k,
                                    interpret)
    # the output rides the residuals (O(N) extra) so the backward can form
    # delta = dO . O without an O(Nk^2) recompute
    return out, (q, k, v, out)


def _streaming_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, o = res
    return flash_attention_streaming_bwd(
        q, k, v, o, g, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret)


_streaming_attention_diff.defvjp(_streaming_fwd, _streaming_bwd)


def flash_attention_packed(q, k, v, heads: int, scale=None,
                           block_q: int = 256, interpret: bool = False):
    """Pallas fused attention on the packed activation layout.

    q: [B, Nq, H*D], k/v: [B, Nk, H*D] — exactly what the to_q/to_k/to_v
    projections produce — with no [B,H,N,D] transpose in HBM on either side
    (see _flash_kernel_packed). Heads run sequentially inside one program;
    K/V rows are fetched once per batch element and reused by every head.
    """
    b, nq, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    nk = k.shape[1]
    defer_div, pv_transpose, norm_bound, staged = _flash_flags(nk)

    block_q = min(block_q, nq)
    pad_q = (-nq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    nq_p = nq + pad_q

    grid = (b, nq_p // block_q)
    # _packed_fwd_bytes is the SAME formula _fit_block_q_packed approves
    # with, so a fit-approved shape cannot die in a VMEM-limit compile error
    vmem_limit = _vmem_limit(_packed_fwd_bytes(block_q, nk, hd))
    out = pl.pallas_call(
        functools.partial(_flash_kernel_packed, scale=scale, heads=heads,
                          defer_div=defer_div, pv_transpose=pv_transpose,
                          norm_bound=norm_bound, staged=staged),
        out_shape=jax.ShapeDtypeStruct((b, nq_p, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q, k, v)
    if pad_q:
        out = out[:, :nq]
    return out


def _flash_kernel_packed_fproj(hq_ref, hkv_ref, wq_ref, wk_ref, wv_ref,
                               wo_ref, bo_ref, o_ref, *, scale: float,
                               heads: int, defer_div: bool,
                               pv_transpose: bool, norm_bound: bool,
                               staged: bool):
    """One (batch, q-block) program of the PROJECTION-FUSED self-attention:
    the kernel reads the normed residual stream h ONCE and computes
        out = concat_h(softmax(hWq (hWk)^T * scale) hWv) @ Wo + bo
    entirely in VMEM — q/k/v/attn-out never exist in HBM. K/V are
    recomputed per q-block (nq/bq times); at the flagship shapes that is
    ~2% extra MXU work against ~15 HBM tensor passes saved around the
    stock path (projection writes+reads, attn-out round trip)."""
    hq = hq_ref[0]            # [Bq, C] rows of h for this q-block
    hkv = hkv_ref[0]          # [N, C] full stream for K/V
    f32 = jnp.float32
    q = jnp.dot(hq, wq_ref[...], preferred_element_type=f32).astype(hq.dtype)
    k = jnp.dot(hkv, wk_ref[...], preferred_element_type=f32).astype(hq.dtype)
    v = jnp.dot(hkv, wv_ref[...], preferred_element_type=f32).astype(hq.dtype)
    att = _packed_heads_attend(
        q, k, v, heads=heads, out_dtype=hq.dtype, scale=scale,
        defer_div=defer_div, pv_transpose=pv_transpose,
        norm_bound=norm_bound, staged=staged)
    out = jnp.dot(att, wo_ref[...], preferred_element_type=f32) + bo_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _fproj_fwd_bytes(bq: int, n: int, c: int, hd: int, itemsize: int) -> int:
    """Working-set bytes of one fused-projection program: h stream (+ double
    buffers), computed q/k/v, the packed per-head score budget (same 4-score
    allowance as _packed_fwd_bytes), attn/out blocks, weights."""
    return (
        2 * n * c * itemsize          # hkv + pipeline double buffer
        + 2 * bq * c * itemsize       # hq block (+ buffer)
        + (bq + 2 * n) * hd * itemsize  # computed q, k, v
        + 4 * bq * n * 4              # score matrices (fp32), staged depth
        + 2 * bq * max(c, hd) * 4     # att + out in fp32 before cast
        + (3 * c * hd + hd * c + c) * 4  # weight operands
        + (1 << 21)
    )


def _fit_block_q_fproj(n: int, c: int, hd: int, requested: int,
                       itemsize: int = 2):
    """SINGLE-q-block fit only (block_q == N): with more than one q-block
    the in-kernel K/V projections recompute per block, and the on-chip A/B
    showed that loses at N=4096 (3.513 vs 3.646 f/s) while the one-block
    shapes win (headline 7.246 vs 7.188) — so multi-block shapes stay on
    the stock packed kernel. Approves with the REAL activation itemsize —
    the same number flash_attention_fproj compiles its vmem_limit from, so
    a fit-approved shape cannot die in a Mosaic VMEM error. None =
    ineligible."""
    del requested  # the only admissible block is the whole N
    if _fproj_fwd_bytes(n, n, c, hd, itemsize) <= _VMEM_BUDGET:
        return n
    return None


def fproj_eligible(n: int, c: int, hd: int, itemsize: int = 2) -> bool:
    """Module-side predicate: True when the fused-projection kernel admits
    this self-attention shape (single q-block fits VMEM). Ineligible shapes
    should take the stock packed path, NOT the composed fallback."""
    return _fit_block_q_fproj(n, c, hd, n, itemsize) is not None


def flash_attention_fproj(h, wq, wk, wv, wo, bo, heads: int, scale=None,
                          block_q: int = 1024, interpret: bool = False):
    """Projection-fused packed self-attention. h: [B, N, C] (the LayerNorm
    output), wq/wk/wv: [C, H*D], wo: [H*D, C], bo: [C] -> [B, N, C]."""
    b, n, c = h.shape
    hd = wq.shape[-1]
    d = hd // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    defer_div, pv_transpose, norm_bound, staged = _flash_flags(n)
    block_q = min(block_q, n)
    # pad the q-view so every output row is written (K/V view stays the
    # true N — softmax rows are independent); the dispatch path always
    # passes block_q == n, but the public entry must be safe at any shape
    hq = h
    pad_q = (-n) % block_q
    if pad_q:
        hq = jnp.pad(h, ((0, 0), (0, pad_q), (0, 0)))
    nq_p = n + pad_q
    grid = (b, nq_p // block_q)
    vmem_limit = _vmem_limit(
        _fproj_fwd_bytes(block_q, n, c, hd, jnp.dtype(h.dtype).itemsize))
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_packed_fproj, scale=scale, heads=heads,
            defer_div=defer_div, pv_transpose=pv_transpose,
            norm_bound=norm_bound, staged=staged),
        out_shape=jax.ShapeDtypeStruct((b, nq_p, c), h.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(hq, h, wq, wk, wv, wo, bo[None, :])
    if pad_q:
        out = out[:, :n]
    return out


def _flash_kernel_packed_qout(hq_ref, k_ref, v_ref, wq_ref, wo_ref, bo_ref,
                              o_ref, *, scale: float, heads: int,
                              defer_div: bool, pv_transpose: bool,
                              norm_bound: bool, staged: bool):
    """Partial projection fusion for multi-q-block shapes: K/V arrive
    precomputed (no per-block recompute), the kernel fuses only the q
    projection and the output projection around the per-head attention —
    q and the attention output never round-trip HBM."""
    hq = hq_ref[0]            # [Bq, C]
    k = k_ref[0]              # [Nk, H*D]
    v = v_ref[0]
    f32 = jnp.float32
    q = jnp.dot(hq, wq_ref[...], preferred_element_type=f32).astype(k.dtype)
    att = _packed_heads_attend(
        q, k, v, heads=heads, out_dtype=k.dtype, scale=scale,
        defer_div=defer_div, pv_transpose=pv_transpose,
        norm_bound=norm_bound, staged=staged)
    out = jnp.dot(att, wo_ref[...], preferred_element_type=f32) + bo_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _qout_fwd_bytes(bq: int, nk: int, c: int, hd: int, itemsize: int) -> int:
    """Working set of one q/out-fused program: the packed-forward budget
    plus the hq block, weights, and the fp32 out block."""
    return (_packed_fwd_bytes(bq, nk, hd)
            + 2 * bq * c * itemsize
            + (c * hd + hd * c + c) * 4
            + 2 * bq * c * 4)


def _fit_block_q_qout(nq: int, nk: int, c: int, hd: int, requested: int,
                      itemsize: int = 2):
    """Approves with the REAL activation itemsize — the same number
    flash_attention_qout compiles its vmem_limit from."""
    bq = min(max(requested, 8), nq)
    while bq >= 8:
        if _qout_fwd_bytes(bq, nk, c, hd, itemsize) <= _VMEM_BUDGET:
            return bq
        bq //= 2
    return None


def flash_attention_qout(h, k, v, wq, wo, bo, heads: int, scale=None,
                         block_q: int = 1024, interpret: bool = False):
    """q/out-projection-fused packed self-attention. h: [B, N, C] (normed
    stream), k/v: [B, Nk, H*D] precomputed, wq: [C, H*D], wo: [H*D, C],
    bo: [C] -> [B, N, C]."""
    b, n, c = h.shape
    hd = k.shape[-1]
    d = hd // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    nk = k.shape[1]
    defer_div, pv_transpose, norm_bound, staged = _flash_flags(nk)
    block_q = min(block_q, n)
    pad_q = (-n) % block_q
    if pad_q:
        h = jnp.pad(h, ((0, 0), (0, pad_q), (0, 0)))
    nq_p = n + pad_q
    grid = (b, nq_p // block_q)
    vmem_limit = _vmem_limit(
        _qout_fwd_bytes(block_q, nk, c, hd, jnp.dtype(h.dtype).itemsize))
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_packed_qout, scale=scale, heads=heads,
            defer_div=defer_div, pv_transpose=pv_transpose,
            norm_bound=norm_bound, staged=staged),
        out_shape=jax.ShapeDtypeStruct((b, nq_p, c), h.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(h, k, v, wq, wo, bo[None, :])
    if pad_q:
        out = out[:, :n]
    return out


def _qout_reference(h, k, v, wq, wo, bo, heads: int, scale: float):
    """Composed formula for the q/out-fused kernel (fallback + VJP)."""
    q = h @ wq
    b, n, hd = q.shape
    d = hd // heads
    split = lambda t: t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)
    out = attention_reference(split(q), split(k), split(v), scale=scale)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, hd).astype(h.dtype)
    return out @ wo + bo


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _qout_attention_diff(h, k, v, wq, wo, bo, heads, scale, block_q,
                         interpret):
    return flash_attention_qout(h, k, v, wq, wo, bo, heads, scale,
                                block_q, interpret)


def _qout_fwd(h, k, v, wq, wo, bo, heads, scale, block_q, interpret):
    out = flash_attention_qout(h, k, v, wq, wo, bo, heads, scale,
                               block_q, interpret)
    return out, (h, k, v, wq, wo, bo)


def _qout_bwd(heads, scale, block_q, interpret, res, g):
    h, k, v, wq, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _qout_reference(*a, heads=heads, scale=scale),
        h, k, v, wq, wo, bo)
    return vjp(g)


_qout_attention_diff.defvjp(_qout_fwd, _qout_bwd)


def fused_qout_self_attention(h, k, v, wq, wo, bo, heads: int, scale=None,
                              use_pallas=None, interpret=False):
    """Dispatch for the q/out-fused self-attention (multi-q-block shapes the
    full fproj gate rejects): Pallas kernel when it fits, composed ops
    otherwise. Mesh callers are not routed here."""
    d = k.shape[-1] // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    wq, wo, bo = (w.astype(h.dtype) for w in (wq, wo, bo))
    if use_pallas is None:
        enabled = (_FLASH_OVERRIDE if _FLASH_OVERRIDE is not None
                   else env_flag("DSML_FLASH_ATTN", True))
        if env_flag("DSML_FLASH_INTERPRET", False):
            use_pallas, interpret = enabled, True
        else:
            use_pallas = (enabled and _on_tpu()
                          and h.shape[1] >= 256 and k.shape[1] >= 256)
    if use_pallas:
        requested_bq = int(os.environ.get("DSML_FLASH_BLOCK_Q", "1024"))
        block_q = _fit_block_q_qout(h.shape[1], k.shape[1], h.shape[2],
                                    k.shape[-1], requested_bq,
                                    jnp.dtype(h.dtype).itemsize)
        if block_q is not None:
            return _qout_attention_diff(h, k, v, wq, wo, bo, heads, scale,
                                        block_q, interpret)
    return _qout_reference(h, k, v, wq, wo, bo, heads=heads, scale=scale)


def _fproj_reference(h, wq, wk, wv, wo, bo, heads: int, scale: float):
    """Composed formula the fused kernel implements — the fallback path and
    the custom-VJP backward (differentiable). Weights arrive pre-cast to
    the activation dtype (dispatch casts once, like nn.Dense dtype=)."""
    q = h @ wq
    k = h @ wk
    v = h @ wv
    b, n, hd = q.shape
    d = hd // heads
    split = lambda t: t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    out = attention_reference(split(q), split(k), split(v), scale=scale)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, hd).astype(h.dtype)
    return out @ wo + bo


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fproj_attention_diff(h, wq, wk, wv, wo, bo, heads, scale, block_q,
                          interpret):
    return flash_attention_fproj(h, wq, wk, wv, wo, bo, heads, scale,
                                 block_q, interpret)


def _fproj_fwd(h, wq, wk, wv, wo, bo, heads, scale, block_q, interpret):
    out = flash_attention_fproj(h, wq, wk, wv, wo, bo, heads, scale,
                                block_q, interpret)
    return out, (h, wq, wk, wv, wo, bo)


def _fproj_bwd(heads, scale, block_q, interpret, res, g):
    # sampling is the fused path's target; gradients recompute through the
    # composed formula (exact same math, standard XLA kernels)
    h, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _fproj_reference(*a, heads=heads, scale=scale),
        h, wq, wk, wv, wo, bo)
    return vjp(g)


_fproj_attention_diff.defvjp(_fproj_fwd, _fproj_bwd)


def fused_proj_self_attention(h, wq, wk, wv, wo, bo, heads: int, scale=None,
                              use_pallas=None, interpret=False):
    """Dispatch for the projection-fused self-attention block
    (models/unet.py DSML_ATTN_FUSED_PROJ=1): Pallas kernel when the shape
    fits, composed XLA ops otherwise. Mesh callers are NOT routed here (the
    module falls back to the stock packed path under a mesh)."""
    d = wq.shape[-1] // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # one cast to the activation dtype (matching nn.Dense dtype= behavior);
    # gradients flow back through the casts to the fp32 params
    wq, wk, wv, wo, bo = (w.astype(h.dtype) for w in (wq, wk, wv, wo, bo))
    if use_pallas is None:
        enabled = (_FLASH_OVERRIDE if _FLASH_OVERRIDE is not None
                   else env_flag("DSML_FLASH_ATTN", True))
        if env_flag("DSML_FLASH_INTERPRET", False):
            use_pallas, interpret = enabled, True
        else:
            use_pallas = enabled and _on_tpu() and h.shape[1] >= 256
    if use_pallas:
        requested_bq = int(os.environ.get("DSML_FLASH_BLOCK_Q", "1024"))
        block_q = _fit_block_q_fproj(h.shape[1], h.shape[2], wq.shape[-1],
                                     requested_bq,
                                     jnp.dtype(h.dtype).itemsize)
        if block_q is not None:
            return _fproj_attention_diff(h, wq, wk, wv, wo, bo, heads,
                                         scale, block_q, interpret)
    return _fproj_reference(h, wq, wk, wv, wo, bo, heads=heads, scale=scale)


def _attend_one_head_bwd(q, k, v, do, *, scale: float,
                         defer_div: bool = True):
    """Single-head flash backward core shared by the split-head and packed
    bwd kernels: recompute P for the q-block, return this block's
    (dq, dk_contrib, dv_contrib), all fp32.

    Same VPU-saving reformulations as the forward kernel: scale folds into
    Q in the log2 domain (pre-scaled scores off the MXU, exp2 not exp) and
    the softmax normalization never touches the [Bq, Nk] matrix — row
    sums ride MXU dots against a ones vector, and 1/denom folds into
    per-ROW scalings of do / q / dq (all [Bq, D]-sized):
      dv[j]  = sum_i (p_un[i,j]/den_i) do[i]   = p_un^T @ (do/den)
      dk[j]  = sum_i ds_un[i,j]/den_i  q[i]    = ds_un^T @ (q/den)
      dq[i]  = (1/den_i) * ds_un[i] @ K
    """
    c2 = jnp.asarray(scale * 1.4426950408889634, q.dtype)  # log2(e)
    s = jax.lax.dot_general(
        q * c2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p_un = jnp.exp2(s - m)                              # [Bq, Nk] unnormalized
    if defer_div:
        ones = jnp.ones((k.shape[0], 1), jnp.float32)
        den = jnp.dot(p_un, ones, preferred_element_type=jnp.float32)
        inv_den = 1.0 / den
    else:
        inv_den = None
        p_un = p_un / jnp.sum(p_un, axis=-1, keepdims=True)  # normalized p

    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [Bq, Nk]
    if defer_div:
        pdp = p_un * dp
        row = jnp.dot(pdp, ones, preferred_element_type=jnp.float32) * inv_den
    else:
        row = jnp.sum(dp * p_un, axis=-1, keepdims=True)
    ds_un = p_un * (dp - row)   # defer_div: = den * ds; else: = ds

    do_s = do * inv_den if defer_div else do
    q_s = (q.astype(jnp.float32) * inv_den if defer_div
           else q.astype(jnp.float32))
    dv = jax.lax.dot_general(
        p_un, do_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk = scale * jax.lax.dot_general(
        ds_un, q_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq = jnp.dot(ds_un, k.astype(jnp.float32),
                 preferred_element_type=jnp.float32)
    dq = (scale * inv_den * dq) if defer_div else (scale * dq)
    return dq, dk, dv


def _flash_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                      *, scale: float, defer_div: bool = True):
    """Backward for one (batch*head, q-block): recompute P for the block, emit
    dq for the block and accumulate dk/dv across the sequential q-block grid.
    Zero-padded q/do rows contribute exactly zero to dk/dv, so no masking.
    """
    j = pl.program_id(1)
    dq, dk, dv = _attend_one_head_bwd(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0].astype(jnp.float32),
        scale=scale, defer_div=defer_div,
    )

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    # dk/dv out buffers are fp32 regardless of model dtype: a bf16
    # read-modify-write across the sequential q-block grid would re-round
    # the running sum every step (cast to param dtype happens once, outside)
    dv_ref[0] += dv
    dk_ref[0] += dk
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_kernel_packed(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                             dv_ref, *, scale: float, heads: int,
                             defer_div: bool = True):
    """Packed-layout backward for one (batch, q-block) program: the [N, H*D]
    activations feed the kernel directly, so training pays NO head-split
    transposes around the backward either (see _flash_kernel_packed for the
    forward rationale). Heads run sequentially with static lane slices;
    per-head dk/dv contributions are concatenated so the grid-sequential
    fp32 accumulation is one full-width read-modify-write, not H lane-sliced
    ones."""
    j = pl.program_id(1)
    q = q_ref[0]                       # [Bq, H*D]
    k = k_ref[0]                       # [Nk, H*D]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    d = q.shape[-1] // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        dq_h, dk_h, dv_h = _attend_one_head_bwd(
            q[:, sl], k[:, sl], v[:, sl], do[:, sl],
            scale=scale, defer_div=defer_div,
        )
        dqs.append(dq_h)
        dks.append(dk_h)
        dvs.append(dv_h)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jnp.concatenate(dks, axis=-1)
    dv_ref[0] += jnp.concatenate(dvs, axis=-1)
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)


def flash_attention_bwd(q, k, v, do, scale=None, block_q: int = 256,
                        interpret: bool = False):
    """Pallas flash-attention backward: (dq, dk, dv), no N^2 HBM residual."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h
    block_q = min(block_q, nq)
    pad_q = (-nq) % block_q
    q3 = q.reshape(bh, nq, d)
    do3 = do.reshape(bh, nq, d)
    if pad_q:
        q3 = jnp.pad(q3, ((0, 0), (0, pad_q), (0, 0)))
        do3 = jnp.pad(do3, ((0, 0), (0, pad_q), (0, 0)))
    k3 = k.reshape(bh, nk, d)
    v3 = v.reshape(bh, nk, d)
    nq_p = nq + pad_q

    vmem_limit = _vmem_limit(
        6 * nk * d * 4 + 4 * (block_q * nk * 4) + 8 * block_q * d * 4 + (1 << 21)
    )
    bwd_defer = env_flag("DSML_FLASH_BWD_DEFER", True)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale,
                          defer_div=bwd_defer),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), jnp.float32),  # fp32 accumulators
            jax.ShapeDtypeStruct((bh, nk, d), jnp.float32),
        ),
        grid=(bh, nq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q3, k3, v3, do3)
    if pad_q:
        dq = dq[:, :nq]
    shape4 = lambda t, n: t.reshape(b, h, n, d)
    return (shape4(dq, nq),
            shape4(dk.astype(k.dtype), nk),
            shape4(dv.astype(v.dtype), nk))


def flash_attention_bwd_packed(q, k, v, do, heads: int, scale=None,
                               block_q: int = 256, interpret: bool = False):
    """Packed-layout flash backward: q/k/v/do [B, N, H*D] -> (dq, dk, dv) in
    the same packed layout, no [B,H,N,D] transpose in HBM on either side."""
    b, nq, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    nk = k.shape[1]
    block_q = min(block_q, nq)
    pad_q = (-nq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, pad_q), (0, 0)))
    nq_p = nq + pad_q

    # _packed_bwd_bytes is the SAME formula _fit_block_q_packed_bwd approves
    # with, so a fit-approved shape cannot die in a VMEM-limit compile error
    vmem_limit = _vmem_limit(_packed_bwd_bytes(block_q, nk, hd))
    bwd_defer = env_flag("DSML_FLASH_BWD_DEFER", True)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel_packed, scale=scale, heads=heads,
                          defer_div=bwd_defer),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq_p, hd), q.dtype),
            jax.ShapeDtypeStruct((b, nk, hd), jnp.float32),  # fp32 accumulators
            jax.ShapeDtypeStruct((b, nk, hd), jnp.float32),
        ),
        grid=(b, nq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q, k, v, do)
    if pad_q:
        dq = dq[:, :nq]
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_diff(q, k, v, scale, block_q=256, interpret=False):
    return flash_attention(q, k, v, scale=scale, block_q=block_q,
                           interpret=interpret)


def _flash_fwd(q, k, v, scale, block_q, interpret):
    return (flash_attention(q, k, v, scale=scale, block_q=block_q,
                            interpret=interpret), (q, k, v))


def _flash_bwd(scale, block_q, interpret, res, g):
    q, k, v = res
    return flash_attention_bwd(q, k, v, g, scale=scale, block_q=block_q,
                               interpret=interpret)


_flash_attention_diff.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _packed_attention_diff(q, k, v, heads, scale, block_q=256,
                           interpret=False):
    return flash_attention_packed(q, k, v, heads, scale=scale,
                                  block_q=block_q, interpret=interpret)


def _packed_fwd(q, k, v, heads, scale, block_q, interpret):
    return (flash_attention_packed(q, k, v, heads, scale=scale,
                                   block_q=block_q, interpret=interpret),
            (q, k, v))


def _packed_bwd(heads, scale, block_q, interpret, res, g):
    q, k, v = res
    nq, nk = q.shape[1], k.shape[1]
    # packed bwd kernel: training keeps the [B,N,H*D] layout through the
    # backward too — no head-split transposes in HBM. Its working set is
    # bigger than the forward's (fp32 dk/dv accumulators + 3 live score
    # temporaries per head), so it re-fits its own block_q; if even the
    # smallest block can't fit, fall back to the split-head bwd through
    # transposes (correct, just pays the copies).
    if env_flag("DSML_FLASH_PACKED_BWD", True):
        bq = _fit_block_q_packed_bwd(nq, nk, q.shape[-1], block_q)
        if bq is not None:
            return flash_attention_bwd_packed(
                q, k, v, g, heads, scale=scale, block_q=bq,
                interpret=interpret,
            )

    def split(t, n):
        b = t.shape[0]
        d = t.shape[-1] // heads
        return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    dq, dk, dv = flash_attention_bwd(
        split(q, nq), split(k, nk), split(v, nk), split(g, nq),
        scale=scale, block_q=block_q, interpret=interpret,
    )
    merge = lambda t, n: t.transpose(0, 2, 1, 3).reshape(t.shape[0], n, -1)
    return merge(dq, nq), merge(dk, nk), merge(dv, nk)


_packed_attention_diff.defvjp(_packed_fwd, _packed_bwd)


# v5e VMEM is 128MB; leave headroom for Mosaic's own buffers
_VMEM_BUDGET = 100 * (1 << 20)


def _fit_block_q(nq: int, nk: int, d: int, requested: int):
    """Largest block_q <= requested whose working set fits the VMEM budget,
    or None if even the smallest block cannot fit (fall back to XLA).

    Deliberately dtype-independent: sized on the fp32 BACKWARD working set
    (the larger of the two passes), because the custom VJP means any forward
    call may later be differentiated with the same block_q. K/V/dk/dv in
    fp32 + two fp32 [block_q, nk] score/ds buffers (double-buffered by the
    pipeline) + q/do/dq blocks. The request clamps UP to the 8 floor (a
    sub-8 DSML_FLASH_BLOCK_Q must not silently disable every kernel)."""
    bq = min(max(requested, 8), nq)
    while bq >= 8:
        kv_resident = 6 * nk * d * 4
        scores = 4 * (bq * nk * 4)
        blocks = 8 * bq * d * 4
        if kv_resident + scores + blocks + (1 << 21) <= _VMEM_BUDGET:
            return bq
        bq //= 2
    return None


def _fit_block_q_packed(nq: int, nk: int, hd: int, requested: int):
    """VMEM fit for the packed forward kernel — approves with the SAME
    _packed_fwd_bytes formula flash_attention_packed compiles its
    vmem_limit from (request clamped up to the 8 floor, see _fit_block_q)."""
    bq = min(max(requested, 8), nq)
    while bq >= 8:
        if _packed_fwd_bytes(bq, nk, hd) <= _VMEM_BUDGET:
            return bq
        bq //= 2
    return None


def _fit_block_q_packed_bwd(nq: int, nk: int, hd: int, requested: int):
    """VMEM fit for the packed BACKWARD kernel — approves with the SAME
    _packed_bwd_bytes formula flash_attention_bwd_packed compiles its
    vmem_limit from (request clamped up to the 8 floor, see _fit_block_q)."""
    bq = min(max(requested, 8), nq)
    while bq >= 8:
        if _packed_bwd_bytes(bq, nk, hd) <= _VMEM_BUDGET:
            return bq
        bq //= 2
    return None


def _packed_partition_spec(mesh, b: int, heads: int):
    """Largest [B, N, H*D] partitioning for the packed layout: batch over
    `data`, the packed head axis over `model` (lane shards land on head
    boundaries whenever model divides the head count, since head h owns the
    contiguous lane range [h*d, (h+1)*d)). None when nothing divides — the
    caller falls back to the split-head dispatch. Same gating as
    _attention_partition_spec (shared _mesh_axis_split), only the axis
    arrangement differs."""
    from jax.sharding import PartitionSpec as P

    spec_b, spec_h = _mesh_axis_split(mesh, b, heads)
    if spec_b is None and spec_h is None:
        return None
    return P(spec_b, None, spec_h)


def packed_multi_head_attention(q, k, v, heads: int, scale=None,
                                use_pallas=None, interpret=False):
    """Attention on the packed activation layout: q [B, Nq, H*D],
    k/v [B, Nk, H*D] -> [B, Nq, H*D].

    Dispatch twin of multi_head_attention for callers that keep activations
    packed (models/unet.py DSML_ATTN_PACKED=1): the flash path runs
    _flash_kernel_packed with NO head-split transpose in HBM on either side.
    On a multi-device mesh the kernel shard_maps over the mesh — batch over
    `data`, the packed head axis over `model` (lane shards land on head
    boundaries when model divides the head count) — each device running the
    same single-device packed program on its shard with zero collectives.
    Anything the packed kernel cannot take (tiny KV, VMEM overflow, CPU,
    flash disabled, a mesh nothing divides over) falls back to the standard
    split-head dispatch, so the packed entry is always safe to call."""
    d = q.shape[-1] // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        enabled = (_FLASH_OVERRIDE if _FLASH_OVERRIDE is not None
                   else env_flag("DSML_FLASH_ATTN", True))
        if env_flag("DSML_FLASH_INTERPRET", False):
            # test hook: run the REAL kernel dispatch (custom VJPs, fit
            # checks, shard_map) in Pallas interpret mode on any backend
            # and at any size, so CPU tests drive the production path
            # end-to-end through full models
            use_pallas, interpret = enabled, True
        else:
            use_pallas = (
                enabled and _on_tpu()
                and q.shape[1] >= 256 and k.shape[1] >= 256
            )
    if use_pallas:
        mesh = _ATTN_MESH
        requested_bq = int(os.environ.get("DSML_FLASH_BLOCK_Q", "1024"))
        if mesh is not None and mesh.size > 1:
            spec = _packed_partition_spec(mesh, q.shape[0], heads)
            if spec is not None:
                nm = mesh.shape.get("model", 1)
                heads_local = heads // nm if spec[2] == "model" else heads
                # fit on the PER-DEVICE shapes the kernel will actually see
                block_q = _fit_block_q_packed(
                    q.shape[1], k.shape[1], heads_local * d, requested_bq
                )
                if block_q is not None:
                    run = jax.shard_map(
                        lambda qq, kk, vv: _packed_attention_diff(
                            qq, kk, vv, heads_local, scale, block_q,
                            interpret),
                        mesh=mesh, in_specs=(spec, spec, spec),
                        out_specs=spec, check_vma=False,
                    )
                    return run(q, k, v)
            # nothing divides (or no VMEM fit): the split-head dispatch
            # handles the mesh (its own shard_map, or the XLA path GSPMD
            # partitions on its own)
        else:
            block_q = _fit_block_q_packed(
                q.shape[1], k.shape[1], q.shape[2], requested_bq
            )
            if block_q is not None:
                return _packed_attention_diff(q, k, v, heads, scale, block_q,
                                              interpret)

    def split(t):
        b, n = t.shape[0], t.shape[1]
        return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    out = multi_head_attention(split(q), split(k), split(v), scale=scale,
                               use_pallas=use_pallas, interpret=interpret)
    b, n = q.shape[0], q.shape[1]
    return out.transpose(0, 2, 1, 3).reshape(b, n, heads * d)


def multi_head_attention(q, k, v, scale=None, use_pallas=None, interpret=False):
    """Dispatch: Pallas flash kernel for real self-attention workloads on TPU,
    jnp path otherwise (tiny-KV cross-attention, CPU tests). interpret=True
    runs the SAME differentiable wrapper (custom VJP, env block size) in
    Pallas interpret mode, so CPU checks exercise the production path.

    The resident kernel keeps the whole K/V for one head in VMEM, so its
    reach is bounded: the q-block is shrunk until the working set fits the
    VMEM budget, and shapes that cannot fit at any block size (huge Nk)
    route to the STREAMING kernel (online-softmax over K/V blocks, O(N) HBM
    footprint, DSML_FLASH_STREAMING=auto|1|0) rather than dying in a Mosaic
    OOM at compile time; with streaming disabled they fall back to XLA."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if use_pallas is None:
        enabled = (_FLASH_OVERRIDE if _FLASH_OVERRIDE is not None
                   else env_flag("DSML_FLASH_ATTN", True))
        if env_flag("DSML_FLASH_INTERPRET", False):
            use_pallas, interpret = enabled, True  # test hook, see packed
        else:
            use_pallas = (
                enabled and _on_tpu()
                and q.shape[2] >= 256 and k.shape[2] >= 256
            )
    if use_pallas:
        # v5e A/B on the flagship bench (frames/s/chip): 128 -> 5.50,
        # 256 -> 5.99, 512 -> 6.08, 1024 -> 6.13 — bigger q-blocks win
        # monotonically (fewer grid steps; N=1024 runs as one program)
        requested_bq = int(os.environ.get("DSML_FLASH_BLOCK_Q", "1024"))
        stream_env = env_mode("DSML_FLASH_STREAMING", "auto",
                              ("auto", "1", "0"))
        block_q = (None if stream_env == "1" else _fit_block_q(
            q.shape[2], k.shape[2], q.shape[3], requested_bq))
        run_one = None
        if block_q is not None:
            run_one = lambda qq, kk, vv: _flash_attention_diff(
                qq, kk, vv, scale, block_q, interpret)
        elif stream_env != "0":
            # whole-K/V exceeds VMEM at any q-block: stream K/V with online
            # softmax instead of falling back to XLA's O(Nk^2)-scores path
            fit = _fit_blocks_streaming(
                q.shape[2], k.shape[2], q.shape[3], requested_bq,
                int(os.environ.get("DSML_FLASH_BLOCK_K", "1024")))
            if fit is not None:
                run_one = lambda qq, kk, vv: _streaming_attention_diff(
                    qq, kk, vv, scale, fit[0], fit[1], interpret)
        if run_one is not None:
            mesh = _ATTN_MESH
            if mesh is not None and mesh.size > 1:
                spec = _attention_partition_spec(mesh, q.shape[0], q.shape[1])
                if spec is None:
                    # nothing shards cleanly: a bare pallas_call would force
                    # GSPMD gathers — the XLA path partitions instead
                    return attention_reference(q, k, v, scale=scale)
                run = jax.shard_map(
                    run_one, mesh=mesh, in_specs=(spec, spec, spec),
                    out_specs=spec, check_vma=False,
                )
                return run(q, k, v)
            return run_one(q, k, v)
    return attention_reference(q, k, v, scale=scale)
