"""Pallas kernels (interpret mode on CPU) vs jnp reference specs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsml_thesis_tpu.ops import (
    attention_reference,
    flash_attention,
    group_norm_silu_pallas,
    group_norm_silu_reference,
)


@pytest.mark.parametrize("nq,nk", [(64, 64), (256, 256), (100, 100)])
def test_flash_attention_matches_reference(nq, nk):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, d = 2, 5, 32
    q = jax.random.normal(kq, (b, h, nq, d))
    k = jax.random.normal(kk, (b, h, nk, d))
    v = jax.random.normal(kv, (b, h, nk, d))
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-4)


def test_flash_attention_bf16():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 2, 128, 32), dtype=jnp.bfloat16)
    ref = attention_reference(q, q, q)
    out = flash_attention(q, q, q, block_q=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        atol=2e-2,
    )


@pytest.mark.parametrize("nq,nk", [(64, 64), (100, 100)])
def test_flash_attention_backward_matches_reference(nq, nk):
    from dsml_thesis_tpu.ops.attention import flash_attention_bwd

    key = jax.random.PRNGKey(3)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, h, d = 2, 3, 32
    q = jax.random.normal(kq, (b, h, nq, d))
    k = jax.random.normal(kk, (b, h, nk, d))
    v = jax.random.normal(kv, (b, h, nk, d))
    g = jax.random.normal(kg, (b, h, nq, d))
    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv = flash_attention_bwd(q, k, v, g, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 160), 32), ((2, 16, 320), 32), ((1, 4, 4, 128), 32)])
def test_group_norm_silu_pallas_matches_reference(shape, groups):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, shape) * 3 + 1
    c = shape[-1]
    gamma = jax.random.normal(jax.random.PRNGKey(3), (c,)) * 0.1 + 1
    beta = jax.random.normal(jax.random.PRNGKey(4), (c,)) * 0.1
    ref = group_norm_silu_reference(x, gamma, beta, num_groups=groups)
    out = group_norm_silu_pallas(x, gamma, beta, num_groups=groups, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("variant", ["barrier", "cat", "pair", "mm"])
def test_group_norm_stats_variants_match_ref(variant, monkeypatch):
    """Every DSML_GN_VARIANT stats formulation (incl. the MXU Gram-matrix
    'mm') computes the same GroupNorm+SiLU as the default two-reduce path."""
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (2, 8, 8, 160)) * 3 + 1
    gamma = jax.random.normal(jax.random.PRNGKey(3), (160,)) * 0.1 + 1
    beta = jax.random.normal(jax.random.PRNGKey(4), (160,)) * 0.1

    monkeypatch.delenv("DSML_GN_VARIANT", raising=False)
    ref = group_norm_silu_reference(x, gamma, beta, num_groups=32)
    monkeypatch.setenv("DSML_GN_VARIANT", variant)
    out = group_norm_silu_reference(x, gamma, beta, num_groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # bf16 input: the mm variant streams bf16 into the dot (f32 accumulate)
    xb = x.astype(jnp.bfloat16)
    monkeypatch.delenv("DSML_GN_VARIANT", raising=False)
    refb = group_norm_silu_reference(xb, gamma, beta, num_groups=32)
    monkeypatch.setenv("DSML_GN_VARIANT", variant)
    outb = group_norm_silu_reference(xb, gamma, beta, num_groups=32)
    np.testing.assert_allclose(
        np.asarray(outb, np.float32), np.asarray(refb, np.float32),
        atol=0.05, rtol=0.02)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 160), 32), ((3, 100, 64), 32)])
def test_group_norm_stats_fused_matches_reference(shape, groups):
    from dsml_thesis_tpu.ops.groupnorm import group_norm_silu_stats_fused

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, shape) * 2 + 0.5
    c = shape[-1]
    gamma = jax.random.normal(jax.random.PRNGKey(8), (c,)) * 0.1 + 1
    beta = jax.random.normal(jax.random.PRNGKey(9), (c,)) * 0.1
    ref = group_norm_silu_reference(x, gamma, beta, num_groups=groups)
    out = group_norm_silu_stats_fused(x, gamma, beta, num_groups=groups,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)


def test_group_norm_matches_torch():
    """Cross-check the jnp spec against torch.nn.functional.group_norm."""
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 6, 6, 64).astype(np.float32)
    gamma = np.random.RandomState(1).randn(64).astype(np.float32)
    beta = np.random.RandomState(2).randn(64).astype(np.float32)
    ours = group_norm_silu_reference(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), num_groups=32,
        eps=1e-5, silu=False,
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW for torch
    ref = torch.nn.functional.group_norm(
        xt, 32, torch.from_numpy(gamma), torch.from_numpy(beta), eps=1e-5
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


def test_attention_matches_torch_sdpa():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(5)
    q = rs.randn(2, 4, 64, 32).astype(np.float32)
    k = rs.randn(2, 4, 48, 32).astype(np.float32)
    v = rs.randn(2, 4, 48, 32).astype(np.float32)
    ours = attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_flash_bwd_bf16_accumulates_in_fp32():
    """dk/dv accumulate across q-blocks in fp32 buffers; with bf16 inputs the
    result must match the fp32 reference VJP to bf16-output tolerance (a
    single final rounding, NOT one rounding per grid step)."""
    from dsml_thesis_tpu.ops import flash_attention_bwd

    key = jax.random.PRNGKey(7)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, h, n, d = 1, 2, 128, 32
    q32 = jax.random.normal(kq, (b, h, n, d))
    k32 = jax.random.normal(kk, (b, h, n, d))
    v32 = jax.random.normal(kv, (b, h, n, d))
    g32 = jax.random.normal(kg, (b, h, n, d))

    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v), q32, k32, v32)
    dq_ref, dk_ref, dv_ref = vjp(g32)

    bf = lambda t: t.astype(jnp.bfloat16)
    # 8 sequential accumulation steps (block_q=16): per-step bf16 rounding
    # would push the error far beyond one-final-cast tolerance
    dq, dk, dv = flash_attention_bwd(bf(q32), bf(k32), bf(v32), bf(g32),
                                     block_q=16, interpret=True)
    assert dk.dtype == jnp.bfloat16 and dv.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(dk, np.float32), np.asarray(dk_ref),
                               atol=0.15, rtol=0.05)
    np.testing.assert_allclose(np.asarray(dv, np.float32), np.asarray(dv_ref),
                               atol=0.15, rtol=0.05)


def test_multi_head_attention_interpret_grad_path():
    """interpret=True routes through the SAME custom-VJP wrapper, so jax.grad
    works and exercises the production backward kernel on CPU."""
    from dsml_thesis_tpu.ops.attention import multi_head_attention

    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 2, 64, 32))

    def loss(q):
        return jnp.sum(multi_head_attention(q, q, q, use_pallas=True,
                                            interpret=True) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()

    def loss_ref(q):
        return jnp.sum(attention_reference(q, q, q) ** 2)

    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-4, rtol=1e-3)


def test_group_norm_large_mean_no_nan():
    """E[x^2]-E[x]^2 cancellation: large-mean tiny-spread activations must not
    produce NaN in any GN path (variance clamped like flax GroupNorm)."""
    from dsml_thesis_tpu.ops.groupnorm import group_norm_silu_stats_fused

    rs = np.random.RandomState(0)
    x = (300.0 + 0.01 * rs.randn(2, 8, 8, 64)).astype(np.float32)
    gamma = np.ones(64, np.float32)
    beta = np.zeros(64, np.float32)
    for fn in (
        lambda: group_norm_silu_reference(jnp.asarray(x), gamma, beta, 32),
        lambda: group_norm_silu_pallas(jnp.asarray(x), gamma, beta, 32,
                                       interpret=True),
        lambda: group_norm_silu_stats_fused(jnp.asarray(x), gamma, beta, 32,
                                            interpret=True),
    ):
        out = np.asarray(fn())
        assert np.isfinite(out).all()


def test_group_norm_dispatch_interpret_differentiable(monkeypatch):
    """use_pallas=True + interpret=True runs the whole-row kernel through the
    custom-VJP wrapper (differentiable), not a bare pallas_call."""
    from dsml_thesis_tpu.ops.groupnorm import group_norm_silu

    monkeypatch.delenv("DSML_PALLAS_GN", raising=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 64))
    gamma = jnp.ones(64)
    beta = jnp.zeros(64)

    def loss(x):
        return jnp.sum(group_norm_silu(x, gamma, beta, 32, use_pallas=True,
                                       interpret=True) ** 2)

    g = jax.grad(loss)(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        group_norm_silu_reference(x, gamma, beta, 32) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_flash_dispatch_vmem_guard():
    """No shape can reach the Pallas kernel with a working set beyond the
    VMEM budget: huge Nk falls back to the XLA path; large-but-fitting Nk
    shrinks the q-block instead of failing."""
    from dsml_thesis_tpu.ops.attention import _fit_block_q, multi_head_attention

    # flagship shapes keep their measured-best block
    assert _fit_block_q(4096, 4096, 32, 1024) == 1024
    assert _fit_block_q(1024, 1024, 32, 1024) == 1024
    # long sequences shrink the q-block to fit
    bq = _fit_block_q(16384, 16384, 64, 1024)
    assert bq is not None and bq < 1024
    # Nk whose resident K/V alone exceed VMEM -> fallback to XLA
    assert _fit_block_q(65536, 65536, 64, 1024) is None

    # fallback path produces the reference numerics (force use_pallas via
    # guard: None -> XLA on CPU anyway, so just check numerics agree)
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(1, 2, 300, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(1, 2, 300, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(1, 2, 300, 16).astype(np.float32))
    out = multi_head_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_fit_matches_onchip_calibration():
    """Lock the packed kernels' VMEM-fit decisions at the flagship shapes to
    the on-chip calibration (round 3e): the bwd formula was measured against
    Mosaic's actual stack peaks (61.95M at [bq1024, nk1024, hd320]; 78.84M
    at [bq128, nk4096, hd320]), so these block choices are known to compile
    AND to be approved. A formula regression that re-approves a bigger block
    would reintroduce the scoped-VMEM compile OOM this calibrated."""
    from dsml_thesis_tpu.ops.attention import (
        _fit_block_q_packed,
        _fit_block_q_packed_bwd,
        _packed_bwd_bytes,
    )

    # forward: full q-block at both flagship attention levels
    assert _fit_block_q_packed(1024, 1024, 320, 1024) == 1024
    assert _fit_block_q_packed(4096, 4096, 320, 1024) == 1024
    assert _fit_block_q_packed(256, 256, 640, 1024) == 256
    # backward: 1024-level keeps the full block, 4096-level must shrink
    # (bq=256 predicts over budget; bq=128's predicted 87M covers the
    # measured 78.84M peak)
    assert _fit_block_q_packed_bwd(1024, 1024, 320, 1024) == 1024
    assert _fit_block_q_packed_bwd(4096, 4096, 320, 1024) == 128
    assert _fit_block_q_packed_bwd(256, 256, 640, 1024) == 256
    # the compile-time vmem_limit must clear the measured Mosaic stack peaks
    assert _packed_bwd_bytes(1024, 1024, 320) >= int(61.95 * (1 << 20))
    assert _packed_bwd_bytes(128, 4096, 320) >= int(78.84 * (1 << 20))


def test_vmem_limit_floor_covers_small_shape_stack():
    """On-chip calibration (round 3x): Mosaic demands 10.63M of stack for
    the packed fwd kernel at [*, 256, 640] (the 256px model's 16x16 level,
    20 heads) while _packed_fwd_bytes says 9.25M — compiling with the raw
    formula is an unconditional scoped-VMEM OOM no batch/block choice
    avoids (it broke __graft_entry__.entry() on a cold cache). The
    compile-time limit therefore floors at 32MB; the FIT decisions keep
    using the raw formulas (locked above)."""
    from dsml_thesis_tpu.ops.attention import _packed_fwd_bytes, _vmem_limit

    measured_stack = int(10.63 * (1 << 20))
    assert _packed_fwd_bytes(256, 256, 640) < measured_stack  # why the floor
    assert _vmem_limit(_packed_fwd_bytes(256, 256, 640)) >= measured_stack
    # pass-through above the floor, cap at 110MB
    assert _vmem_limit(50 * (1 << 20)) == 50 * (1 << 20)
    assert _vmem_limit(500 * (1 << 20)) == 110 * (1 << 20)


def test_flash_kernel_variants_match_reference(monkeypatch):
    """defer-div (ones-column denominator) and PV-transposed variants are
    numerically the same softmax attention (interpret mode)."""
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(1, 2, 64, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(1, 2, 64, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(1, 2, 64, 16).astype(np.float32))
    ref = attention_reference(q, k, v)
    for env in ({"DSML_FLASH_DEFER_DIV": "0"},
                {"DSML_FLASH_DEFER_DIV": "1"},
                {"DSML_FLASH_DEFER_DIV": "1", "DSML_FLASH_PV_T": "1"}):
        for kk, vv in env.items():
            monkeypatch.setenv(kk, vv)
        out = flash_attention(q, k, v, block_q=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_flash_norm_bound_variant_matches_reference(monkeypatch):
    """The Cauchy-Schwarz shift bound (no row-max pass) is numerically the
    same softmax attention."""
    monkeypatch.setenv("DSML_FLASH_NORM_BOUND", "1")
    rs = np.random.RandomState(5)
    q = jnp.asarray(rs.randn(1, 2, 64, 16).astype(np.float32)) * 3
    k = jnp.asarray(rs.randn(1, 2, 64, 16).astype(np.float32)) * 3
    v = jnp.asarray(rs.randn(1, 2, 64, 16).astype(np.float32))
    out = flash_attention(q, k, v, block_q=32, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_norm_bound_pathological_scale_no_nan(monkeypatch):
    """When the Cauchy-Schwarz shift overshoots the true row max by more than
    the bf16 exponent range (here ||q||*||k|| ~ 2^40 per axis with q ⟂ k, so
    every exp2 term flushes to zero), the denominator clamp must yield finite
    (~0) outputs rather than 0/0 = NaN rows."""
    monkeypatch.setenv("DSML_FLASH_NORM_BOUND", "1")
    d = 16
    # q in the first half of the feature space, k in the second: all dot
    # products are exactly 0, so the true row max is 0 while the bound is
    # ||q||*||k|| — maximal slack
    q = np.zeros((1, 1, 32, d), np.float32)
    k = np.zeros((1, 1, 32, d), np.float32)
    q[..., : d // 2] = 2.0**40
    k[..., d // 2 :] = 2.0**40
    v = np.ones((1, 1, 32, d), np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          block_q=32, interpret=True)
    assert bool(jnp.isfinite(out).all()), "norm_bound row flush produced NaN"


def test_cross_attention_bhnd_variant_matches(monkeypatch):
    """DSML_ATTN_BHND=1 (head axis produced inside the projection einsums,
    no explicit head-split transposes) uses the IDENTICAL param tree and
    numerics as the Dense+transpose path."""
    import jax
    from dsml_thesis_tpu.models.unet import CrossAttention

    attn = CrossAttention(heads=4, dim_head=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 24).astype(np.float32))
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 24).astype(np.float32))

    monkeypatch.delenv("DSML_ATTN_BHND", raising=False)
    params = attn.init(jax.random.PRNGKey(0), x, ctx)["params"]
    base_self = attn.apply({"params": params}, x)
    base_cross = attn.apply({"params": params}, x, ctx)

    monkeypatch.setenv("DSML_ATTN_BHND", "1")
    params_b = attn.init(jax.random.PRNGKey(0), x, ctx)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_b)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params_b),
    ):
        assert p1 == p2 and a.shape == b.shape
    out_self = attn.apply({"params": params}, x)  # SAME params, bhnd math
    out_cross = attn.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(out_self), np.asarray(base_self),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_cross), np.asarray(base_cross),
                               rtol=1e-5, atol=1e-5)


def test_packed_flash_attention_matches_reference():
    """The packed-layout kernel ([B, N, H*D] in/out, heads sequential with
    static lane slices) matches the split-head reference, including through
    the packed custom VJP (bwd reuses the BHND flash backward)."""
    from dsml_thesis_tpu.ops.attention import (
        flash_attention_packed,
        packed_multi_head_attention,
    )

    rs = np.random.RandomState(0)
    heads, d = 5, 32  # odd head count: the flagship 64x64 level (160 packed)
    q = jnp.asarray(rs.randn(2, 300, heads * d).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 300, heads * d).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 300, heads * d).astype(np.float32))

    def ref(q, k, v):
        split = lambda t: t.reshape(2, 300, heads, d).transpose(0, 2, 1, 3)
        o = attention_reference(split(q), split(k), split(v))
        return o.transpose(0, 2, 1, 3).reshape(2, 300, heads * d)

    out = flash_attention_packed(q, k, v, heads, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v)),
                               atol=2e-5, rtol=2e-5)

    # gradient parity through the dispatch entry (packed custom VJP)
    def loss_packed(q, k, v):
        o = packed_multi_head_attention(q, k, v, heads, use_pallas=True,
                                        interpret=True)
        return jnp.sum(o ** 2)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(ref(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for g, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


def test_packed_dispatch_fallbacks():
    """packed_multi_head_attention must fall back to the split-head path for
    tiny KV (cross-attention) and under a multi-device mesh, staying correct."""
    from dsml_thesis_tpu.ops.attention import (
        attention_mesh,
        packed_multi_head_attention,
    )
    from dsml_thesis_tpu.parallel import make_mesh

    rs = np.random.RandomState(1)
    heads, d = 4, 8
    q = jnp.asarray(rs.randn(2, 64, heads * d).astype(np.float32))
    kv = jnp.asarray(rs.randn(2, 5, heads * d).astype(np.float32))  # tiny KV

    def ref(q, k, v):
        def split(t):
            b, n = t.shape[0], t.shape[1]
            return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
        o = attention_reference(split(q), split(k), split(v))
        b, n = q.shape[0], q.shape[1]
        return o.transpose(0, 2, 1, 3).reshape(b, n, heads * d)

    out = packed_multi_head_attention(q, kv, kv, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, kv, kv)),
                               atol=2e-5, rtol=2e-5)

    mesh = make_mesh(n_data=2, n_model=4)
    with attention_mesh(mesh):
        # mesh set, tiny KV: still the split-head jnp path
        out_m = packed_multi_head_attention(q, kv, kv, heads)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref(q, kv, kv)),
                               atol=2e-5, rtol=2e-5)

    # when the packed kernel runs under a mesh it shard_maps ITSELF: batch
    # over data, the packed head axis over model (2x4 divides b=2? no —
    # b % 2 == 0 and heads % 4 == 0, so both axes shard) — not a bare
    # pallas_call that GSPMD would all-gather around
    qb = jnp.asarray(rs.randn(2, 256, heads * d).astype(np.float32))
    kb = jnp.asarray(rs.randn(2, 256, heads * d).astype(np.float32))
    vb = jnp.asarray(rs.randn(2, 256, heads * d).astype(np.float32))
    with attention_mesh(mesh):
        out_big = packed_multi_head_attention(qb, kb, vb, heads,
                                              use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_big), np.asarray(ref(qb, kb, vb)),
                               atol=2e-5, rtol=2e-5)

    # mesh nothing divides over (data=8 with b=2, model=1): falls back to
    # the split-head dispatch, which itself falls back to the XLA path
    mesh_nd = make_mesh(n_data=8, n_model=1)
    with attention_mesh(mesh_nd):
        out_nd = packed_multi_head_attention(qb, kb, vb, heads,
                                             use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_nd), np.asarray(ref(qb, kb, vb)),
                               atol=2e-5, rtol=2e-5)


def test_packed_flash_bwd_kernel_matches_reference(monkeypatch):
    """The packed-layout BACKWARD kernel ([B, N, H*D] dq/dk/dv, heads
    sequential, full-width fp32 dk/dv accumulation) matches jax.grad of the
    split-head reference — directly, through the packed custom VJP, and
    through the shard_map mesh path (data- and head-sharded)."""
    from dsml_thesis_tpu.ops.attention import (
        attention_mesh,
        flash_attention_bwd_packed,
        packed_multi_head_attention,
    )
    from dsml_thesis_tpu.parallel import make_mesh

    rs = np.random.RandomState(2)
    heads, d, b, n = 5, 32, 2, 300  # odd head count, ragged N (pad path)
    q = jnp.asarray(rs.randn(b, n, heads * d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, n, heads * d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, n, heads * d).astype(np.float32))

    def ref(q, k, v):
        split = lambda t: t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
        o = attention_reference(split(q), split(k), split(v))
        return o.transpose(0, 2, 1, 3).reshape(b, n, heads * d)

    gr = jax.grad(lambda q, k, v: jnp.sum(ref(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)

    # direct kernel call: do = d(sum o^2)/do = 2*o
    out = ref(q, k, v)
    grads = flash_attention_bwd_packed(q, k, v, 2 * out, heads,
                                       block_q=128, interpret=True)
    for g, r in zip(grads, gr):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)

    def loss_packed(q, k, v):
        o = packed_multi_head_attention(q, k, v, heads, use_pallas=True,
                                        interpret=True)
        return jnp.sum(o ** 2)

    # through the custom VJP with the packed bwd kernel forced OFF: the
    # split-head fallback must stay correct
    monkeypatch.setenv("DSML_FLASH_PACKED_BWD", "0")
    gp_off = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.delenv("DSML_FLASH_PACKED_BWD")
    gp_on = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    for g_on, g_off, r in zip(gp_on, gp_off, gr):
        np.testing.assert_allclose(np.asarray(g_on), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(g_off), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)

    # mesh path: n=256 (divides block), data-sharded batch and (second
    # mesh) model-sharded heads — forward AND grad through shard_map
    nb = 256
    qb = jnp.asarray(rs.randn(2, nb, heads * d).astype(np.float32))
    kb = jnp.asarray(rs.randn(2, nb, heads * d).astype(np.float32))
    vb = jnp.asarray(rs.randn(2, nb, heads * d).astype(np.float32))

    def refb(q, k, v):
        split = lambda t: t.reshape(2, nb, heads, d).transpose(0, 2, 1, 3)
        o = attention_reference(split(q), split(k), split(v))
        return o.transpose(0, 2, 1, 3).reshape(2, nb, heads * d)

    grb = jax.grad(lambda q, k, v: jnp.sum(refb(q, k, v) ** 2),
                   argnums=(0, 1, 2))(qb, kb, vb)
    for nd, nm in [(2, 1), (1, 5)]:  # data-only; model divides heads=5
        mesh = make_mesh(n_data=nd, n_model=nm)
        with attention_mesh(mesh):
            out_m = packed_multi_head_attention(qb, kb, vb, heads,
                                                use_pallas=True,
                                                interpret=True)
            gm = jax.grad(loss_packed, argnums=(0, 1, 2))(qb, kb, vb)
        np.testing.assert_allclose(np.asarray(out_m),
                                   np.asarray(refb(qb, kb, vb)),
                                   atol=2e-5, rtol=2e-5)
        for g, r in zip(gm, grb):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=2e-4, rtol=2e-4)


def test_flash_bwd_defer_div_kill_switch(monkeypatch):
    """DSML_FLASH_BWD_DEFER=0 (the documented kill switch) must keep BOTH
    backward kernels — split-head and packed — on the non-deferred
    normalization path and stay grad-exact vs jax.grad of the reference."""
    from dsml_thesis_tpu.ops.attention import (
        flash_attention_bwd,
        flash_attention_bwd_packed,
    )

    monkeypatch.setenv("DSML_FLASH_BWD_DEFER", "0")
    rs = np.random.RandomState(3)
    heads, d, b, n = 3, 16, 2, 128
    qp = jnp.asarray(rs.randn(b, n, heads * d).astype(np.float32))
    kp = jnp.asarray(rs.randn(b, n, heads * d).astype(np.float32))
    vp = jnp.asarray(rs.randn(b, n, heads * d).astype(np.float32))
    split = lambda t: t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    def ref_packed(q, k, v):
        o = attention_reference(split(q), split(k), split(v))
        return o.transpose(0, 2, 1, 3).reshape(b, n, heads * d)

    out = ref_packed(qp, kp, vp)
    gr = jax.grad(lambda q, k, v: jnp.sum(ref_packed(q, k, v) ** 2),
                  argnums=(0, 1, 2))(qp, kp, vp)

    grads_p = flash_attention_bwd_packed(qp, kp, vp, 2 * out, heads,
                                         block_q=64, interpret=True)
    for g, r in zip(grads_p, gr):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)

    grads_s = flash_attention_bwd(split(qp), split(kp), split(vp),
                                  split(2 * out), block_q=64, interpret=True)
    merge = lambda t: t.transpose(0, 2, 1, 3).reshape(b, n, heads * d)
    for g, r in zip(map(merge, grads_s), gr):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


def test_tiny_train_step_with_packed_flash(monkeypatch):
    """A real optimizer step through the full LDM train path with
    DSML_ATTN_PACKED=1 and the kernels forced through Pallas interpret mode
    (DSML_FLASH_INTERPRET=1): the packed forward AND the packed backward
    kernel run inside remat + optax exactly as on chip, and the loss
    matches the XLA-attention step closely."""
    import os
    import sys

    import yaml

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_ldm import TINY_MEAD_CFG

    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    def one_step():
        cfg = yaml.safe_load(TINY_MEAD_CFG)
        ldm = build_model(cfg["model"])
        batch = {
            "image": jnp.ones((2, 16, 16, 3)) * 0.1,
            "masked_image": jnp.zeros((2, 16, 16, 3)),
            "identity": jnp.zeros((2, 16, 16, 3)),
            "class_label": jnp.zeros((2,), jnp.int32),
            "audio": jnp.zeros((2, 5, 32)),
        }
        params = ldm.init_params(jax.random.PRNGKey(0), batch)
        tx = make_optimizer(ldm, params, base_lr=1e-3)
        state = create_train_state(ldm, params, tx)
        step = make_train_step(ldm, tx)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return float(metrics["train/loss"])

    # packed defaults ON now — pin the base side to the split-head path
    monkeypatch.setenv("DSML_ATTN_PACKED", "0")
    monkeypatch.delenv("DSML_FLASH_INTERPRET", raising=False)
    base_loss = one_step()
    monkeypatch.setenv("DSML_ATTN_PACKED", "1")
    monkeypatch.setenv("DSML_FLASH_INTERPRET", "1")
    packed_loss = one_step()
    assert np.isfinite(packed_loss)
    np.testing.assert_allclose(packed_loss, base_loss, rtol=1e-3)


def test_cross_attention_fused_qkv_matches(monkeypatch):
    """DSML_ATTN_FUSED_QKV=1 concatenates the to_q/to_k/to_v kernels into one
    projection matmul at trace time (k/v only for cross-attention) — param
    tree and numerics identical to the base path."""
    from dsml_thesis_tpu.models.unet import CrossAttention

    attn = CrossAttention(heads=4, dim_head=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 24).astype(np.float32))
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 24).astype(np.float32))

    monkeypatch.delenv("DSML_ATTN_FUSED_QKV", raising=False)
    params = attn.init(jax.random.PRNGKey(0), x, ctx)["params"]
    base_self = attn.apply({"params": params}, x)
    base_cross = attn.apply({"params": params}, x, ctx)

    monkeypatch.setenv("DSML_ATTN_FUSED_QKV", "1")
    params_f = attn.init(jax.random.PRNGKey(0), x, ctx)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))
    for (_, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params_f),
    ):
        assert a.shape == b.shape
    out_self = attn.apply({"params": params}, x)
    out_cross = attn.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(out_self), np.asarray(base_self),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_cross), np.asarray(base_cross),
                               rtol=1e-5, atol=1e-5)

    # both levers on: fused wins the conflict (the fused branch pins
    # split-head dispatch — packed+fused measured −18% on chip) and the
    # numerics stay identical either way
    monkeypatch.setenv("DSML_ATTN_PACKED", "1")
    out_self_p = attn.apply({"params": params}, x)
    out_cross_p = attn.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(out_self_p), np.asarray(base_self),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_cross_p), np.asarray(base_cross),
                               rtol=1e-5, atol=1e-5)


def test_cross_attention_packed_variant_matches(monkeypatch):
    """DSML_ATTN_PACKED=1 uses the identical param tree and numerics as the
    split-head CrossAttention path (on CPU both route to the jnp reference;
    the env flag only changes the layout plumbing)."""
    from dsml_thesis_tpu.models.unet import CrossAttention

    attn = CrossAttention(heads=4, dim_head=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 24).astype(np.float32))
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 24).astype(np.float32))

    monkeypatch.setenv("DSML_ATTN_PACKED", "0")  # pin base: default is ON
    params = attn.init(jax.random.PRNGKey(0), x, ctx)["params"]
    base_self = attn.apply({"params": params}, x)
    base_cross = attn.apply({"params": params}, x, ctx)

    monkeypatch.setenv("DSML_ATTN_PACKED", "1")
    params_p = attn.init(jax.random.PRNGKey(0), x, ctx)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_p))
    out_self = attn.apply({"params": params}, x)
    out_cross = attn.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(out_self), np.asarray(base_self),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_cross), np.asarray(base_cross),
                               rtol=1e-5, atol=1e-5)


def test_cross_attention_single_token_shortcut(monkeypatch):
    """DSML_XATTN_1TOK (default on): one-token cross-attention is exactly a
    broadcast of to_out(to_v(context)) — softmax over a single key is
    identically 1, so the Q/K towers are dead and their gradients are zero.
    The shortcut must match the stock path bitwise-closely in fp32, keep the
    param tree identical (to_q/to_k kernels still exist for checkpoints),
    and reproduce the stock gradients, including the exactly-zero dQ/dK."""
    from dsml_thesis_tpu.models.unet import CrossAttention

    attn = CrossAttention(heads=4, dim_head=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 24).astype(np.float32))
    ctx1 = jnp.asarray(np.random.RandomState(1).randn(2, 1, 24).astype(np.float32))

    monkeypatch.setenv("DSML_XATTN_1TOK", "0")
    params = attn.init(jax.random.PRNGKey(0), x, ctx1)["params"]
    base = attn.apply({"params": params}, x, ctx1)

    monkeypatch.setenv("DSML_XATTN_1TOK", "1")
    params_s = attn.init(jax.random.PRNGKey(0), x, ctx1)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_s))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = attn.apply({"params": params}, x, ctx1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-6, atol=1e-6)

    # gradients: identical for the live towers, exactly zero for to_q/to_k
    def loss(p, env):
        monkeypatch.setenv("DSML_XATTN_1TOK", env)
        return jnp.sum(attn.apply({"params": p}, x, ctx1) ** 2)

    g_base = jax.grad(lambda p: loss(p, "0"))(params)
    g_fast = jax.grad(lambda p: loss(p, "1"))(params)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_base),
        jax.tree_util.tree_leaves_with_path(g_fast),
    ):
        name = jax.tree_util.keystr(pa)
        # to_out/to_v grads accumulate over N in a different order on the
        # two paths (sum-then-dot vs dot-then-sum) — rounding-level only
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=name)
        if "to_q" in name or "to_k" in name:
            np.testing.assert_array_equal(np.asarray(a), np.zeros_like(a),
                                          err_msg=f"{name} stock grad != 0")

    # multi-token contexts must NOT take the shortcut (different math)
    ctx5 = jnp.asarray(np.random.RandomState(2).randn(2, 5, 24).astype(np.float32))
    params5 = attn.init(jax.random.PRNGKey(0), x, ctx5)["params"]
    monkeypatch.setenv("DSML_XATTN_1TOK", "0")
    base5 = attn.apply({"params": params5}, x, ctx5)
    monkeypatch.setenv("DSML_XATTN_1TOK", "1")
    out5 = attn.apply({"params": params5}, x, ctx5)
    np.testing.assert_allclose(np.asarray(out5), np.asarray(base5),
                               rtol=1e-6, atol=1e-6)
    # self-attention ignores the flag entirely (context is None)
    np.testing.assert_allclose(
        np.asarray(attn.apply({"params": params5}, x)),
        np.asarray(attn.apply({"params": params5}, x)), rtol=0, atol=0)


@pytest.mark.parametrize("nq,nk", [(128, 128), (128, 300), (96, 257)])
def test_streaming_attention_matches_reference(nq, nk):
    """Online-softmax streaming kernel == jnp softmax attention, including
    ragged Nk (padded k-blocks masked with finite sentinels, not -inf)."""
    from dsml_thesis_tpu.ops import flash_attention_streaming

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 3, nq, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 3, nk, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 3, nk, 16).astype(np.float32))
    out = flash_attention_streaming(q, k, v, block_q=32, block_k=64,
                                    interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_streaming_attention_bf16_and_single_kblock():
    """bf16 inputs; also the degenerate one-k-block grid (nk <= block_k)."""
    from dsml_thesis_tpu.ops import flash_attention_streaming

    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(1, 2, 64, 32).astype(np.float32) * 0.5,
                    dtype=jnp.bfloat16)
    k = jnp.asarray(rs.randn(1, 2, 48, 32).astype(np.float32) * 0.5,
                    dtype=jnp.bfloat16)
    v = jnp.asarray(rs.randn(1, 2, 48, 32).astype(np.float32) * 0.5,
                    dtype=jnp.bfloat16)
    out = flash_attention_streaming(q, k, v, block_q=32, block_k=128,
                                    interpret=True)
    ref = attention_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_streaming_attention_extreme_scores_no_nan():
    """Huge score magnitudes: the running-max rescale keeps exp2 in range,
    a fully-masked padded block can't NaN, denominators never hit 0/0."""
    from dsml_thesis_tpu.ops import flash_attention_streaming

    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(1, 1, 32, 8).astype(np.float32) * 300.0)
    k = jnp.asarray(rs.randn(1, 1, 65, 8).astype(np.float32) * 300.0)
    v = jnp.asarray(rs.randn(1, 1, 65, 8).astype(np.float32))
    out = flash_attention_streaming(q, k, v, block_q=32, block_k=64,
                                    interpret=True)
    ref = attention_reference(q, k, v)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_streaming_dispatch_and_grad(monkeypatch):
    """DSML_FLASH_STREAMING=1 + the interpret hook route multi_head_attention
    through the streaming custom-VJP wrapper; jax.grad runs the STREAMED
    backward kernels (lse recompute + dq + dk/dv) and matches the reference
    gradients."""
    from dsml_thesis_tpu.ops.attention import (
        _fit_block_q, _fit_blocks_streaming, _fit_blocks_streaming_bwd,
        multi_head_attention)

    from dsml_thesis_tpu.ops import attention as attn_mod

    # fit sanity: streaming always finds blocks where the resident kernel
    # cannot (65536 kv rows at d=64), and respects the requested caps
    assert _fit_blocks_streaming(65536, 65536, 64, 1024, 1024) is not None
    assert _fit_blocks_streaming_bwd(65536, 65536, 64, 1024, 1024) is not None
    bq, bk = _fit_blocks_streaming(4096, 4096, 32, 512, 512)
    assert bq <= 512 and bk <= 512
    # a sub-128 block_k request clamps UP to the floor instead of silently
    # disabling streaming (the O(Nk^2) XLA fallback it exists to avoid)
    assert _fit_blocks_streaming(4096, 65536, 32, 512, 64) is not None
    # ... and so does a sub-8 block_q request, in every fit
    assert _fit_blocks_streaming(4096, 65536, 32, 4, 1024) is not None
    assert _fit_block_q(1024, 1024, 32, 4) == 8
    # forced streaming at nk < 128 must still evaluate bk = nk, not
    # vacuously fall back to XLA
    assert _fit_blocks_streaming(64, 64, 32, 1024, 1024) == (64, 64)

    monkeypatch.setenv("DSML_FLASH_INTERPRET", "1")
    monkeypatch.setenv("DSML_FLASH_STREAMING", "1")
    monkeypatch.setenv("DSML_FLASH_BLOCK_Q", "128")
    monkeypatch.setenv("DSML_FLASH_BLOCK_K", "128")
    # nk=320 is not a block_k multiple: the padded tail keys must be masked
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(1, 2, 256, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(1, 2, 320, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(1, 2, 320, 16).astype(np.float32))

    # spy: the streaming custom-VJP wrapper must actually be dispatched —
    # with too-small shapes the fit returns None and the test would
    # vacuously compare the XLA reference against itself
    calls = []
    real_stream = attn_mod._streaming_attention_diff

    def spy(*a, **kw):
        calls.append(1)
        return real_stream(*a, **kw)

    monkeypatch.setattr(attn_mod, "_streaming_attention_diff", spy)
    out = multi_head_attention(q, k, v)
    assert calls, "streaming wrapper was not dispatched (vacuous test)"
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
    gq, gk, gv = jax.grad(loss(multi_head_attention), argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q, k, v)
    for a, b in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_attention_block_packed_needs_own_optin(monkeypatch):
    """The legacy AttentionBlock (no-transformer UNets) must NOT flip onto
    the packed kernel under DSML_ATTN_PACKED=1 — '1' is that flag's
    documented default, and this block's q/k/v are jnp.split views of one
    fused qkv projection (the layout that measured −18% at the
    CrossAttention site, PROFILE.md round-3e). Packed dispatch here takes
    its own opt-in, DSML_ATTN_PACKED_QKVBLOCK=1, with identical numerics."""
    from dsml_thesis_tpu.models import unet as unet_mod

    block = unet_mod.AttentionBlock(num_heads=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 64).astype(np.float32))
    for var in ("DSML_ATTN_PACKED", "DSML_ATTN_PACKED_QKVBLOCK"):
        monkeypatch.delenv(var, raising=False)
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    base = block.apply({"params": params}, x)

    calls = []
    real_packed = unet_mod.packed_multi_head_attention

    def spy(*args, **kwargs):
        calls.append(1)
        return real_packed(*args, **kwargs)

    monkeypatch.setattr(unet_mod, "packed_multi_head_attention", spy)

    # exporting the documented default must be a no-op for this block
    monkeypatch.setenv("DSML_ATTN_PACKED", "1")
    out = block.apply({"params": params}, x)
    assert not calls, "DSML_ATTN_PACKED=1 must not switch AttentionBlock"
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-6, atol=1e-6)

    # the dedicated opt-in flips it, numerics unchanged
    monkeypatch.setenv("DSML_ATTN_PACKED_QKVBLOCK", "1")
    out_p = block.apply({"params": params}, x)
    assert calls, "DSML_ATTN_PACKED_QKVBLOCK=1 must route to the packed kernel"
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_packed_staged_head_pipeline_bitwise_equal(monkeypatch):
    """DSML_FLASH_STAGED: the software-pipelined head loop (head h's QK
    emitted before head h-1's exp/PV for MXU/VPU overlap) performs the exact
    same per-element operations as the unstaged loop, only reordered across
    INDEPENDENT heads — outputs must be bitwise equal, under every
    reformulation combination the staged path composes with."""
    from dsml_thesis_tpu.ops.attention import flash_attention_packed

    rs = np.random.RandomState(3)
    heads, d = 5, 32
    q = jnp.asarray(rs.randn(2, 272, heads * d).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 272, heads * d).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 272, heads * d).astype(np.float32))

    for extra in ({}, {"DSML_FLASH_PV_T": "1"},
                  {"DSML_FLASH_NORM_BOUND": "1", "DSML_FLASH_PV_T": "1"}):
        for kk, vv in extra.items():
            monkeypatch.setenv(kk, vv)
        monkeypatch.setenv("DSML_FLASH_STAGED", "0")
        base = flash_attention_packed(q, k, v, heads, block_q=128,
                                      interpret=True)
        monkeypatch.setenv("DSML_FLASH_STAGED", "1")
        staged = flash_attention_packed(q, k, v, heads, block_q=128,
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(staged), np.asarray(base))
        for kk in extra:
            monkeypatch.delenv(kk)
    monkeypatch.delenv("DSML_FLASH_STAGED")


def test_streaming_bwd_ragged_both_axes_and_bf16():
    """flash_attention_streaming_bwd directly: ragged nq AND nk (both pad
    paths live), multi-block on both grid axes, fp32 exactness + bf16
    finiteness with fp32 dk/dv accumulation."""
    from dsml_thesis_tpu.ops.attention import (
        _streaming_attention_diff, attention_reference)

    rs = np.random.RandomState(11)
    q = jnp.asarray(rs.randn(1, 2, 190, 32).astype(np.float32))
    k = jnp.asarray(rs.randn(1, 2, 300, 32).astype(np.float32))
    v = jnp.asarray(rs.randn(1, 2, 300, 32).astype(np.float32))

    loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
    stream = lambda qq, kk, vv: _streaming_attention_diff(
        qq, kk, vv, 1.0 / np.sqrt(32), 64, 128, True)
    gq, gk, gv = jax.grad(loss(stream), argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(
        q, k, v)
    for a, b in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    gq16, gk16, gv16 = jax.grad(loss(stream), argnums=(0, 1, 2))(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16))
    for g, r in ((gq16, rq), (gk16, rk), (gv16, rv)):
        g = np.asarray(g, np.float32)
        assert np.isfinite(g).all()
        # bf16 inputs: agreement at bf16 resolution, not fp32
        np.testing.assert_allclose(g, np.asarray(r), rtol=0.1, atol=0.15)


def test_env_flag_strict_parsing(monkeypatch):
    """Boolean flags accept 1/true/on/yes and 0/false/off/no in either
    direction; unrecognized values raise instead of silently selecting an
    arm (the historical '== 1 vs != 0' hazard). Mode flags reject typos."""
    from dsml_thesis_tpu.flags import env_flag, env_mode

    monkeypatch.delenv("DSML_T", raising=False)
    assert env_flag("DSML_T", True) and not env_flag("DSML_T", False)
    for val, want in (("true", True), ("ON", True), ("yes", True),
                      ("1", True), ("false", False), ("off", False),
                      ("0", False), ("No", False)):
        monkeypatch.setenv("DSML_T", val)
        assert env_flag("DSML_T", not want) is want, val
    monkeypatch.setenv("DSML_T", "maybe")
    with pytest.raises(ValueError, match="expected a boolean"):
        env_flag("DSML_T", True)

    monkeypatch.setenv("DSML_M", "res_interpret")  # typo'd mode
    with pytest.raises(ValueError, match="expected one of"):
        env_mode("DSML_M", "0", ("0", "1", "res", "res-interpret"))
    monkeypatch.setenv("DSML_M", "true")  # boolean spelling -> the "1" mode
    assert env_mode("DSML_M", "0", ("0", "1", "auto")) == "1"

    # the real consumers: a truthy spelling must not flip a default-on
    # lever off, and a typo must raise rather than silently A/B the
    # wrong arm
    from dsml_thesis_tpu.models.unet import _gn_epilogue_mode
    from dsml_thesis_tpu.ops.attention import _flash_flags

    monkeypatch.setenv("DSML_FLASH_DEFER_DIV", "true")
    assert _flash_flags(4096)[0] is True
    monkeypatch.setenv("DSML_FLASH_DEFER_DIV", "false")
    assert _flash_flags(4096)[0] is False
    monkeypatch.delenv("DSML_FLASH_DEFER_DIV", raising=False)
    monkeypatch.setenv("DSML_GN_EPILOGUE", "res_interpret")
    with pytest.raises(ValueError, match="DSML_GN_EPILOGUE"):
        _gn_epilogue_mode()


def test_fused_proj_self_attention_matches_composed():
    """The projection-fused kernel (h -> qkv-proj + heads + to_out in one
    VMEM program) matches the composed formula, in fwd AND through its
    recompute custom VJP."""
    from dsml_thesis_tpu.ops.attention import (
        _fproj_reference,
        flash_attention_fproj,
        fused_proj_self_attention,
    )

    rs = np.random.RandomState(0)
    heads, d, c, n, b = 2, 32, 64, 512, 2
    hd = heads * d
    h = jnp.asarray(rs.randn(b, n, c).astype(np.float32)) * 0.3
    wq = jnp.asarray(rs.randn(c, hd).astype(np.float32)) * 0.1
    wk = jnp.asarray(rs.randn(c, hd).astype(np.float32)) * 0.1
    wv = jnp.asarray(rs.randn(c, hd).astype(np.float32)) * 0.1
    wo = jnp.asarray(rs.randn(hd, c).astype(np.float32)) * 0.1
    bo = jnp.asarray(rs.randn(c).astype(np.float32)) * 0.1

    ref = _fproj_reference(h, wq, wk, wv, wo, bo, heads=heads,
                           scale=d ** -0.5)
    out = flash_attention_fproj(h, wq, wk, wv, wo, bo, heads,
                                block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # dispatch entry: grads come from the recompute VJP over the composed
    # formula and must match jax.grad of that formula directly
    def loss_fused(*a):
        return jnp.sum(fused_proj_self_attention(
            *a, heads, use_pallas=True, interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_fproj_reference(*a, heads=heads, scale=d ** -0.5) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(h, wq, wk, wv, wo, bo)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(h, wq, wk, wv, wo, bo)
    for g, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


def test_fused_proj_flag_matches_stock_crossattention(monkeypatch):
    """DSML_ATTN_FUSED_PROJ=1 reproduces the stock CrossAttention self-attn
    output with an unchanged param tree."""
    from dsml_thesis_tpu.models.unet import CrossAttention

    rs = np.random.RandomState(1)
    # batch >= 8: the module routes to the fused kernel only above the
    # program-count gate (bs1 on-chip regression, PROFILE.md round 4)
    x = jnp.asarray(rs.randn(8, 512, 64).astype(np.float32)) * 0.5
    m = CrossAttention(heads=2, dim_head=32)
    params = m.init(jax.random.PRNGKey(0), x)

    # the flag is default-ON: the stock baseline must force it OFF or it
    # would silently compare the fused branch against itself
    monkeypatch.setenv("DSML_ATTN_FUSED_PROJ", "0")
    stock = m.apply(params, x)
    monkeypatch.setenv("DSML_ATTN_FUSED_PROJ", "1")
    monkeypatch.setenv("DSML_FLASH_INTERPRET", "1")
    fused = m.apply(params, x)
    monkeypatch.delenv("DSML_FLASH_INTERPRET")
    fused_fallback = m.apply(params, x)  # composed-op fallback path

    # identical param tree is implied by apply() accepting the same params
    np.testing.assert_allclose(np.asarray(fused), np.asarray(stock),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(fused_fallback), np.asarray(stock),
                               atol=2e-5, rtol=2e-5)


def test_fused_qout_matches_composed_and_module(monkeypatch):
    """The partial (q/out-fused, precomputed K/V) kernel matches the
    composed formula and, via DSML_ATTN_FPROJ_PARTIAL, the stock
    CrossAttention self-attention output."""
    from dsml_thesis_tpu.models.unet import CrossAttention
    from dsml_thesis_tpu.ops.attention import (
        _qout_reference,
        flash_attention_qout,
        fused_qout_self_attention,
    )

    rs = np.random.RandomState(2)
    heads, d, c, n, b = 2, 32, 64, 512, 2
    hd = heads * d
    h = jnp.asarray(rs.randn(b, n, c).astype(np.float32)) * 0.3
    k = jnp.asarray(rs.randn(b, n, hd).astype(np.float32)) * 0.3
    v = jnp.asarray(rs.randn(b, n, hd).astype(np.float32)) * 0.3
    wq = jnp.asarray(rs.randn(c, hd).astype(np.float32)) * 0.1
    wo = jnp.asarray(rs.randn(hd, c).astype(np.float32)) * 0.1
    bo = jnp.asarray(rs.randn(c).astype(np.float32)) * 0.1

    ref = _qout_reference(h, k, v, wq, wo, bo, heads=heads, scale=d ** -0.5)
    out = flash_attention_qout(h, k, v, wq, wo, bo, heads, block_q=128,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # grads through the recompute VJP
    def loss_fused(*a):
        return jnp.sum(fused_qout_self_attention(
            *a, heads, use_pallas=True, interpret=True) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(h, k, v, wq, wo, bo)
    gr = jax.grad(lambda *a: jnp.sum(_qout_reference(
        *a, heads=heads, scale=d ** -0.5) ** 2),
        argnums=(0, 1, 2, 3))(h, k, v, wq, wo, bo)
    for g, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)

    # module flag parity (disable the full fusion so the partial branch runs)
    x = jnp.asarray(rs.randn(8, 512, 64).astype(np.float32)) * 0.5
    m = CrossAttention(heads=2, dim_head=32)
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("DSML_ATTN_FUSED_PROJ", "0")
    stock = m.apply(params, x)
    monkeypatch.setenv("DSML_ATTN_FPROJ_PARTIAL", "1")
    monkeypatch.setenv("DSML_FLASH_INTERPRET", "1")
    fused = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(stock),
                               atol=2e-5, rtol=2e-5)
