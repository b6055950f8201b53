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
