"""Shape/grad/jit tests for the Flax models (tiny configs for CPU speed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsml_thesis_tpu.models import (
    UNetModel,
    VQModel,
    AutoencoderKL,
    VectorQuantizer,
    ClassEmbedder,
    Conv1DTemporalAttention,
)

TINY_UNET = dict(
    in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
    use_spatial_transformer=True, transformer_depth=1, context_dim=24,
)


@pytest.fixture(scope="module")
def tiny_unet():
    m = UNetModel(**TINY_UNET)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 10])
    ctx = jnp.zeros((2, 3, 24))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, ctx)
    return m, params


def test_unet_output_shape_and_zero_init(tiny_unet):
    m, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    out = jax.jit(m.apply)(params, x, jnp.array([5, 500]), jnp.zeros((2, 3, 24)))
    assert out.shape == (2, 16, 16, 3)
    # conv_out is zero-init → output exactly zero at init (like the reference's
    # zero_module'd final conv)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_unet_9ch_input():
    """MEAD config: 9-channel input (noisy + masked-motion + identity latents)."""
    m = UNetModel(**{**TINY_UNET, "in_channels": 9})
    x = jnp.zeros((1, 16, 16, 9))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.array([0]), jnp.zeros((1, 2, 24)))
    out = m.apply(params, x, jnp.array([3]), jnp.zeros((1, 2, 24)))
    assert out.shape == (1, 16, 16, 3)


def test_unet_grad_flows(tiny_unet):
    m, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))

    def loss(p):
        out = m.apply(p, x, jnp.array([100]), jnp.ones((1, 3, 24)))
        return jnp.sum(out)

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    # at init the final conv is zero-init (reference zero_module semantics), so
    # only conv_out sees gradient from a linear loss; it must be nonzero
    gout = g["params"]["conv_out"]["kernel"]
    assert float(jnp.abs(gout).max()) > 0


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(n_e=16, e_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 3, 4))
    params = vq.init(jax.random.PRNGKey(1), z)
    z_q, loss, idx = vq.apply(params, z)
    assert z_q.shape == z.shape and idx.shape == (2, 3, 3)
    assert float(loss) >= 0
    # straight-through: d z_q / d z == identity
    g = jax.grad(lambda z: jnp.sum(vq.apply(params, z)[0] * 2.0))(z)
    np.testing.assert_allclose(np.asarray(g), 2.0)
    # codebook lookup consistency
    entries = vq.apply(params, idx, shape=z.shape, method="get_codebook_entry")
    zf = np.asarray(z_q)
    np.testing.assert_allclose(np.asarray(entries), zf, atol=1e-6)


DD = dict(double_z=False, z_channels=3, resolution=16, in_channels=3, out_ch=3,
          ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,), dropout=0.0)


def test_vqmodel_encode_decode_shapes():
    m = VQModel(ddconfig=DD, n_embed=32, embed_dim=3)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    z = m.apply(params, x, method="encode")
    assert z.shape == (1, 8, 8, 3)  # f2 downsample for ch_mult len 2
    rec = m.apply(params, z, method="decode")
    assert rec.shape == (1, 16, 16, 3)
    rec2, vq_loss, idx = m.apply(params, x)
    assert rec2.shape == x.shape and idx.shape == (1, 8, 8)


def test_autoencoder_kl():
    dd = {**DD, "double_z": True}
    m = AutoencoderKL(ddconfig=dd, embed_dim=3)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, key=jax.random.PRNGKey(1))
    post = m.apply(params, x, method="encode")
    assert post.mean.shape == (1, 8, 8, 3)
    kl = post.kl()
    assert kl.shape == (1,)
    rec = m.apply(params, post.mode(), method="decode")
    assert rec.shape == x.shape


def test_class_embedder_cfg_drop():
    ce = ClassEmbedder(embed_dim=8, n_classes=4, p_uncond=1.0, null_mode="extra_row")
    labels = jnp.array([0, 1, 2])
    params = ce.init({"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
                     labels, training=True)
    # p_uncond=1 → always dropped to null row during training
    out = ce.apply(params, labels, training=True, rngs={"cfg": jax.random.PRNGKey(2)})
    null = ce.apply(params, method="null_token", batch_size=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(null), atol=1e-6)
    # eval → real embeddings, different from null
    out_eval = ce.apply(params, labels, training=False)
    assert not np.allclose(np.asarray(out_eval), np.asarray(null))


def test_conv1d_attention_pool_is_convex():
    m = Conv1DTemporalAttention(seq_len=5, subspace_dim=16)
    x = jnp.ones((2, 5, 16)) * jnp.arange(1, 6)[None, :, None]
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 1, 16)
    # attention weights are a softmax → output within [min, max] of inputs
    assert float(out.min()) >= 1.0 - 1e-5 and float(out.max()) <= 5.0 + 1e-5


def test_unet_checkpoint_remat_trains():
    """use_checkpoint=True with dropout>0 must init and differentiate: flax
    static_argnums counts `self` as arg 0, so `deterministic` is index 3
    (index 2 pinned the traced emb and crashed on Dropout's bool branch)."""
    import jax
    import jax.numpy as jnp

    from dsml_thesis_tpu.models import UNetModel

    m = UNetModel(in_channels=3, out_channels=3, model_channels=32,
                  num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), num_head_channels=16,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=16, use_checkpoint=True, dropout=0.1)
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, 16))
    params = m.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x, t, ctx) ** 2)

    g = jax.grad(loss)(params)
    assert jax.tree.leaves(g)


def test_unet_head_config_validation():
    import jax
    import jax.numpy as jnp
    import pytest

    from dsml_thesis_tpu.models import UNetModel

    m = UNetModel(in_channels=3, out_channels=3, model_channels=32,
                  num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), use_spatial_transformer=True,
                  transformer_depth=1, context_dim=16)  # no heads set
    with pytest.raises(AssertionError, match="num_heads"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
               jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 16)))

def test_class_embedder_freeze_null_contract():
    """freeze_null requires the 'separate' null table; the pinned row is
    exported via frozen_paths so AdamW's decoupled weight decay cannot
    erode it (the reference's requires_grad=False semantics)."""
    import pytest

    from dsml_thesis_tpu.models.encoders import ClassEmbedder

    m = ClassEmbedder(embed_dim=8, n_classes=4, null_mode="separate",
                      freeze_null=True)
    assert m.frozen_paths() == ("uncond_embedding",)
    m2 = ClassEmbedder(embed_dim=8, n_classes=4, null_mode="separate")
    assert m2.frozen_paths() == ()

    bad = ClassEmbedder(embed_dim=8, n_classes=4, null_mode="extra_row",
                        freeze_null=True)
    with pytest.raises(ValueError, match="freeze_null"):
        bad.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
