"""VQGAN loss stack + training-step tests (random-weight LPIPS: shape/flow only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsml_thesis_tpu.losses import (
    LPIPS,
    NLayerDiscriminator,
    VQGANLoss,
    adopt_weight,
    hinge_d_loss,
    measure_perplexity,
    vanilla_d_loss,
)


def test_discriminator_patch_output():
    d = NLayerDiscriminator(ndf=32, n_layers=2)
    x = jnp.zeros((2, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] < 32  # patch logits, spatially reduced


def test_gan_losses_direction():
    real = jnp.ones((2, 4, 4, 1)) * 2.0
    fake = -jnp.ones((2, 4, 4, 1)) * 2.0
    # perfectly separated -> hinge loss 0
    assert float(hinge_d_loss(real, fake)) == pytest.approx(0.0)
    # inverted -> large
    assert float(hinge_d_loss(fake, real)) == pytest.approx(3.0)
    assert float(vanilla_d_loss(real, fake)) < float(vanilla_d_loss(fake, real))


def test_adopt_weight_gate():
    assert float(adopt_weight(2.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(2.0, jnp.asarray(15), threshold=10)) == 2.0


def test_measure_perplexity_uniform():
    idx = jnp.arange(16) % 4
    p, used = measure_perplexity(idx, 4)
    np.testing.assert_allclose(float(p), 4.0, rtol=1e-4)
    assert int(used) == 4


def test_lpips_zero_for_identical():
    m = LPIPS()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(1), x, x)
    d = m.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    d2 = m.apply(params, x, -x)
    assert float(jnp.abs(d2).max()) > 0


def test_vqgan_train_step():
    from dsml_thesis_tpu.models import VQModel
    from dsml_thesis_tpu.training.vqgan import (
        create_vqgan_state,
        make_vqgan_train_step,
    )

    dd = dict(double_z=False, z_channels=3, resolution=16, in_channels=3,
              out_ch=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), dropout=0.0)
    model = VQModel(ddconfig=dd, n_embed=32, embed_dim=3)
    loss = VQGANLoss(disc_start=0, perceptual_weight=0.0, disc_num_layers=1,
                     disc_ndf=32)
    state, ae_tx, disc_tx = create_vqgan_state(
        model, loss, jax.random.PRNGKey(0), (2, 16, 16, 3), lr=1e-4
    )
    step = jax.jit(make_vqgan_train_step(model, loss, ae_tx, disc_tx))
    batch = {"image": jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.5}
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    for k in ("train/total_loss", "train/disc_loss", "train/d_weight"):
        assert np.isfinite(float(metrics[k])), k
    # both param sets updated
    d_ae = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.ae_params, new_state.ae_params)
    assert max(jax.tree.leaves(d_ae)) > 0
    d_disc = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.loss_params["discriminator"],
        new_state.loss_params["discriminator"],
    )
    assert max(jax.tree.leaves(d_disc)) > 0


def test_gan_loss_formulas_match_reference():
    """hinge/vanilla d-loss and adopt_weight value parity vs the reference
    functions (taming/modules/losses/vqperceptual.py:14-31) on shared
    random logits."""
    import os
    import sys

    torch = pytest.importorskip("torch")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import install_reference_path, reference_available

    if not reference_available():
        pytest.skip("reference tree not mounted")
    install_reference_path()
    if "torchvision" not in sys.modules:  # lpips.py header import, unused here
        import types

        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    from taming.modules.losses.vqperceptual import (
        adopt_weight as ref_adopt,
        hinge_d_loss as ref_hinge,
        vanilla_d_loss as ref_vanilla,
    )

    from dsml_thesis_tpu.losses.discriminator import (
        adopt_weight,
        hinge_d_loss,
        vanilla_d_loss,
    )

    rs = np.random.RandomState(0)
    lr = rs.randn(2, 6, 6, 1).astype(np.float32)
    lf = rs.randn(2, 6, 6, 1).astype(np.float32)
    tr, tf = torch.from_numpy(lr), torch.from_numpy(lf)
    np.testing.assert_allclose(
        float(hinge_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
        float(ref_hinge(tr, tf)), rtol=1e-6)
    np.testing.assert_allclose(
        float(vanilla_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
        float(ref_vanilla(tr, tf)), rtol=1e-6)
    for step, thr in ((0, 5), (5, 5), (9, 5)):
        assert float(adopt_weight(2.0, step, thr)) == ref_adopt(2.0, step, thr)
