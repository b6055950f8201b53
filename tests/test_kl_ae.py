"""KL autoencoder training path: loss-formula oracle vs the reference
contperceptual.LPIPSWithDiscriminator, tiny end-to-end trainer fit, and the
train_logvar opt-in (reference AutoencoderKL loop, ldm/models/autoencoder.py:
285-424 + ldm/modules/losses/contperceptual.py:7-99)."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _config(batch=8, train_logvar=False):
    spec_node = {
        "target": "dsml_thesis_tpu.data.SyntheticDataset",
        "params": {"spec": {"image": [[16, 16, 3], "float32"]}, "length": 16},
    }
    return {
        "model": {
            "base_learning_rate": 1e-4,
            "target": "ldm.models.autoencoder.AutoencoderKL",
            "params": {
                "embed_dim": 3,
                "ddconfig": {
                    "double_z": True, "z_channels": 3, "resolution": 16,
                    "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": [1, 2],
                    "num_res_blocks": 1, "attn_resolutions": [],
                    "dropout": 0.0,
                },
                "lossconfig": {"params": {
                    "disc_start": 0, "disc_num_layers": 1, "disc_ndf": 32,
                    "kl_weight": 1e-3, "train_logvar": train_logvar,
                }},
            },
        },
        "data": {"params": {"batch_size": batch, "num_workers": 2,
                            "train": spec_node, "validation": spec_node}},
        "lightning": {"modelcheckpoint": {"params": {"save_top_k": 1}}},
    }


def test_kl_trainer_fit_val_topk(tmp_path):
    from dsml_thesis_tpu.training.vqgan_trainer import KLAETrainer

    t = KLAETrainer(_config(), str(tmp_path / "run"), seed=0, max_steps=2)
    state = t.fit(epochs=1, log_every=1, image_every=1, val_max_batches=1)
    assert int(state.step) == 2

    lines = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    train = [l for l in lines if l["split"] == "train"]
    assert train and {"train/total_loss", "train/kl_loss", "train/nll_loss",
                      "train/logvar", "train/disc_loss"} <= set(train[0])
    assert all(np.isfinite(v) for v in train[0].values()
               if isinstance(v, float))
    val = [l for l in lines if l["split"] == "val"]
    assert val and {"val/rec_loss", "val/aeloss", "val/kl_loss",
                    "val/disc_loss"} <= set(val[0])

    ckpts = os.listdir(tmp_path / "run" / "checkpoints")
    assert "last" in ckpts
    assert any("val_rec_loss=" in c for c in ckpts)
    imgs = os.listdir(tmp_path / "run" / "images")
    assert any(f.startswith("recon_step") and f.endswith(".npy") for f in imgs)


def test_kl_logvar_frozen_by_default_trainable_on_optin(tmp_path):
    from dsml_thesis_tpu.training.vqgan_trainer import KLAETrainer

    t = KLAETrainer(_config(), str(tmp_path / "a"), seed=0, max_steps=2)
    s = t.fit(epochs=1, log_every=10, val_max_batches=0)
    # reference parity: configure_optimizers never adds loss.logvar
    assert float(s.loss_params["logvar"]) == 0.0

    t2 = KLAETrainer(_config(train_logvar=True), str(tmp_path / "b"),
                     seed=0, max_steps=2)
    s2 = t2.fit(epochs=1, log_every=10, val_max_batches=0)
    assert "_loss_logvar" in s2.ae_params
    assert float(s2.ae_params["_loss_logvar"]) != 0.0  # actually optimized


def test_kl_generator_loss_formula_matches_reference():
    """Numeric parity of nll(logvar) + kl_weight * KL against the reference
    LPIPSWithDiscriminator forward (optimizer_idx 0) with the GAN term nulled
    (disc_factor=0) and LPIPS stubbed to zero — isolates the KL-variant
    formula (sum/batch NLL, logvar division, kl sum/batch,
    contperceptual.py:49-88)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import install_reference_path, reference_available

    if not reference_available():
        pytest.skip("reference tree not mounted")
    install_reference_path()
    if "torchvision" not in sys.modules:
        import types

        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    import ldm.modules.losses.contperceptual as ref_mod

    class _ZeroLPIPS(torch.nn.Module):
        def forward(self, a, b):
            return torch.zeros(a.shape[0], 1, 1, 1)

    ref_mod.LPIPS = lambda: _ZeroLPIPS()
    ref_loss = ref_mod.LPIPSWithDiscriminator(
        disc_start=0, kl_weight=0.37, logvar_init=0.25, disc_factor=0.0,
        disc_num_layers=1, perceptual_weight=1.0,
    )

    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 8, 8).astype(np.float32)
    rec = rs.randn(2, 3, 8, 8).astype(np.float32)
    # moments (mean, logvar) for the posterior, channel-last for jax
    mean = rs.randn(2, 4, 4, 3).astype(np.float32)
    logvar = rs.randn(2, 4, 4, 3).astype(np.float32)

    from ldm.modules.distributions.distributions import (
        DiagonalGaussianDistribution,
    )

    t_moments = torch.from_numpy(np.concatenate(
        [mean.transpose(0, 3, 1, 2), logvar.transpose(0, 3, 1, 2)], axis=1))
    post = DiagonalGaussianDistribution(t_moments)
    ref_total, ref_log = ref_loss(
        torch.from_numpy(x), torch.from_numpy(rec), post, 0, 0,
        last_layer=None, split="val",
    )

    from dsml_thesis_tpu.losses.contperceptual import KLAutoencoderLoss
    from dsml_thesis_tpu.models.autoencoder import DiagonalGaussian

    jl = KLAutoencoderLoss(disc_start=0, kl_weight=0.37, logvar_init=0.25,
                           disc_factor=0.0, disc_num_layers=1,
                           perceptual_weight=0.0)
    lp = jl.init_params(jax.random.PRNGKey(0), (2, 8, 8, 3))
    jpost = DiagonalGaussian(jnp.asarray(mean), jnp.asarray(logvar))
    total, log = jl.generator_loss(
        lp, jpost.kl(),
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(rec.transpose(0, 2, 3, 1)),
        global_step=0, val=True,
    )
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-5)
    np.testing.assert_allclose(float(log["kl_loss"]),
                               float(ref_log["val/kl_loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(log["nll_loss"]),
                               float(ref_log["val/nll_loss"]), rtol=2e-5)


def test_builders_forward_disc_in_channels():
    """lossconfig.params.disc_in_channels must reach the discriminator
    (reference LPIPSWithDiscriminator/VQLPIPSWithDiscriminator forward it to
    NLayerDiscriminator's input_nc); a grayscale config would otherwise get
    a silently wrong 3-channel discriminator."""
    from dsml_thesis_tpu.training.vqgan_trainer import build_kl_ae, build_vqgan

    cfg = _config()["model"]
    cfg["params"]["lossconfig"]["params"]["disc_in_channels"] = 1
    _, kl_loss = build_kl_ae(cfg)
    assert kl_loss.disc_in_channels == 1

    vq_cfg = {
        "params": {
            "embed_dim": 3, "n_embed": 16,
            "ddconfig": dict(cfg["params"]["ddconfig"], double_z=False),
            "lossconfig": {"params": {"disc_start": 0,
                                      "disc_in_channels": 1}},
        }
    }
    _, vq_loss = build_vqgan(vq_cfg)
    assert vq_loss.disc_in_channels == 1


def test_kl_eval_noise_varies_per_batch():
    """The eval step folds the validation batch index into the posterior
    noise key (the reference's Lightning validation_step draws fresh noise
    per batch): the same batch at two indices must produce different
    rec losses, and the same index must reproduce."""
    from dsml_thesis_tpu.training.kl_ae import (
        create_kl_ae_state, make_kl_ae_eval_step)
    from dsml_thesis_tpu.training.vqgan_trainer import build_kl_ae

    model, loss = build_kl_ae(_config()["model"])
    state, _, _ = create_kl_ae_state(model, loss, jax.random.PRNGKey(0),
                                     (2, 16, 16, 3), lr=1e-4)
    step = make_kl_ae_eval_step(model, loss)
    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32))}
    m0 = step(state, batch, jnp.int32(0))
    m1 = step(state, batch, jnp.int32(1))
    m0b = step(state, batch, jnp.int32(0))
    assert float(m0["val/rec_loss"]) != float(m1["val/rec_loss"])
    np.testing.assert_allclose(float(m0["val/rec_loss"]),
                               float(m0b["val/rec_loss"]))


def test_kl_val_rec_loss_is_reference_metric():
    """val/rec_loss must be the logvar-free reconstruction mean (the
    reference's monitored metric, contperceptual.py:87) — NOT the
    H*W*C-scaled nll the KL eval step used to substitute."""
    from dsml_thesis_tpu.losses.contperceptual import KLAutoencoderLoss

    jl = KLAutoencoderLoss(disc_start=0, kl_weight=1.0, disc_factor=0.0,
                           disc_num_layers=1, perceptual_weight=0.0)
    lp = jl.init_params(jax.random.PRNGKey(0), (2, 8, 8, 3))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 3), jnp.float32)
    rec = jnp.asarray(rs.randn(2, 8, 8, 3), jnp.float32)
    from dsml_thesis_tpu.models.autoencoder import DiagonalGaussian

    post = DiagonalGaussian(jnp.zeros((2, 2, 2, 3)), jnp.zeros((2, 2, 2, 3)))
    _, log = jl.generator_loss(lp, post.kl(), x, rec, 0, val=True)
    np.testing.assert_allclose(float(log["rec_loss"]),
                               float(jnp.mean(jnp.abs(x - rec))), rtol=1e-6)
    # nll = sum(rec + logvar)/B >> rec mean — the two must not be conflated
    assert float(log["nll_loss"]) > 10 * float(log["rec_loss"])


def test_vq_training_without_last_layer_hooks_raises():
    """Training with the GAN enabled but no adaptive-weight grad path must
    raise (silently substituting a constant d_weight trains a different
    objective than the reference's always-adaptive one); validation and
    disc_factor=0 still work hook-free."""
    import pytest

    from dsml_thesis_tpu.losses.vqperceptual import VQGANLoss

    vl = VQGANLoss(disc_start=0, disc_num_layers=1, perceptual_weight=0.0)
    lp = vl.init_params(jax.random.PRNGKey(0), (2, 8, 8, 3))
    x = jnp.zeros((2, 8, 8, 3))
    q = jnp.zeros(())
    with pytest.raises(ValueError, match="decode_from_last"):
        vl.generator_loss(lp, q, x, x, 0)
    _, log = vl.generator_loss(lp, q, x, x, 0, val=True)
    assert float(log["d_weight"]) == 0.0


def test_discriminator_accepts_any_ndf():
    """The reference's BatchNorm has no channel-divisibility constraint; the
    GroupNorm substitute must pick a dividing group count (ndf=24 -> 48
    channels used to crash num_groups=32)."""
    from dsml_thesis_tpu.losses.discriminator import NLayerDiscriminator

    d = NLayerDiscriminator(ndf=24, n_layers=3, input_nc=3)
    p = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = d.apply(p, jnp.zeros((2, 32, 32, 3)))
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()

def test_kl_training_without_last_layer_hooks_raises():
    """Same contract as VQGANLoss (test above): the KL generator loss must
    fail loudly when training with the GAN enabled but no adaptive-weight
    grad path (the reference's calculate_adaptive_weight raises there)."""
    import pytest

    from dsml_thesis_tpu.losses.contperceptual import KLAutoencoderLoss

    kl_loss = KLAutoencoderLoss(disc_start=0, disc_num_layers=1,
                                perceptual_weight=0.0)
    lp = kl_loss.init_params(jax.random.PRNGKey(0), (2, 8, 8, 3))
    x = jnp.zeros((2, 8, 8, 3))
    kl = jnp.zeros((2,))
    with pytest.raises(ValueError, match="decode_from_last"):
        kl_loss.generator_loss(lp, kl, x, x, 0)
    _, log = kl_loss.generator_loss(lp, kl, x, x, 0, val=True)
    assert float(log["d_weight"]) == 0.0


def test_ddconfig_tanh_out_reaches_decoder():
    """ddconfig is splatted into BOTH Encoder and Decoder; a config with
    tanh_out: true must construct (Encoder accepts-and-ignores it) and the
    decoder output must land in [-1, 1]."""
    from dsml_thesis_tpu.models.autoencoder import VQModel

    dd = dict(ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
              resolution=16, z_channels=4, in_channels=3, out_ch=3,
              double_z=False, tanh_out=True)
    m = VQModel(ddconfig=dd, n_embed=16, embed_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3)) * 10
    vars_ = m.init(jax.random.PRNGKey(1), x)
    rec = m.apply(vars_, x)[0]
    assert float(jnp.abs(rec).max()) <= 1.0
