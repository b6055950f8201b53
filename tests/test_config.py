"""Config surface: shipped YAMLs, finetune builders, text embedder, overrides."""
import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.config import build_finetune, build_model, load_config
from dsml_thesis_tpu.models import TransformerTextEmbedder


def test_all_shipped_configs_build():
    import glob

    for path in sorted(glob.glob("configs/**/*.yaml", recursive=True)):
        cfg = load_config([path])
        target = cfg["model"]["target"]
        if "autoencoder.VQModel" in target and "Interface" not in target:
            from dsml_thesis_tpu.training.vqgan_trainer import build_vqgan

            model, loss = build_vqgan(cfg["model"])
            assert model is not None and loss is not None
        elif "autoencoder.AutoencoderKL" in target:
            from dsml_thesis_tpu.training.vqgan_trainer import build_kl_ae

            model, loss = build_kl_ae(cfg["model"])
            assert model is not None and loss.kl_weight > 0
        elif "tune" in target.lower() or "CLIP" in target:
            ft = build_finetune(cfg["model"])
            assert ft is not None
        else:
            ldm = build_model(cfg["model"])
            assert ldm.schedule.num_timesteps == 1000


def test_finetune_knobs_from_yaml():
    cfg = load_config(["configs/latent-diffusion/affectnet-128-clip-ldm-vq-f4.yaml"])
    ft = build_finetune(cfg["model"])
    assert ft.train_steps == 6 and ft.strength == 0.5
    assert ft.clip_weight == 1.0 and ft.cls_weight == 0.0
    # strength-scaled train schedule traverses only half the chain
    assert int(ft.train_ddim.timesteps[-1]) <= 501

    cfg2 = load_config(["configs/latent-diffusion/mead-128-ldm-f4-tune.yaml"])
    ft2 = build_finetune(cfg2["model"])
    assert ft2.lr_loss_weight == 1.0 and ft2.start_lr_loss == 0


def test_transformer_text_embedder():
    m = TransformerTextEmbedder(n_embed=32, n_layer=2, vocab_size=100,
                                max_seq_len=16, n_heads=4)
    tokens = jnp.array([[1, 5, 9, 0], [2, 2, 2, 2]])
    params = jax.jit(m.init)(jax.random.PRNGKey(0), tokens)
    out = m.apply(params, tokens)
    assert out.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_non_kv_override_rejected():
    """A mistyped CLI flag (parse_known_args leftovers) must fail loudly, not
    become a silent empty config key."""
    import pytest

    with pytest.raises(ValueError, match="unrecognized argument"):
        load_config(["configs/latent-diffusion/mead-128-ldm-f4.yaml"],
                    ["--max_steps", "1"])
    # the '=' form of a mistyped flag must be rejected too, not become a
    # bogus '--max-stepz' config key
    with pytest.raises(ValueError, match="unrecognized argument"):
        load_config(["configs/latent-diffusion/mead-128-ldm-f4.yaml"],
                    ["--max-stepz=500"])


def test_dotlist_override_types():
    cfg = load_config(
        ["configs/latent-diffusion/mead-128-ldm-f4.yaml"],
        ["model.params.timesteps=250",
         "model.params.unet_config.params.dtype=bfloat16",
         "data.params.batch_size=2"],
    )
    assert cfg["model"]["params"]["timesteps"] == 250
    ldm = build_model(cfg["model"])
    assert ldm.schedule.num_timesteps == 250
    assert ldm.unet.dtype == jnp.bfloat16
