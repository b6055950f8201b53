"""DiffusionCLIP + lipread finetune stacks with stand-in frozen encoders."""
import jax
import jax.numpy as jnp
import numpy as np
import yaml

from dsml_thesis_tpu.config import build_model
from dsml_thesis_tpu.models.diffclip import DiffusionCLIPFinetune
from dsml_thesis_tpu.models.lipread_tune import LipreadFinetune, cut_mouth

from test_ldm import TINY_MEAD_CFG

TINY_AFFECTNET_CFG = """
model:
  target: ldm.models.diffusion.ddpm.LatentDiffusion
  params:
    linear_start: 0.0015
    linear_end: 0.0205
    timesteps: 100
    image_size: 8
    channels: 3
    first_stage_key: image
    cond_stage_key: class_label
    cond_stage_trainable: true
    conditioning_key: crossattn
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        image_size: 8
        in_channels: 3
        out_channels: 3
        model_channels: 32
        attention_resolutions: [2]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 16
        use_spatial_transformer: true
        transformer_depth: 1
        context_dim: 16
    first_stage_config:
      target: ldm.models.autoencoder.VQModelInterface
      params:
        embed_dim: 3
        n_embed: 64
        ddconfig:
          double_z: false
          z_channels: 3
          resolution: 16
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 2]
          num_res_blocks: 1
          attn_resolutions: [8]
          dropout: 0.0
        lossconfig: {target: torch.nn.Identity}
    cond_stage_config:
      target: ldm.modules.encoders.modules.ClassEmbedder3
      params: {embed_dim: 16, n_classes: 8, key: class_label, p_uncond: 0.2}
"""


def test_diffusionclip_finetune_grads_flow():
    cfg = yaml.safe_load(TINY_AFFECTNET_CFG)
    ldm = build_model(cfg["model"])
    init_batch = {
        "image": jnp.zeros((2, 16, 16, 3)),
        "class_label": jnp.zeros((2,), jnp.int32),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), init_batch)

    # stand-in frozen encoders: fixed random projections
    wk = jax.random.normal(jax.random.PRNGKey(1), (16 * 16 * 3, 32)) * 0.02
    embed = lambda imgs: imgs.reshape(imgs.shape[0], -1) @ wk

    ft = DiffusionCLIPFinetune(
        ldm, train_steps=3, strength=0.5,
        l2_weight=1.0, id_weight=1.0, clip_weight=1.0,
        clip_image_embed=embed, arcface_embed=embed,
    )
    batch = {
        "latent": jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3)),
        "original": jnp.zeros((2, 16, 16, 3)),
        "class_label": jnp.array([1, 6]),
        "text_direction": jax.random.normal(jax.random.PRNGKey(3), (2, 32)),
    }

    def loss_fn(p):
        return ft.training_loss(p, batch, jax.random.PRNGKey(4))[0]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    # gradient flows through the k-step sampler into the UNet
    g = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(grads["unet"]))
    assert g > 0
    # frozen first stage gets none
    g_fs = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(grads["first_stage"]))
    assert g_fs == 0.0


def test_cut_mouth_center_and_bounds():
    imgs = jnp.arange(2 * 128 * 128 * 3, dtype=jnp.float32).reshape(2, 128, 128, 3)
    lm = jnp.zeros((2, 68, 2))
    # mouth landmarks centered at (64, 80) for ex 0, near the corner for ex 1
    lm = lm.at[0, 48:68, 0].set(64).at[0, 48:68, 1].set(80)
    lm = lm.at[1, 48:68, 0].set(2).at[1, 48:68, 1].set(2)  # clamped to bounds
    out = cut_mouth(imgs, lm, crop=96)
    assert out.shape == (2, 96, 96, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_lipread_finetune_loss():
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    batch = {
        "image": jnp.zeros((2, 16, 16, 3)),
        "masked_image": jnp.zeros((2, 16, 16, 3)),
        "identity": jnp.zeros((2, 16, 16, 3)),
        "class_label": jnp.array([0, 1]),
        "audio": jnp.zeros((2, 5, 32)),
        "landmarks": jnp.ones((2, 68, 2)) * 8.0,
    }
    params = ldm.init_params(jax.random.PRNGKey(0), batch)

    wk = jax.random.normal(jax.random.PRNGKey(1), (88 * 88, 16)) * 0.01
    lipreader = lambda m: m.reshape(m.shape[0], -1) @ wk

    ft = LipreadFinetune(ldm, lipreader_fn=lipreader, decode_steps=2,
                         mouth_crop=12, mouth_size=88)
    loss, aux = jax.jit(
        lambda p: ft.training_loss(p, batch, jax.random.PRNGKey(2))
    )(params)
    assert np.isfinite(float(loss))
    assert "lr_loss" in aux and "l2_loss" in aux


def test_lipread_start_lr_loss_warmup_uses_live_step():
    """adopt_weight gating gets the real global step through the train step
    (mead-128-ldm-f4-tune.yaml start_lr_loss knob)."""
    import optax

    from dsml_thesis_tpu.training.train_state import (
        TrainState,
        create_train_state,
        make_train_step,
    )

    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    batch = {
        "image": jnp.zeros((2, 16, 16, 3)),
        "masked_image": jnp.zeros((2, 16, 16, 3)),
        "identity": jnp.zeros((2, 16, 16, 3)),
        "class_label": jnp.array([0, 1]),
        "audio": jnp.zeros((2, 5, 32)),
        "landmarks": jnp.ones((2, 68, 2)) * 8.0,
    }
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    wk = jax.random.normal(jax.random.PRNGKey(1), (88 * 88, 16)) * 0.01
    ft = LipreadFinetune(ldm, lipreader_fn=lambda m: m.reshape(m.shape[0], -1) @ wk,
                         decode_steps=2, mouth_crop=12, mouth_size=88,
                         lr_loss_weight=1.0, start_lr_loss=1)

    tx = optax.sgd(0.0)  # keep params fixed; only the step counter moves
    state = create_train_state(ldm, params, tx)
    step = jax.jit(make_train_step(ft, tx))
    state, m0 = step(state, batch, jax.random.PRNGKey(2))
    state, m1 = step(state, batch, jax.random.PRNGKey(2))
    # step 0: lr_loss gated off (global_step 0 < threshold 1) -> loss == l2
    np.testing.assert_allclose(float(m0["train/loss"]),
                               float(m0["train/l2_loss"]), rtol=1e-6)
    # step 1: gate open -> loss includes the lipread term
    assert float(m1["train/loss"]) > float(m1["train/l2_loss"]) + 1e-8
