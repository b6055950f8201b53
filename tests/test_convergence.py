"""Short-horizon training convergence + plain-attention (DDPM-style) UNet."""
import jax
import jax.numpy as jnp
import numpy as np
import yaml

from dsml_thesis_tpu.config import build_model
from dsml_thesis_tpu.models import UNetModel
from dsml_thesis_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

TINY_PIXEL_DDPM = """
model:
  target: ldm.models.diffusion.ddpm.LatentDiffusion
  params:
    linear_start: 0.0015
    linear_end: 0.0205
    timesteps: 50
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
    cond_stage_config:
      target: ldm.modules.encoders.modules.ClassEmbedder3
      params: {embed_dim: 16, n_classes: 4, key: class_label, p_uncond: 0.1}
"""


def test_loss_decreases_over_training():
    """150 steps on a fixed 2-mode dataset: loss_simple must drop clearly."""
    cfg = yaml.safe_load(TINY_PIXEL_DDPM)
    ldm = build_model(cfg["model"])
    assert ldm.first_stage is None  # pixel-space: no first-stage node in cfg

    rs = np.random.RandomState(0)
    data = jnp.asarray(
        np.stack([np.full((8, 8, 3), 0.5), np.full((8, 8, 3), -0.5)]),
        dtype=jnp.float32,
    )
    labels = jnp.array([0, 1])
    batch = {"image": data, "class_label": labels}
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(ldm, params, base_lr=2e-3)
    state = create_train_state(ldm, params, tx)
    step = jax.jit(make_train_step(ldm, tx))

    losses = []
    for i in range(150):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["train/loss_simple"]))
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early * 0.5, (early, late)


def test_plain_attention_unet():
    """use_spatial_transformer=False -> AttentionBlock path (pixel DDPM UNet)."""
    m = UNetModel(
        in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
        use_spatial_transformer=False,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.array([0]))
    out = m.apply(params, x, jnp.array([7]))
    assert out.shape == x.shape
    # attention params exist under the plain-attn naming
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("qkv" in n for n in names)
