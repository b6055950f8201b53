"""End-to-end LatentDiffusion tests on a tiny 4-cond (MEAD-style) model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from dsml_thesis_tpu.config import build_model, load_config

TINY_MEAD_CFG = """
model:
  target: ldm.models.diffusion.ddpm2cond.LatentDiffusion
  params:
    linear_start: 0.0015
    linear_end: 0.0205
    timesteps: 100
    image_size: 8
    channels: 3
    first_stage_key: image
    cond_stage_key_1: class_label
    cond_stage_key_2: audio
    cond_stage_trainable: true
    conditioning_key: crossattn
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        image_size: 8
        in_channels: 9
        out_channels: 3
        model_channels: 32
        attention_resolutions: [2]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 16
        use_spatial_transformer: true
        transformer_depth: 1
        context_dim: 48
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
    cond_stage_config_1:
      target: ldm.modules.encoders.modules.ClassEmbedder
      params: {embed_dim: 16, n_classes: 8, key: class_label, p_uncond: 0.2}
    cond_stage_config_2:
      target: ldm.modules.encoders.modules.Conv1DTemporalAttention
      params: {seq_len: 5, subspace_dim: 32, subspace2hidden: false}
"""


@pytest.fixture(scope="module")
def mead_tiny():
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    batch = {
        "image": jnp.zeros((2, 16, 16, 3)),
        "masked_image": jnp.zeros((2, 16, 16, 3)),
        "identity": jnp.zeros((2, 16, 16, 3)),
        "class_label": jnp.array([1, 5]),
        "audio": jnp.zeros((2, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    return ldm, params, batch


def test_init_params_structure(mead_tiny):
    ldm, params, _ = mead_tiny
    assert set(params) == {
        "unet", "first_stage", "cond/class_label", "cond/audio",
    }
    filt = ldm.trainable_filter(params)
    assert filt["unet"] and not filt["first_stage"]
    assert filt["cond/class_label"] and filt["cond/audio"]


def test_context_dim_is_feature_concat(mead_tiny):
    ldm, params, batch = mead_tiny
    cond = ldm.encode_conditioning(params, batch)
    assert cond["crossattn"].shape == (2, 1, 48)  # 16 class ⊕ 32 audio
    assert cond["concat"].shape == (2, 8, 8, 6)  # two VQ latents, 3ch each


def test_training_loss_runs_and_differentiates(mead_tiny):
    ldm, params, batch = mead_tiny

    def loss_fn(p):
        return ldm.training_loss(p, batch, jax.random.PRNGKey(3))[0]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    # frozen first stage must receive gradients only through stop_gradient = 0
    fs_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["first_stage"]))
    assert fs_norm == 0.0
    unet_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["unet"]))
    assert unet_norm > 0.0


def test_cfg_sampling_end_to_end(mead_tiny):
    ldm, params, batch = mead_tiny
    cond = ldm.encode_conditioning(params, batch)
    uncond = ldm.null_conditioning(params, batch, batch_size=2)
    # concat streams identical between branches (CFG swaps only crossattn)
    np.testing.assert_allclose(
        np.asarray(uncond["concat"]), np.asarray(cond["concat"])
    )
    z = jax.jit(
        lambda key: ldm.sample_ddim(
            params, cond, (2, 8, 8, 3), key, steps=5,
            uncond=uncond, guidance_scale=2.0,
        )
    )(jax.random.PRNGKey(4))
    assert z.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(z)).all()
    img = ldm.decode_first_stage(params, z)
    assert img.shape == (2, 16, 16, 3)


def test_affectnet_config_builds():
    cfg = load_config(["configs/latent-diffusion/affectnet-128-ldm-vq-f4.yaml"])
    ldm = build_model(cfg["model"])
    assert ldm.first_stage_key == "image"
    assert len(ldm.cond_specs) == 1
    assert ldm.schedule.num_timesteps == 1000


def test_kl_first_stage_end_to_end():
    """AutoencoderKL first stage: init, posterior-sampled training encode,
    mode eval encode, and decode (no force_not_quantize kwarg) all work."""
    from dsml_thesis_tpu.diffusion import make_schedule
    from dsml_thesis_tpu.models import UNetModel
    from dsml_thesis_tpu.models.autoencoder import AutoencoderKL
    from dsml_thesis_tpu.models.ldm import CondSpec, LatentDiffusion

    dd = dict(double_z=True, z_channels=3, resolution=16, in_channels=3,
              out_ch=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), dropout=0.0)
    unet = UNetModel(in_channels=3, out_channels=3, model_channels=32,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_head_channels=16,
                     use_spatial_transformer=True, transformer_depth=1,
                     context_dim=16)
    from dsml_thesis_tpu.models.encoders import ClassEmbedder

    ldm = LatentDiffusion(
        unet=unet,
        first_stage=AutoencoderKL(ddconfig=dd, embed_dim=3),
        cond_specs=[CondSpec("class_label",
                             ClassEmbedder(embed_dim=16, n_classes=8))],
        schedule=make_schedule("linear", 100, 0.0015, 0.0205),
        scale_factor=0.5,
    )
    batch = {"image": jnp.zeros((2, 16, 16, 3)),
             "class_label": jnp.zeros((2,), jnp.int32)}
    params = ldm.init_params(jax.random.PRNGKey(0), batch)

    # mode (deterministic) vs posterior-sampled encode differ
    z_mode = ldm.encode_first_stage(params, batch["image"])
    z_samp = ldm.encode_first_stage(params, batch["image"],
                                    rng=jax.random.PRNGKey(1))
    assert z_mode.shape == z_samp.shape == (2, 8, 8, 3)
    assert float(jnp.abs(z_mode - z_samp).max()) > 0

    x = ldm.decode_first_stage(params, z_mode)
    assert x.shape == (2, 16, 16, 3)

    loss, aux = ldm.training_loss(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_latent_first_stage_key_uses_cached_latents():
    """first_stage_key='latent' (DiffusionCLIP cache training): the batch
    latent must be diffused AS-IS, never re-encoded through the first stage;
    the first stage still initializes with image-shaped convs for decoding."""
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    cfg["model"]["params"]["first_stage_key"] = "latent"
    ldm = build_model(cfg["model"])

    batch = {"latent": jnp.ones((2, 8, 8, 3)) * 0.1,
             "masked_image": jnp.zeros((2, 16, 16, 3)),
             "identity": jnp.zeros((2, 16, 16, 3)),
             "class_label": jnp.zeros((2,), jnp.int32),
             "audio": jnp.zeros((2, 5, 32))}
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    # encoder convs are image-shaped (16px input), usable for decoding
    x = ldm.decode_first_stage(params, batch["latent"])
    assert x.shape == (2, 16, 16, 3)
    # loss computes at the latent shape (a re-encode would shape-error: the
    # unet was built for 8x8x3 inputs, encode(8x8 latent) gives 4x4)
    loss, _ = ldm.training_loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_x0_parameterization_sampling_raises():
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    ldm.parameterization = "x0"
    with pytest.raises(NotImplementedError):
        ldm.make_eps_fn({}, None)


def test_encode_crossattn_tokens_matches_route(monkeypatch):
    """Token-route streams concatenate on the token axis in BOTH
    encode_conditioning and encode_crossattn_tokens."""
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    # flip the audio stream to the token route
    import dataclasses

    specs = [
        dataclasses.replace(s, route="crossattn_token")
        if s.key == "audio" else s
        for s in ldm.cond_specs
    ]
    # class tokens are 16-d, audio 32-d: token-concat requires equal dims;
    # use two token streams of the class embedder instead
    specs = [s for s in specs if s.key != "audio"]
    ldm.cond_specs = specs + [
        dataclasses.replace(specs[0], key="class_label2",
                            route="crossattn_token")
    ]
    # token-concat keeps the 16-d per-token width (feature-concat would be
    # 48); the UNet's context_dim guard (models/unet.py) rightly rejects a
    # mismatched width, so reconfigure the UNet to match the new routing
    ldm.unet = ldm.unet.clone(context_dim=16)
    batch = {
        "image": jnp.zeros((2, 16, 16, 3)),
        "masked_image": jnp.zeros((2, 16, 16, 3)),
        "identity": jnp.zeros((2, 16, 16, 3)),
        "class_label": jnp.zeros((2,), jnp.int32),
        "class_label2": jnp.ones((2,), jnp.int32),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    full = ldm.encode_conditioning(params, batch)["crossattn"]
    toks = ldm.encode_crossattn_tokens(params, batch)
    assert full.shape == toks.shape
    np.testing.assert_allclose(np.asarray(full), np.asarray(toks), atol=1e-6)


def test_no_first_stage_encode_decode_symmetry():
    # regression: decode_first_stage used to return z unchanged when
    # first_stage is None while encode applied scale_factor, breaking
    # round-trips for latent-space configs with scale_factor != 1
    from dsml_thesis_tpu.models.ldm import LatentDiffusion

    class Stub:
        first_stage = None
        scale_factor = 0.18215

    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3)
                    .astype(np.float32))
    z = LatentDiffusion.encode_first_stage(Stub, {}, x)
    xr = LatentDiffusion.decode_first_stage(Stub, {}, z)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x),
                               rtol=1e-6, atol=1e-6)


def test_eval_loss_form_disables_cfg_drop_and_dropout(mead_tiny):
    """training_loss(training=False) is the VALIDATION form: no CFG label
    drop, no dropout (the reference's validation_step runs with
    model.training=False). With p_uncond forced to 1.0, the training form
    must differ from the eval form under the same rng, and make_eval_step
    must produce the eval form."""
    import dataclasses

    from dsml_thesis_tpu.models.encoders import ClassEmbedder
    from dsml_thesis_tpu.training.train_state import (
        TrainState, make_eval_step)

    ldm, params, batch = mead_tiny
    specs = [
        dataclasses.replace(
            s, module=dataclasses.replace(s.module, p_uncond=1.0))
        if isinstance(s.module, ClassEmbedder) else s
        for s in ldm.cond_specs
    ]
    ldm = dataclasses.replace(ldm, cond_specs=specs)
    # conv_out AND every transformer proj_out are zero-initialized
    # (reference zero_module), so a fresh-init UNet's output has exactly
    # zero sensitivity to the context — randomize the zero leaves so the
    # CFG drop is observable in the loss
    kk = jax.random.PRNGKey(9)
    params = jax.tree.map(
        lambda a: (0.1 * jax.random.normal(kk, a.shape)
                   if a.size and not jnp.abs(a).max() else a),
        params)

    rng = jax.random.PRNGKey(5)
    l_train = float(ldm.training_loss(params, batch, rng, training=True)[0])
    l_eval = float(ldm.training_loss(params, batch, rng, training=False)[0])
    assert l_train != l_eval  # p_uncond=1.0 drops EVERY label when training

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=(), ema_params={"unet": params["unet"]})
    out = make_eval_step(ldm)(state, batch, rng)
    np.testing.assert_allclose(float(out["val_loss"]), l_eval, rtol=1e-6)


def test_frozen_subpaths_excluded_from_adamw_decay():
    """A frozen sub-tree inside a trainable cond group (wav2vec2's conv
    feature extractor) must not be touched by AdamW — decoupled weight decay
    would otherwise shrink it every step even at zero gradient."""
    from dsml_thesis_tpu.models.ldm import CondSpec, LatentDiffusion
    from dsml_thesis_tpu.models.wav2vec2 import AudioEmbedder, Wav2Vec2Config
    from dsml_thesis_tpu.training.train_state import make_optimizer

    tiny = Wav2Vec2Config(conv_dim=(8, 8), conv_kernel=(10, 3),
                          conv_stride=(5, 2), hidden_size=8, num_layers=1,
                          num_heads=2, intermediate_size=16,
                          num_conv_pos_embeddings=4,
                          num_conv_pos_embedding_groups=2)
    ldm = LatentDiffusion(
        unet=None, first_stage=None,
        cond_specs=[CondSpec("audio", AudioEmbedder(cfg=tiny),
                             "crossattn_feature", True)],
        schedule=None,
    )
    params = {
        "unet": {"w": jnp.ones((4,))},
        "cond/audio": {
            "audio_encoder": {
                "feature_extractor": {"conv_0": {"kernel": jnp.ones((3,))}},
                "fp_proj": {"kernel": jnp.ones((3,))},
            },
        },
    }
    assert ldm.frozen_subpaths() == {
        "cond/audio": ("audio_encoder/feature_extractor",)}
    tx = make_optimizer(ldm, params, base_lr=0.1, weight_decay=0.01)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, tx.init(params), params)
    fe = updates["cond/audio"]["audio_encoder"]["feature_extractor"]
    assert float(jnp.abs(fe["conv_0"]["kernel"]).max()) == 0.0
    # the rest of the trainable group still decays (zero grad, wd > 0)
    assert float(jnp.abs(
        updates["cond/audio"]["audio_encoder"]["fp_proj"]["kernel"]).max()) > 0
    assert float(jnp.abs(updates["unet"]["w"]).max()) > 0


def test_concat_module_config_routes_raw():
    """A 1-cond config with conditioning_key != crossattn and a REAL encoder
    module must route concat_raw (the reference concatenates the cond-stage
    output directly); only __is_first_stage__ goes through the first stage."""
    cfg = yaml.safe_load(TINY_MEAD_CFG)["model"]
    one = {
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            **{k: cfg["params"][k] for k in
               ("linear_start", "linear_end", "timesteps", "image_size",
                "channels", "first_stage_config", "unet_config")},
            "first_stage_key": "image",
            "cond_stage_key": "class_label",
            "conditioning_key": "concat",
            "cond_stage_config": {
                "target": "ldm.modules.encoders.modules.ClassEmbedder",
                "params": {"embed_dim": 16, "n_classes": 8},
            },
        },
    }
    ldm = build_model(one)
    assert ldm.cond_specs[0].route == "concat_raw"


def test_crossattn_raw_stream_included_in_sampler_tokens(mead_tiny):
    """A module-less crossattn stream (precomputed tokens in the batch) must
    reach encode_crossattn_tokens exactly as it reaches training's
    encode_conditioning — it used to be silently dropped by the sampler."""
    import dataclasses

    from dsml_thesis_tpu.models.ldm import CondSpec

    ldm, params, batch = mead_tiny
    ldm = dataclasses.replace(ldm, cond_specs=list(ldm.cond_specs) + [
        CondSpec("cached_ctx", None, "crossattn_token", False)])
    batch = dict(batch)
    batch["cached_ctx"] = jnp.ones((2, 3, 48))  # ctx width = class16+audio32
    full = ldm.encode_conditioning(params, batch)["crossattn"]
    toks = ldm.encode_crossattn_tokens(params, batch)
    np.testing.assert_allclose(np.asarray(full), np.asarray(toks), atol=1e-6)
    assert toks.shape[1] >= 4  # the raw 3 tokens joined the context
