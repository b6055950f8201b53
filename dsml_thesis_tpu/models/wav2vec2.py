"""Flax wav2vec2 (base, post-norm) + the trainable AudioEmbedder cond stage.

Parity targets:
  - transformers Wav2Vec2Model with do_stable_layer_norm=False (the
    facebook/wav2vec2-base-960h layout both reference audio paths load):
    conv feature extractor (group-norm first layer), feature projection,
    grouped weight-normed positional conv, post-LN transformer encoder.
  - The reference's in-file Wav2Vec2Model override (talking_face/ldm/modules/
    encoders/modules.py:219-288): CNN features are linearly interpolated from
    49 Hz to the 30 fps video frame count BEFORE projection+encoder
    (align_corners=True, :209-216).
  - AudioEmbedder (modules.py:291-328): end-to-end trainable wav2vec2 (conv
    feature extractor frozen) + conv attention pooling over a (2w+1) frame
    window -> one 768-d token (the MEADBase4 experimental conditioning).

Weights convert from a torch Wav2Vec2Model state_dict (convert_wav2vec2);
tested against random-init transformers models.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Defaults = facebook/wav2vec2-base-960h."""

    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    # CTC character head (the torchaudio WAV2VEC2_ASR_* "bundle" models emit
    # vocab-size logits; reference scripts/mead_bundle.py:44-58). None = no head.
    ctc_vocab: Optional[int] = None


# torchaudio WAV2VEC2_ASR_LARGE_960H ≡ HF facebook/wav2vec2-large-960h:
# same post-norm layout as base, scaled up, plus a CTC lm_head. NOTE on
# emission width: the HF ForCTC head emits 32 logits (4 specials + letters);
# torchaudio's bundle emitted 29 (specials dropped). Features regenerated
# with an HF snapshot are self-consistent, but 29-wide pkls from the
# reference-era torchaudio run are not byte-compatible — regenerate both
# sides with one tool.
LARGE_960H = Wav2Vec2Config(hidden_size=1024, num_layers=24, num_heads=16,
                            intermediate_size=4096, ctc_vocab=32)


def interp_align_corners(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=True) on axis 1 of
    [B, T, D] (the reference's 49 Hz -> 30 fps resampler, modules.py:209-216)."""
    T = x.shape[1]
    if T == out_len:
        return x
    pos = jnp.arange(out_len) * ((T - 1) / max(out_len - 1, 1))
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (pos - lo)[None, :, None]
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


class FeatureExtractor(nn.Module):
    """7-layer conv feature encoder; layer 0 group-normed (feat_extract_norm
    'group'). Raw audio [B, S] -> [B, T, conv_dim[-1]] at ~49 Hz."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        h = x[:, :, None]  # [B, S, 1]
        for i, (d, k, s) in enumerate(zip(self.cfg.conv_dim, self.cfg.conv_kernel,
                                          self.cfg.conv_stride)):
            h = nn.Conv(d, (k,), strides=(s,), padding="VALID",
                        use_bias=self.cfg.conv_bias, name=f"conv_{i}")(h)
            if i == 0:
                # torch GroupNorm(num_groups=dim, dim): per-channel instance
                # norm over time, affine
                mean = h.mean(axis=1, keepdims=True)
                var = h.var(axis=1, keepdims=True)
                h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
                h = h * self.param(f"gn_scale_{i}", nn.initializers.ones, (d,))
                h = h + self.param(f"gn_bias_{i}", nn.initializers.zeros, (d,))
            h = nn.gelu(h, approximate=False)
        return h


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (do_stable_layer_norm=False)."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, l, d = x.shape
        hd = d // c.num_heads
        q = nn.Dense(d, name="q_proj")(x).reshape(b, l, c.num_heads, hd)
        k = nn.Dense(d, name="k_proj")(x).reshape(b, l, c.num_heads, hd)
        v = nn.Dense(d, name="v_proj")(x).reshape(b, l, c.num_heads, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5, axis=-1
        )
        h = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, d)
        x = nn.LayerNorm(epsilon=1e-5, name="ln1")(
            x + nn.Dense(d, name="out_proj")(h)
        )
        h = nn.Dense(c.intermediate_size, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.LayerNorm(epsilon=1e-5, name="ln2")(
            x + nn.Dense(d, name="fc2")(h)
        )


class Wav2Vec2(nn.Module):
    """Raw 16 kHz audio [B, S] -> frame-rate features [B, num_frames, D].

    num_frames resamples CNN features to the video frame rate before the
    encoder (the reference override); None keeps the native 49 Hz length.
    The conv feature extractor is frozen when trained end-to-end (the
    reference calls _freeze_parameters; here trainable_filter handles it —
    see AudioEmbedder.frozen_paths).
    """

    cfg: Wav2Vec2Config = Wav2Vec2Config()
    # stop gradients at the conv extractor boundary (the reference's
    # _freeze_parameters, modules.py:294); its params then receive zero
    # gradient (only optimizer weight decay could still touch them)
    freeze_extractor: bool = False

    @nn.compact
    def __call__(self, audio, num_frames: Optional[int] = None):
        c = self.cfg
        h = FeatureExtractor(c, name="feature_extractor")(audio)
        if self.freeze_extractor:
            h = jax.lax.stop_gradient(h)
        if num_frames is not None:
            h = interp_align_corners(h, num_frames)
        # feature projection: LN + Linear
        h = nn.LayerNorm(epsilon=1e-5, name="fp_ln")(h)
        h = nn.Dense(c.hidden_size, name="fp_proj")(h)
        # grouped positional conv (weight norm folded at conversion), then
        # trim the trailing element (even kernel SamePad), GELU, residual
        k = c.num_conv_pos_embeddings
        pos = nn.Conv(c.hidden_size, (k,), padding=[(k // 2, k // 2)],
                      feature_group_count=c.num_conv_pos_embedding_groups,
                      name="pos_conv")(h)
        if k % 2 == 0:
            pos = pos[:, :-1]
        h = h + nn.gelu(pos, approximate=False)
        h = nn.LayerNorm(epsilon=1e-5, name="enc_ln")(h)
        for i in range(c.num_layers):
            h = EncoderLayer(c, name=f"layer_{i}")(h)
        if c.ctc_vocab is not None:
            # CTC emission logits; the bundle precompute interpolates these
            # (not the CNN features) to the video frame rate, so callers pass
            # num_frames=None and resample the output (mead_bundle.py:58-59)
            h = nn.Dense(c.ctc_vocab, name="lm_head")(h)
        return h


class AudioEmbedder(nn.Module):
    """Reference AudioEmbedder (modules.py:291-328): wav2vec2 features at the
    video frame rate, a (2*win_len+1) window around frame_idx (replicate-
    padded at clip edges), conv attention scores + softmax, attention-pooled
    to one [B, 1, 768] token."""

    win_len: int = 4
    subspace_dim: int = 768
    cfg: Wav2Vec2Config = Wav2Vec2Config()
    freeze_extractor: bool = True  # reference modules.py:294

    def setup(self):
        self.audio_encoder = Wav2Vec2(self.cfg,
                                      freeze_extractor=self.freeze_extractor)
        ch = (192, 64, 16, 4, 1)
        self.att_convs = [
            nn.Conv(c, (3,), padding=1, name=f"att_conv_{i}")
            for i, c in enumerate(ch)
        ]
        self.att_fc = nn.Dense(2 * self.win_len + 1, name="att_fc")

    def window_pool(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[B, 2w+1, D] window features -> [B, 1, D] attention-pooled token.

        Same pyramid as encoders.Conv1DTemporalAttention, kept inline on
        purpose: the param names here ('att_fc') are locked by the torch
        checkpoint conversion and its oracle test — swapping in the shared
        module ('att_dense') would break every already-converted ckpt."""
        b = feats.shape[0]
        h = feats  # NLC (torch runs NCL; same convs via channel-last)
        for conv in self.att_convs:
            h = nn.leaky_relu(conv(h), negative_slope=0.02)
        att = jax.nn.softmax(self.att_fc(h[:, :, 0]), axis=1)  # [B, 2w+1]
        return jnp.einsum("bwd,bw->bd", feats, att)[:, None]

    def __call__(self, audio, num_frames: Optional[int] = None,
                 frame_idx=None, training: bool = False):
        """audio: raw [B, S]; frame_idx: int or [B] traced frame positions.

        CondSpec convention (models/ldm.py encode_conditioning calls every
        cond stage as module(value, training=...)): with num_frames/frame_idx
        omitted, `audio` is the raw window covering the (2*win_len+1)-frame
        neighborhood of the target frame and the pooled token is centered —
        the MEADBase4 per-target-frame conditioning. `training` is accepted
        for the convention; the forward is deterministic (the reference's
        dropout/layerdrop/spec-augment training noise is not implemented —
        eval-mode numerics are parity-tested)."""
        if num_frames is None:
            num_frames = 2 * self.win_len + 1
        if frame_idx is None:
            frame_idx = self.win_len
        if isinstance(frame_idx, int) and isinstance(num_frames, int):
            # static indices validate at trace time for free (the reference
            # asserts frame_idx < num_frames, modules.py:319); traced values
            # fall back to the clip below (replicate padding)
            if not 0 <= frame_idx < num_frames:
                raise ValueError(
                    f"frame_idx {frame_idx} out of range [0, {num_frames})")
        feats = self.audio_encoder(audio, num_frames=num_frames)
        w = self.win_len
        idx = jnp.clip(
            jnp.asarray(frame_idx)[..., None] + jnp.arange(-w, w + 1),
            0, num_frames - 1,
        )  # replicate padding == index clamping
        if idx.ndim == 1:  # static frame_idx shared across the batch
            window = feats[:, idx]
        else:
            window = jnp.take_along_axis(feats, idx[:, :, None], axis=1)
        return self.window_pool(window)

    @staticmethod
    def frozen_paths():
        """Param sub-trees to exclude from the optimizer (the reference
        freezes the conv feature extractor, modules.py:294)."""
        return ("audio_encoder/feature_extractor",)


def config_from_hf(hf_config, ctc: bool = False) -> Wav2Vec2Config:
    """transformers Wav2Vec2Config -> Wav2Vec2Config (post-norm layout only).
    ctc=True adds the Wav2Vec2ForCTC lm_head (vocab_size logits)."""
    assert not getattr(hf_config, "do_stable_layer_norm", False), (
        "only the do_stable_layer_norm=False (base/large-960h) layout is implemented"
    )
    assert getattr(hf_config, "feat_extract_norm", "group") == "group", (
        "only the feat_extract_norm='group' extractor layout is implemented "
        "(per-conv-layer LayerNorm extractors would silently load layer 0's "
        "LayerNorm into the GroupNorm slot and drop layers 1+'s norms)"
    )
    return Wav2Vec2Config(
        ctc_vocab=hf_config.vocab_size if ctc else None,
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        conv_bias=hf_config.conv_bias,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
    )


def convert_wav2vec2(sd: Dict, cfg: Wav2Vec2Config = Wav2Vec2Config()) -> Dict:
    """torch transformers Wav2Vec2Model / Wav2Vec2ForCTC state_dict ->
    Flax Wav2Vec2 params (ForCTC keys carry a 'wav2vec2.' prefix and an
    unprefixed lm_head)."""
    if any(k.startswith("wav2vec2.") for k in sd):
        sd = {(k[len("wav2vec2."):] if k.startswith("wav2vec2.") else k): v
              for k, v in sd.items()}
    if "feature_extractor.conv_layers.1.layer_norm.weight" in sd:
        # feat_extract_norm='layer' layout: EVERY conv layer carries a
        # LayerNorm. Layer 0's key collides shape-for-shape with the
        # group-norm layout's single GroupNorm, so conversion would succeed
        # and produce silently-garbage features — fail fast instead.
        raise ValueError(
            "convert_wav2vec2: state_dict uses the feat_extract_norm='layer' "
            "extractor layout (per-conv-layer LayerNorms); only the 'group' "
            "layout (base/large-960h) is implemented")

    def np32(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def dense(t):
        return {"kernel": np32(f"{t}.weight").T, "bias": np32(f"{t}.bias")}

    def ln(t):
        return {"scale": np32(f"{t}.weight"), "bias": np32(f"{t}.bias")}

    params: Dict = {}
    fe: Dict = {}
    for i in range(len(cfg.conv_dim)):
        t = f"feature_extractor.conv_layers.{i}.conv"
        conv = {"kernel": np32(f"{t}.weight").transpose(2, 1, 0)}
        if cfg.conv_bias:
            conv["bias"] = np32(f"{t}.bias")
        fe[f"conv_{i}"] = conv
        if i == 0:
            g = f"feature_extractor.conv_layers.0.layer_norm"
            fe["gn_scale_0"] = np32(f"{g}.weight")
            fe["gn_bias_0"] = np32(f"{g}.bias")
    params["feature_extractor"] = fe
    params["fp_ln"] = ln("feature_projection.layer_norm")
    params["fp_proj"] = dense("feature_projection.projection")

    # positional conv: fold torch weight-norm (g * v / ||v|| over dims (0,1))
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd:
        g, v = np32(f"{base}.weight_g"), np32(f"{base}.weight_v")
    else:  # torch >= 2.1 parametrized layout
        g = np32(f"{base}.parametrizations.weight.original0")
        v = np32(f"{base}.parametrizations.weight.original1")
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # [out, in/groups, k]
    params["pos_conv"] = {"kernel": w.transpose(2, 1, 0),
                          "bias": np32(f"{base}.bias")}
    params["enc_ln"] = ln("encoder.layer_norm")
    for i in range(cfg.num_layers):
        t = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "q_proj": dense(f"{t}.attention.q_proj"),
            "k_proj": dense(f"{t}.attention.k_proj"),
            "v_proj": dense(f"{t}.attention.v_proj"),
            "out_proj": dense(f"{t}.attention.out_proj"),
            "ln1": ln(f"{t}.layer_norm"),
            "fc1": dense(f"{t}.feed_forward.intermediate_dense"),
            "fc2": dense(f"{t}.feed_forward.output_dense"),
            "ln2": ln(f"{t}.final_layer_norm"),
        }
    if cfg.ctc_vocab is not None:
        params["lm_head"] = dense("lm_head")
    return params
