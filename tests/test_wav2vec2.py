"""Flax wav2vec2 + AudioEmbedder parity vs transformers / torch oracles.

Covers: conv feature extractor (group-norm first layer), 49Hz->frame-rate
align_corners interpolation (the reference override, modules.py:209-216),
feature projection, weight-normed positional conv, post-LN encoder, and the
AudioEmbedder window attention pooling with replicate edge padding
(modules.py:291-328).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from dsml_thesis_tpu.models import wav2vec2 as w2v


def _tiny_cfg():
    hf = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        conv_bias=False, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=False,
        feat_extract_norm="group", hidden_act="gelu", feat_proj_dropout=0.0,
        hidden_dropout=0.0, attention_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False,
    )
    ours = w2v.Wav2Vec2Config(
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        conv_bias=False, hidden_size=24, num_layers=2, num_heads=2,
        intermediate_size=48, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    return hf, ours


def _torch_reference_forward(tm, audio, num_frames):
    """The reference's Wav2Vec2Model override flow (modules.py:219-288):
    conv features -> align_corners interp to num_frames -> projection ->
    encoder."""
    import torch.nn.functional as F

    with torch.no_grad():
        h = tm.feature_extractor(audio).transpose(1, 2)  # [B, T, D]
        h = F.interpolate(h.transpose(1, 2), size=num_frames,
                          align_corners=True, mode="linear").transpose(1, 2)
        h = tm.feature_projection(h)[0]
        return tm.encoder(h).last_hidden_state.numpy()


def test_wav2vec2_parity():
    hf_cfg, cfg = _tiny_cfg()
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2Model(hf_cfg).eval()

    rs = np.random.RandomState(1)
    audio = rs.randn(2, 800).astype(np.float32) * 0.1
    F = 12
    ref = _torch_reference_forward(tm, torch.from_numpy(audio), F)

    params = w2v.convert_wav2vec2(tm.state_dict(), cfg)
    out = w2v.Wav2Vec2(cfg).apply({"params": params}, jnp.asarray(audio),
                                  num_frames=F)
    assert out.shape == ref.shape == (2, F, 24)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_wav2vec2_ctc_bundle_parity():
    """The 'bundle' audio precompute variant (reference mead_bundle.py:44-59):
    CTC emission logits at native 49 Hz, interpolated to the frame rate AFTER
    the whole model — vs a transformers Wav2Vec2ForCTC oracle."""
    import torch.nn.functional as TF

    hf_cfg, cfg = _tiny_cfg()
    cfg = w2v.Wav2Vec2Config(**{**cfg.__dict__, "ctc_vocab": hf_cfg.vocab_size})
    hf_cfg.final_dropout = 0.0
    torch.manual_seed(7)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()

    rs = np.random.RandomState(8)
    audio = rs.randn(1, 800).astype(np.float32) * 0.1
    with torch.no_grad():
        emission = tm(torch.from_numpy(audio)).logits  # [1, T, vocab]
    F = 9
    ref = TF.interpolate(emission.transpose(1, 2), size=F,
                         align_corners=True, mode="linear").transpose(1, 2)

    params = w2v.convert_wav2vec2(tm.state_dict(), cfg)
    logits = w2v.Wav2Vec2(cfg).apply({"params": params}, jnp.asarray(audio))
    out = w2v.interp_align_corners(logits, F)
    assert out.shape == ref.shape == (1, F, hf_cfg.vocab_size)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4, rtol=1e-3)


def test_interp_align_corners_matches_torch():
    import torch.nn.functional as F

    rs = np.random.RandomState(2)
    x = rs.randn(2, 17, 5).astype(np.float32)
    for out_len in (9, 17, 30):
        ref = F.interpolate(torch.from_numpy(x).transpose(1, 2), size=out_len,
                            align_corners=True, mode="linear")
        ref = ref.transpose(1, 2).numpy()
        out = np.asarray(w2v.interp_align_corners(jnp.asarray(x), out_len))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class _TorchPool(torch.nn.Module):
    """The reference attention pooling (modules.py:298-327) for the oracle."""

    def __init__(self, w, d):
        super().__init__()
        chans = [d, 192, 64, 16, 4, 1]
        layers = []
        for i in range(5):
            layers += [torch.nn.Conv1d(chans[i], chans[i + 1], 3, 1, 1),
                       torch.nn.LeakyReLU(0.02, True)]
        self.convnet = torch.nn.Sequential(*layers)
        self.att = torch.nn.Sequential(
            torch.nn.Linear(2 * w + 1, 2 * w + 1), torch.nn.Softmax(dim=1))
        self.w = w

    def forward(self, feats):  # [B, 2w+1, D]
        b = feats.shape[0]
        x = feats.transpose(1, 2)  # [B, D, 2w+1]
        a = self.att(self.convnet(x).view(b, 2 * self.w + 1))
        return torch.bmm(x, a.view(b, -1, 1)).view(b, -1).unsqueeze(1)


def test_audio_embedder_pool_parity():
    w, d = 2, 24
    torch.manual_seed(3)
    tp = _TorchPool(w, d).eval()
    _, cfg = _tiny_cfg()
    emb = w2v.AudioEmbedder(win_len=w, subspace_dim=d, cfg=cfg)

    rs = np.random.RandomState(4)
    feats = rs.randn(3, 2 * w + 1, d).astype(np.float32)
    with torch.no_grad():
        ref = tp(torch.from_numpy(feats)).numpy()

    # convert the torch pool weights into the flax layout
    sd = tp.state_dict()
    params = {}
    for i in range(5):
        params[f"att_conv_{i}"] = {
            "kernel": sd[f"convnet.{2 * i}.weight"].numpy().transpose(2, 1, 0),
            "bias": sd[f"convnet.{2 * i}.bias"].numpy(),
        }
    params["att_fc"] = {"kernel": sd["att.0.weight"].numpy().T,
                        "bias": sd["att.0.bias"].numpy()}
    out = emb.apply({"params": params}, jnp.asarray(feats),
                    method="window_pool")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


def test_audio_embedder_end_to_end_and_freezing():
    _, cfg = _tiny_cfg()
    emb = w2v.AudioEmbedder(win_len=2, subspace_dim=24, cfg=cfg)
    rs = np.random.RandomState(5)
    audio = jnp.asarray(rs.randn(2, 800).astype(np.float32) * 0.1)
    params = emb.init(jax.random.PRNGKey(0), audio, num_frames=10, frame_idx=0)

    # edge frame: window indices clamp (replicate padding)
    out0 = emb.apply(params, audio, num_frames=10, frame_idx=0)
    out9 = emb.apply(params, audio, num_frames=10, frame_idx=9)
    assert out0.shape == out9.shape == (2, 1, 24)
    # per-example traced frame indices
    outb = emb.apply(params, audio, num_frames=10,
                     frame_idx=jnp.array([0, 5]))
    assert outb.shape == (2, 1, 24)
    np.testing.assert_allclose(np.asarray(outb[0]), np.asarray(out0[0]),
                               atol=1e-6)

    # the frozen feature extractor is addressable for optimizer masking
    assert "feature_extractor" in params["params"]["audio_encoder"]
    assert w2v.AudioEmbedder.frozen_paths() == ("audio_encoder/feature_extractor",)

def test_convert_rejects_layer_norm_extractor_layout():
    """feat_extract_norm='layer' state_dicts (per-conv-layer LayerNorms)
    collide shape-for-shape with the group layout at conv layer 0, so the
    converter must fail fast instead of producing silently-garbage
    features."""
    import pytest
    import torch

    from dsml_thesis_tpu.models.wav2vec2 import convert_wav2vec2

    sd = {"feature_extractor.conv_layers.1.layer_norm.weight":
          torch.zeros(512)}
    with pytest.raises(ValueError, match="feat_extract_norm"):
        convert_wav2vec2(sd)


def test_audio_embedder_static_frame_idx_validated():
    import pytest

    from dsml_thesis_tpu.models.wav2vec2 import AudioEmbedder, Wav2Vec2Config

    cfg = Wav2Vec2Config(conv_dim=(8, 8), conv_kernel=(3, 3),
                         conv_stride=(2, 2), hidden_size=16, num_layers=1,
                         num_heads=2, intermediate_size=32,
                         num_conv_pos_embeddings=4,
                         num_conv_pos_embedding_groups=2)
    m = AudioEmbedder(cfg=cfg, win_len=1)
    audio = jnp.zeros((1, 64))
    with pytest.raises(ValueError, match="frame_idx"):
        m.init(jax.random.PRNGKey(0), audio, num_frames=4, frame_idx=4)
