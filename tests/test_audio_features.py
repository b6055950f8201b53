"""Audio featurizer logic with a tiny random-init wav2vec2 (no weights)."""
import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_spec = importlib.util.spec_from_file_location(
    "mead_audio_features",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "mead_audio_features.py"),
)
maf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(maf)


def test_linear_interpolation_to_frames():
    feats = np.arange(10, dtype=np.float32)[:, None].repeat(4, 1)
    out = maf.linear_interpolation_to_frames(feats, 5)
    assert out.shape == (5, 4)
    # endpoints preserved approximately, monotone
    assert out[0, 0] <= out[-1, 0]
    assert np.all(np.diff(out[:, 0]) >= 0)


def test_wav2vec2_staged_pipeline_tiny():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(3, 3),
        conv_stride=(2, 2), num_feat_extract_layers=2, vocab_size=32,
    )
    model = Wav2Vec2Model(cfg).eval()
    x = torch.from_numpy(np.random.RandomState(0).randn(1, 1600).astype(np.float32))
    num_frames = 7
    with torch.no_grad():
        feats = model.feature_extractor(x).transpose(1, 2)[0].numpy()
        feats = maf.linear_interpolation_to_frames(feats, num_frames)
        hidden = model.feature_projection(torch.from_numpy(feats)[None])[0]
        out = model.encoder(hidden).last_hidden_state[0].numpy()
    assert out.shape == (num_frames, 32)
    assert np.isfinite(out).all()


def test_load_wav_16k(tmp_path):
    import wave

    path = str(tmp_path / "t.wav")
    sr = 8000
    data = (np.sin(np.linspace(0, 100, sr)) * 32000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    out = maf.load_wav_16k(path)
    assert abs(len(out) - 16000) <= 1  # resampled 1s -> 16k samples
    assert np.abs(out).max() <= 1.0 + 1e-6
