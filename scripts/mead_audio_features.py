#!/usr/bin/env python
"""Precompute per-clip wav2vec2 audio features for the MEAD dataset.

Reference-surface parity: talking_face/mead.py:78-202 — wav2vec2-base-960h
over 16 kHz audio with the CNN feature-extractor output linearly interpolated
from its native 49 Hz to the 30 fps video rate BEFORE the transformer encoder,
so each video frame gets one 768-d feature row; saved as
{subj}_{emotion}_{lvl}_{clip}.pkl.

Runs the JAX/Flax wav2vec2 port from `transformers` with locally available
weights (--model points at a local snapshot; zero-egress image cannot
download). The interpolation is implemented as jax.image.resize over the time
axis.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def linear_interpolation_to_frames(features: np.ndarray, num_frames: int) -> np.ndarray:
    """[T, D] CNN features (49 Hz) -> [num_frames, D], align_corners=True
    (matching the reference's F.interpolate, modules.py:209-216)."""
    import jax.numpy as jnp

    from dsml_thesis_tpu.models.wav2vec2 import interp_align_corners

    return np.asarray(
        interp_align_corners(jnp.asarray(features)[None], num_frames)[0]
    )


def load_wav_16k(path: str) -> np.ndarray:
    """Load a wav at 16 kHz mono without librosa (stdlib wave + resample)."""
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[w.getsampwidth()]
        data = np.frombuffer(raw, dtype=dtype).astype(np.float32)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1)
        data = data / np.abs(data).max().clip(1e-6)
    if sr != 16000:
        import jax
        import jax.numpy as jnp

        out_len = int(round(len(data) * 16000 / sr))
        data = np.asarray(
            jax.image.resize(jnp.asarray(data), (out_len,), method="linear")
        )
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tuples", required=True, help="pkl of (subj,emo,lvl,clip)")
    ap.add_argument("--audio-root", required=True,
                    help="<root>/<subj>/audio/<emo>/<lvl>/<clip>.wav")
    ap.add_argument("--frames-root", required=True,
                    help="<root>/<subj>/video/front/<emo>/<lvl>/<clip>/ frame dirs")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--model", default="facebook/wav2vec2-base-960h",
                    help="local wav2vec2 snapshot path or model id")
    ap.add_argument("--backend", choices=["flax", "torch"], default="flax",
                    help="flax: the in-framework Wav2Vec2 (TPU-capable) fed "
                         "by converted torch weights; torch: HF model on CPU")
    ap.add_argument("--variant", choices=["base", "bundle"], default="base",
                    help="base: hidden-state features, CNN output interpolated "
                         "to the frame rate pre-encoder (mead.py:154-202); "
                         "bundle: CTC emission logits interpolated post-model "
                         "(scripts/mead_bundle.py:44-59; pair with a "
                         "wav2vec2-large-960h ForCTC snapshot via --model)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from transformers import Wav2Vec2FeatureExtractor

    extractor = Wav2Vec2FeatureExtractor.from_pretrained(args.model)

    if args.backend == "flax":
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        import jax.numpy as jnp
        from transformers import Wav2Vec2ForCTC as TorchCTC
        from transformers import Wav2Vec2Model as TorchW2V

        from dsml_thesis_tpu.models.wav2vec2 import (
            Wav2Vec2,
            config_from_hf,
            convert_wav2vec2,
        )

        bundle = args.variant == "bundle"
        tm = (TorchCTC if bundle else TorchW2V).from_pretrained(args.model).eval()
        cfg = config_from_hf(tm.config, ctc=bundle)
        params = convert_wav2vec2(tm.state_dict(), cfg)
        del tm
        model = Wav2Vec2(cfg)

        # wrap jit ONCE so its trace cache persists across clips: compiles
        # only per distinct (audio_len, num_frames) shape pair, not per call
        apply_jit = jax.jit(model.apply, static_argnames="num_frames")
        apply_native_jit = jax.jit(model.apply)

        def featurize(wav: np.ndarray, num_frames: int) -> np.ndarray:
            if bundle:
                # full model at native 49 Hz, then interpolate the logits
                out = apply_native_jit({"params": params},
                                       jnp.asarray(wav)[None])
                return linear_interpolation_to_frames(
                    np.asarray(out[0]), num_frames
                )
            out = apply_jit({"params": params}, jnp.asarray(wav)[None],
                            num_frames=num_frames)
            return np.asarray(out[0])
    else:
        import torch
        from transformers import Wav2Vec2ForCTC, Wav2Vec2Model

        if args.variant == "bundle":
            model = Wav2Vec2ForCTC.from_pretrained(args.model).eval()

            def featurize(wav: np.ndarray, num_frames: int) -> np.ndarray:
                # emission logits at 49 Hz -> interpolate to the frame count
                with torch.no_grad():
                    logits = model(torch.from_numpy(wav)[None]).logits[0]
                return linear_interpolation_to_frames(logits.numpy(), num_frames)
        else:
            model = Wav2Vec2Model.from_pretrained(args.model).eval()

            def featurize(wav: np.ndarray, num_frames: int) -> np.ndarray:
                # CNN features (49 Hz) -> interpolate to the video frame count
                # -> projection -> transformer encoder
                with torch.no_grad():
                    x = torch.from_numpy(wav)[None]
                    feats = model.feature_extractor(x).transpose(1, 2)[0].numpy()
                    feats = linear_interpolation_to_frames(feats, num_frames)
                    hidden = model.feature_projection(
                        torch.from_numpy(feats)[None]
                    )[0]
                    return model.encoder(hidden).last_hidden_state[0].numpy()

    with open(args.tuples, "rb") as f:
        tuples = sorted(list(pickle.load(f)))
    os.makedirs(args.outdir, exist_ok=True)

    for i, (subj, emo, lvl, clip) in enumerate(tuples):
        wav = load_wav_16k(
            os.path.join(args.audio_root, subj, "audio", emo, lvl, f"{clip}.wav")
        )
        wav = np.asarray(
            extractor(wav, sampling_rate=16000)["input_values"][0], np.float32
        )
        frame_dir = os.path.join(
            args.frames_root, subj, "video", "front", emo, lvl, clip
        )
        num_frames = len(os.listdir(frame_dir))
        x = featurize(wav, num_frames)
        assert x.shape[0] == num_frames
        with open(os.path.join(args.outdir, f"{subj}_{emo}_{lvl}_{clip}.pkl"),
                  "wb") as f:
            pickle.dump(x, f, protocol=pickle.HIGHEST_PROTOCOL)
        print(f"[{i + 1}/{len(tuples)}] {subj}_{emo}_{lvl}_{clip}: {x.shape}")


if __name__ == "__main__":
    main()
