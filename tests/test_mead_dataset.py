"""MEAD dataset field-for-field parity against the reference logic.

The reference MEADBase3/5 (talking_face/taming/data/custom.py:334-421) cannot
be driven directly (hardcoded cluster paths + albumentations dep), so the
expectations below re-derive its formulas independently on a synthetic tree:
  - masked image: rows >= min(mouth_y)-5 set to -1 (:362-364, :371)
  - masked_landmarks: clip(landmarks[0:48], 0, 128)/64 - 1, raveled (:368-370)
  - mean-landmark fallback when a frame's landmark pickle is empty (:366-367)
  - audio window: edge-clamped [t-w, t+w] (:394-396)
  - sample mode: all frames stacked, full audio, anchor 0; force_align pins
    the identity frame to 0 (:349-358)
"""
import os
import pickle

import numpy as np
import pytest

from test_video_cli import _build_tree

from dsml_thesis_tpu.data.datasets import MEADTalkingFace, EMOTION2LABEL


SIZE = 16


@pytest.fixture()
def tree(tmp_path):
    root = str(tmp_path / "mead")
    os.makedirs(root)
    tuples_path, audio_dir = _build_tree(root, n_clips=2, frames=4, size=SIZE)
    return root, tuples_path, audio_dir


def test_sample_mode_fields(tree):
    root, tuples_path, audio_dir = tree
    ds = MEADTalkingFace(tuples_path, root, audio_dir, audio_window=1,
                         size=SIZE, mode="sample", force_align=True)
    ex = ds[0]
    n = int(ex["num_frames"])
    assert n == 4
    assert ex["masked_image"].shape == (n, SIZE, SIZE, 3)
    assert ex["masked_landmarks"].shape == (n, 96)
    assert ex["audio"].shape[0] == n
    assert int(ex["identity_idx"]) == 0  # force_align
    assert int(ex["frame_idx"]) == 0
    assert int(ex["class_label"]) == EMOTION2LABEL["happy"]

    # reference mask rule: rows >= min(mouth_y) - 5 blanked to -1
    lm_dir = os.path.join(root, "M001", "landmarks", "front", "happy",
                          "level_1", "000")
    with open(os.path.join(lm_dir, "000.pkl"), "rb") as f:
        lm = pickle.load(f)
    min_y = int(np.min(lm[48:68, 1])) - 5
    m0 = ex["masked_image"][0]
    assert (m0[max(min_y, 0):] == -1.0).all()
    assert not (m0[: max(min_y, 0)] == -1.0).all()

    # reference masked_landmarks normalization
    want = np.clip(lm[0:48].astype(np.float32), 0, SIZE) / (SIZE / 2) - 1.0
    np.testing.assert_allclose(ex["masked_landmarks"][0], want.ravel(),
                               atol=1e-6)


def test_train_mode_audio_window_and_landmarks(tree):
    root, tuples_path, audio_dir = tree
    ds = MEADTalkingFace(tuples_path, root, audio_dir, audio_window=2,
                         size=SIZE, mode="train", include_landmarks=True,
                         seed=3)
    ex = ds[1]
    t = int(ex["frame_idx"])
    assert ex["audio"].shape[0] == 5  # 2w+1
    assert ex["masked_landmarks"].shape == (96,)
    assert ex["landmarks"].shape == (68, 2)

    with open(os.path.join(audio_dir, "M001_happy_level_1_001.pkl"), "rb") as f:
        feats = pickle.load(f)
    idx = [min(max(t + i, 0), len(feats) - 1) for i in range(-2, 3)]
    np.testing.assert_allclose(ex["audio"], feats[idx], atol=1e-6)


def test_mean_landmark_fallback(tree):
    root, tuples_path, audio_dir = tree
    # empty landmark pickle for frame 0 of clip 000 -> load returns None
    lm_dir = os.path.join(root, "M001", "landmarks", "front", "happy",
                          "level_1", "000")
    open(os.path.join(lm_dir, "000.pkl"), "w").close()
    mean_lm = np.full((68, 2), 7.0, np.float32)
    with open(os.path.join(root, "mean_landmarks.pkl"), "wb") as f:
        pickle.dump(mean_lm, f)

    ds = MEADTalkingFace(tuples_path, root, audio_dir, audio_window=1,
                         size=SIZE, mode="sample", force_align=True)
    ex = ds[0]
    # fallback mask line: size // 2 (reference hardcodes 64 at size 128)
    assert (ex["masked_image"][0][SIZE // 2:] == -1.0).all()
    assert not (ex["masked_image"][0][: SIZE // 2] == -1.0).all()
    # masked_landmarks come from the dataset mean
    want = (np.clip(mean_lm[0:48], 0, SIZE) / (SIZE / 2) - 1.0).ravel()
    np.testing.assert_allclose(ex["masked_landmarks"][0], want, atol=1e-6)
    # frame 1 still uses its own landmarks
    with open(os.path.join(lm_dir, "001.pkl"), "rb") as f:
        lm1 = pickle.load(f)
    want1 = (np.clip(lm1[0:48].astype(np.float32), 0, SIZE)
             / (SIZE / 2) - 1.0).ravel()
    np.testing.assert_allclose(ex["masked_landmarks"][1], want1, atol=1e-6)


def test_audio_frame_count_mismatch_raises(tree):
    """Reference invariant custom.py:343: one audio row per frame — a
    truncated pickle must fail fast, not silently misalign conditioning."""
    root, tuples_path, audio_dir = tree
    ds = MEADTalkingFace(tuples_path, root, audio_dir, audio_window=1,
                         size=SIZE, mode="train")
    subj, emotion, lvl, nbr = ds.tuples[0]
    p = os.path.join(audio_dir, f"{subj}_{emotion}_{lvl}_{nbr}.pkl")
    with open(p, "rb") as f:
        feats = pickle.load(f)
    with open(p, "wb") as f:
        pickle.dump(feats[:-1], f)  # truncate one row
    with pytest.raises(AssertionError, match="audio feature rows"):
        ds[0]


def test_missing_landmark_pickle_raises(tree):
    """A MISSING landmark pickle raises (reference load_pickle calls
    os.path.getsize unconditionally, custom.py:364); only an EMPTY file
    falls back to mean landmarks — a never-generated landmarks tree must
    not silently train on the mean-landmark mask."""
    root, tuples_path, audio_dir = tree
    ds = MEADTalkingFace(tuples_path, root, audio_dir, audio_window=1,
                         size=SIZE, mode="train", force_align=True)
    subj, emotion, lvl, nbr = ds.tuples[0]
    lm_dir = os.path.join(root, subj, "landmarks", "front", emotion, lvl, nbr)
    for f in os.listdir(lm_dir):
        os.remove(os.path.join(lm_dir, f))
    with pytest.raises(FileNotFoundError):
        ds[0]


def test_random_crop_forwarded(tree):
    """MEADBase3 must forward random_crop (the reference supports it,
    custom.py:303-306) instead of silently center-cropping."""
    from dsml_thesis_tpu.data.datasets import MEADBase3

    root, tuples_path, audio_dir = tree
    ds = MEADBase3(1, size=SIZE, tuples_path=tuples_path, data_root=root,
                   audio_dir=audio_dir, random_crop=True, seed=7)
    assert ds.random_crop is True and ds.seed == 7
    ex = ds[0]  # smoke: the random-crop path decodes fine
    assert ex["image"].shape == (SIZE, SIZE, 3)
