"""MEAD preprocessing geometry (detector-independent stages).

Reference logic re-derived: mead_crop.py square bbox padding/squaring,
mask.py's 128px SmallestMaxSize+CenterCrop preprocessing, and crop_mouth.py's
72->88px mouth-ROI cut with the 5px bias threshold.
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from preprocess_mead import (  # noqa: E402
    cut_mouth_sequence,
    smallest_max_center_crop,
    square_bbox,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_square_bbox():
    kpt = np.zeros((68, 2), np.float32)
    kpt[:, 0] = np.linspace(50, 90, 68)   # w = 40 (+20 margin -> 60)
    kpt[:, 1] = np.linspace(100, 200, 68)  # h = 100 (+20 -> 120)
    x1, y1, x2, y2 = square_bbox(kpt)
    assert (y1, y2) == (90, 210)
    # width padded out to the square size (60 -> 120 via +-30)
    assert x2 - x1 == 120
    assert (x1, x2) == (10, 130)
    # clamping at 0
    kpt2 = kpt.copy()
    kpt2[:, 0] -= 60
    x1, _, _, _ = square_bbox(kpt2)
    assert x1 == 0


def test_smallest_max_center_crop():
    img = np.zeros((100, 200, 3), np.uint8)
    img[:, 100] = 255  # vertical center line survives the center crop
    out = smallest_max_center_crop(img, 64)
    assert out.shape == (64, 64, 3)
    assert out[:, 32].mean() > 100


def test_cut_mouth_sequence_and_threshold():
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (3, 128, 128, 3), dtype=np.uint8)
    lms = np.zeros((3, 68, 2), np.float32)
    lms[:, 48:68, 0] = 64.0
    lms[:, 48:68, 1] = 80.0
    out = cut_mouth_sequence(frames, lms, crop=72, out_size=88)
    assert out.shape == (3, 88, 88, 3)
    # centroid far outside the frame -> bias error like the reference
    lms_bad = lms.copy()
    lms_bad[:, 48:68, 1] = -80.0
    with pytest.raises(ValueError, match="bias"):
        cut_mouth_sequence(frames, lms_bad, crop=72, out_size=88)


def test_mouth_cli_over_synthetic_tree(tmp_path):
    root = tmp_path / "mead"
    lm_dir = root / "M001" / "landmarks" / "front" / "happy" / "level_1" / "001"
    os.makedirs(lm_dir)
    F = 4
    lm = np.zeros((68, 2), np.float32)
    lm[48:68, 0] = 64
    lm[48:68, 1] = 80
    for k in range(F):
        with open(lm_dir / f"{k:03d}.pkl", "wb") as f:
            pickle.dump(lm, f)
    vid = {"video": np.zeros((F, 128, 128, 3), np.float32),
           "info": {"subj": "M001", "human_label": "happy",
                    "lvl": "level_1", "nbr": "001"}}
    with open(tmp_path / "vid.pkl", "wb") as f:
        pickle.dump(vid, f)

    r = subprocess.run(
        [sys.executable, "scripts/preprocess_mead.py", "mouth",
         "--videos", str(tmp_path / "vid.pkl"), "--src", str(root),
         "--out", str(tmp_path / "mouths")],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    out = np.load(tmp_path / "mouths" /
                  "subj=M001_emo=happy_lvl=level_1_nbr=001.npy")
    assert out.shape == (F, 88, 88, 3)


def _stub_align_deps():
    """align/align.py imports dlib/imutils/skimage/etc at module level; the
    FaceAligner geometry under test touches none of them (dlib only in
    __init__, stubbed to no-ops)."""
    import types

    def mod(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    mod("dlib", get_frontal_face_detector=lambda: None,
        shape_predictor=lambda p: None)
    mod("imutils")
    mod("matplotlib", use=lambda *a, **k: None)
    mod("matplotlib.pyplot")
    sk = mod("skimage")
    sk.io = mod("skimage.io", imread=None, imsave=None)
    sk.transform = mod("skimage.transform", rescale=None,
                       estimate_transform=None, warp=None, resize=None)
    mod("face_alignment")
    mod("tqdm", tqdm=lambda x, *a, **k: x)


def test_reference_eye_rotation_oracle():
    """Exact parity with the reference FaceAligner.align (incl. its swapped
    eye table and the cv2-matrix-into-scipy coordinate quirk)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from reference_oracle import reference_available

    if not reference_available():
        pytest.skip("reference tree not mounted")
    _stub_align_deps()
    import cv2

    # newer cv2 rejects numpy-int rotation centers; coerce (env shim only)
    orig_rot = cv2.getRotationMatrix2D

    def _rot(center, angle, scale=1.0):
        return orig_rot((float(center[0]), float(center[1])),
                        float(angle), scale)

    cv2.getRotationMatrix2D = _rot
    sys.path.insert(0, "/root/reference/face_reenactment/align")
    from align import FaceAligner

    from dsml_thesis_tpu.data.align import reference_eye_rotation

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (96, 96, 3), dtype=np.uint8).astype(np.float64)
    lm = np.zeros((68, 2), np.float32)
    # tilted eyes: reference right_eye=36:42, left_eye=42:48
    lm[36:42] = [30, 40]
    lm[42:48] = [60, 48]
    lm[36:42, 0] += np.arange(6)  # non-degenerate clusters
    lm[42:48, 0] += np.arange(6)

    fa = FaceAligner(desiredFaceWidth=96)
    ref = fa.align(img.copy(), shape=lm.copy())
    ours = reference_eye_rotation(img, lm)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_affectnet_square_crop():
    from dsml_thesis_tpu.data.align import affectnet_square_crop

    img = np.arange(100 * 120 * 3, dtype=np.uint8).reshape(100, 120, 3)
    # tall box: width extended one-sidedly
    out = affectnet_square_crop(img, (50, 10, 70, 60))
    assert out.shape[0] == 50 and out.shape[1] == 50  # 20 wide -> 35..85 slice
    # wide box: height extended
    out = affectnet_square_crop(img, (10, 40, 70, 60))
    assert out.shape[1] == 60 and out.shape[0] == 60
    # square box unchanged
    out = affectnet_square_crop(img, (10, 10, 40, 40))
    assert out.shape[:2] == (30, 30)
