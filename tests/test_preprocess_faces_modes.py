"""detect-crop / openface modes of preprocess_faces.py (detector stubbed).

Reference behaviors: face_reenactment/scripts/face_detection.py:15-26
(detector bbox crop, `<label>_<name>` output, labels 0..7 only) and
scripts/affectnet_openface.py:12-22 (FaceLandmarkImg command per CSV row).
"""
import csv
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "preprocess_faces", os.path.join(REPO, "scripts", "preprocess_faces.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_csv(tmp_path, rows):
    p = tmp_path / "list.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["subDirectory_filePath", "expression",
                                          "face_x", "face_y", "face_width",
                                          "face_height"])
        w.writeheader()
        w.writerows(rows)
    return str(p)


def test_detect_crop_mode(tmp_path, monkeypatch):
    # fake mtcnn package: box at (4, 2) size 6x8
    fake = types.ModuleType("mtcnn")

    class MTCNN:
        def detect_faces(self, img):
            return [{"box": [4, 2, 6, 8]}]

    fake.MTCNN = MTCNN
    monkeypatch.setitem(sys.modules, "mtcnn", fake)

    imgdir = tmp_path / "imgs" / "sub"
    os.makedirs(imgdir)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    Image.fromarray(img).save(imgdir / "a.png")
    Image.fromarray(img).save(imgdir / "b.png")

    csv_path = _write_csv(tmp_path, [
        {"subDirectory_filePath": "sub/a.png", "expression": 3,
         "face_x": 0, "face_y": 0, "face_width": 8, "face_height": 8},
        {"subDirectory_filePath": "sub/b.png", "expression": 9,  # filtered
         "face_x": 0, "face_y": 0, "face_width": 8, "face_height": 8},
        {"subDirectory_filePath": "sub/missing.png", "expression": 1,
         "face_x": 0, "face_y": 0, "face_width": 8, "face_height": 8},
    ])

    mod = _load_module()
    args = types.SimpleNamespace(csv=csv_path, images=str(tmp_path / "imgs"),
                                 outdir=str(tmp_path / "out"), device="cpu")
    mod.run_detect_crop(args)

    out = sorted(os.listdir(tmp_path / "out"))
    assert out == ["3_a.png"]  # label prefix; 9 filtered; missing skipped
    crop = np.asarray(Image.open(tmp_path / "out" / "3_a.png"))
    assert crop.shape == (8, 6, 3)  # img[y:y+h, x:x+w]
    np.testing.assert_array_equal(crop, img[2:10, 4:10])


def test_openface_mode_builds_commands(tmp_path, monkeypatch):
    imgdir = tmp_path / "imgs" / "sub"
    os.makedirs(imgdir)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(imgdir / "a.png")
    csv_path = _write_csv(tmp_path, [
        {"subDirectory_filePath": "sub/a.png", "expression": 0,
         "face_x": 0, "face_y": 0, "face_width": 8, "face_height": 8},
    ])

    mod = _load_module()
    calls = []
    import subprocess  # run_openface imports the same module object

    monkeypatch.setattr(subprocess, "run", lambda cmd, check: calls.append(cmd))
    args = types.SimpleNamespace(csv=csv_path, images=str(tmp_path / "imgs"),
                                 outdir=str(tmp_path / "out"),
                                 openface_bin="/fake/FaceLandmarkImg")
    mod.run_openface(args)
    assert len(calls) == 1
    cmd = calls[0]
    assert cmd[0] == "/fake/FaceLandmarkImg"
    assert "-aus" in cmd and "-simalign" in cmd and "128" in cmd
    assert any(c.endswith("sub/a.png") for c in cmd)
