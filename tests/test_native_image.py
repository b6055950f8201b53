"""Native image pipeline (native/imagepipe.cc) vs the PIL path.

The native library must match dsml_thesis_tpu.data.datasets.load_image
to within decode/resample rounding (<= ~2/255 per pixel: PIL's fixed-point
filter weights vs fp64, and potentially different libjpeg builds), keep the
random-crop rng stream byte-identical, and fall back to PIL per file on
anything it cannot decode.
"""
import os

import numpy as np
import pytest

from PIL import Image

from dsml_thesis_tpu.data import datasets
from dsml_thesis_tpu.data import native_image

pytestmark = pytest.mark.skipif(
    not native_image.available(),
    reason="native imagepipe library unavailable (no toolchain?)",
)

TOL = 2.0 / 127.5  # 2 uint8 LSB in [-1, 1] units


def _save(tmp_path, name, arr, **kw):
    p = str(tmp_path / name)
    Image.fromarray(arr).save(p, **kw)
    return p


def _mk_rgb(w, h, seed=0):
    rs = np.random.RandomState(seed)
    a = (rs.rand(h, w, 3) * 255).astype(np.uint8)
    # genuinely smooth (same-size resize is a PIL no-op — go down 2x and
    # back up): raw noise maximizes cross-libjpeg decode deltas and would
    # make the 2-LSB parity tolerance flaky across libjpeg builds
    small = Image.fromarray(a).resize((max(1, w // 2), max(1, h // 2)),
                                      Image.BILINEAR)
    return np.asarray(small.resize((w, h), Image.BILINEAR))


def _both(monkeypatch, path, size, **kw):
    monkeypatch.setenv("DSML_NATIVE_IMAGE", "0")
    pil = datasets.load_image(path, size, **kw)
    monkeypatch.setenv("DSML_NATIVE_IMAGE", "1")
    nat = datasets.load_image(path, size, **kw)
    return pil, nat


@pytest.mark.parametrize("w,h,fmt", [
    (300, 200, "jpg"),   # landscape downscale
    (129, 257, "jpg"),   # odd dims, portrait
    (64, 48, "jpg"),     # upscale both axes
    (256, 256, "png"),
    (500, 123, "png"),   # extreme aspect
])
@pytest.mark.parametrize("size", [96, 128])
def test_center_crop_parity(tmp_path, monkeypatch, w, h, fmt, size):
    p = _save(tmp_path, f"a.{fmt}", _mk_rgb(w, h),
              **({"quality": 95} if fmt == "jpg" else {}))
    pil, nat = _both(monkeypatch, p, size)
    assert nat.shape == (size, size, 3) and nat.dtype == np.float32
    assert np.abs(pil - nat).max() <= TOL


def test_mode_conversion_parity(tmp_path, monkeypatch):
    """Grayscale JPEG and palette/RGBA PNG all go through the same
    convert-to-RGB semantics as PIL (alpha dropped, not composited)."""
    rs = np.random.RandomState(3)
    gray = (rs.rand(120, 160) * 255).astype(np.uint8)
    p_gray = _save(tmp_path, "g.jpg", gray, quality=95)

    rgba = (rs.rand(90, 110, 4) * 255).astype(np.uint8)
    p_rgba = _save(tmp_path, "r.png", rgba)

    pal = Image.fromarray(_mk_rgb(80, 70, seed=4)).convert(
        "P", palette=Image.ADAPTIVE)
    p_pal = str(tmp_path / "p.png")
    pal.save(p_pal)

    for p in (p_gray, p_rgba, p_pal):
        pil, nat = _both(monkeypatch, p, 64)
        assert np.abs(pil - nat).max() <= TOL, p


def test_probe_matches_pil_resized_dims(tmp_path):
    for (w, h) in [(300, 200), (129, 257), (64, 48), (97, 97)]:
        p = _save(tmp_path, f"d{w}x{h}.png", _mk_rgb(w, h, seed=w))
        for size in (32, 100, 256):
            scale = size / min(w, h)
            exp = (max(size, round(w * scale)), max(size, round(h * scale)))
            assert native_image.probe_resized(p, size) == exp


def test_random_crop_rng_stream_identical(tmp_path, monkeypatch):
    """With the same seeded RandomState, the native path draws the same
    crop offsets (from the header probe) as the PIL path does from the
    resized image — augmentation streams are byte-identical."""
    p = _save(tmp_path, "rc.png", _mk_rgb(420, 260, seed=5))
    monkeypatch.setenv("DSML_NATIVE_IMAGE", "0")
    pil = datasets.load_image(p, 128, random_crop=True,
                              rng=np.random.RandomState(7))
    monkeypatch.setenv("DSML_NATIVE_IMAGE", "1")
    nat = datasets.load_image(p, 128, random_crop=True,
                              rng=np.random.RandomState(7))
    assert np.abs(pil - nat).max() <= TOL
    # and the rng is left in the same state (same number of draws)
    r1, r2 = np.random.RandomState(7), np.random.RandomState(7)
    monkeypatch.setenv("DSML_NATIVE_IMAGE", "0")
    datasets.load_image(p, 128, random_crop=True, rng=r1)
    monkeypatch.setenv("DSML_NATIVE_IMAGE", "1")
    datasets.load_image(p, 128, random_crop=True, rng=r2)
    assert r1.randint(0, 1 << 30) == r2.randint(0, 1 << 30)


def test_fallback_to_pil_for_undecodable(tmp_path, monkeypatch):
    """A format the native library does not handle (BMP) must still load
    through the PIL fallback with the env flag on."""
    arr = _mk_rgb(100, 80, seed=6)
    p = str(tmp_path / "x.bmp")
    Image.fromarray(arr).save(p)
    pil, nat = _both(monkeypatch, p, 64)
    np.testing.assert_array_equal(pil, nat)  # same backend both times


def test_16bit_png_refused_falls_back(tmp_path, monkeypatch):
    """16-bit PNGs decode differently in the two stacks (PIL clamps I;16 ->
    RGB at 255, libpng would rescale 16->8): the native library must refuse
    them so both env settings produce the identical PIL result."""
    arr16 = (np.linspace(0, 65535, 80 * 60).reshape(60, 80)).astype(np.uint16)
    p = str(tmp_path / "deep.png")
    Image.fromarray(arr16, mode="I;16").save(p)
    assert native_image.load_image_native(p, 32) is None  # refused
    pil, nat = _both(monkeypatch, p, 32)
    np.testing.assert_array_equal(pil, nat)  # same (PIL) backend both times


def test_absurd_header_returns_error_not_crash(tmp_path):
    """A file whose header claims huge dimensions must come back as a
    failed status (exceptions cannot cross the ctypes boundary)."""
    import struct
    import zlib

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IEND", b""))
    p = str(tmp_path / "bomb.png")
    with open(p, "wb") as f:
        f.write(data)
    assert native_image.load_image_native(p, 64) is None  # error, no abort
    out = native_image.load_image_batch([p], 64, threads=2)
    assert out is not None and out[1][0] < 0


def test_batch_api_and_status(tmp_path):
    good = [_save(tmp_path, f"b{i}.jpg", _mk_rgb(160, 120, seed=i), quality=95)
            for i in range(3)]
    bad = str(tmp_path / "missing.jpg")
    out = native_image.load_image_batch(good + [bad], 64, threads=2)
    assert out is not None
    imgs, status = out
    assert imgs.shape == (4, 64, 64, 3)
    assert (status[:3] == 0).all() and status[3] < 0
    for i, p in enumerate(good):
        single = native_image.load_image_native(p, 64)
        np.testing.assert_array_equal(imgs[i], single)
    with pytest.raises(ValueError):
        native_image.load_image_batch(good, 64,
                                      crop_xy=np.zeros((2, 2), np.int32))


def test_load_images_helper_backends_agree(tmp_path, monkeypatch):
    """data.load_images (the CLI batch entry) matches the PIL loop and
    refills undecodable rows through the fallback."""
    good = [_save(tmp_path, f"h{i}.jpg", _mk_rgb(160, 120, seed=i), quality=95)
            for i in range(3)]
    bmp = str(tmp_path / "h.bmp")  # native can't decode; PIL refills
    Image.fromarray(_mk_rgb(100, 90, seed=9)).save(bmp)
    paths = good + [bmp]
    monkeypatch.setenv("DSML_NATIVE_IMAGE", "0")
    pil = datasets.load_images(paths, 64)
    monkeypatch.setenv("DSML_NATIVE_IMAGE", "1")
    nat = datasets.load_images(paths, 64)
    assert nat.shape == (4, 64, 64, 3)
    assert np.abs(pil - nat).max() <= TOL


def test_batch_random_crops_match_single(tmp_path):
    p = _save(tmp_path, "c.png", _mk_rgb(300, 200, seed=8))
    w, h = native_image.probe_resized(p, 96)
    xy = np.asarray([[0, 0], [w - 96, h - 96]], np.int32)
    imgs, status = native_image.load_image_batch([p, p], 96, crop_xy=xy)
    assert (status == 0).all()
    for i in range(2):
        single = native_image.load_image_native(p, 96, tuple(xy[i]))
        np.testing.assert_array_equal(imgs[i], single)
    assert np.abs(imgs[0] - imgs[1]).max() > 0  # different crops
