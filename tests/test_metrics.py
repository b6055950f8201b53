"""Image metric tests (cross-checked against torch/piq-style formulas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsml_thesis_tpu.metrics import cosine_similarity, psnr, ssim, to_unit_range


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.ones((1, 8, 8, 3)) * 0.1
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    np.testing.assert_allclose(float(psnr(a, b)[0]), 20.0, rtol=1e-5)


def test_psnr_identical_is_large():
    a = jnp.ones((2, 8, 8, 3)) * 0.3
    assert float(psnr(a, a).min()) > 100


def test_ssim_identical_is_one():
    a = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    a = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    small = a + 0.01 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
    big = a + 0.3 * jax.random.normal(jax.random.PRNGKey(2), a.shape)
    s_small = float(ssim(jnp.clip(a, 0, 1), jnp.clip(small, 0, 1))[0])
    s_big = float(ssim(jnp.clip(a, 0, 1), jnp.clip(big, 0, 1))[0])
    assert 1 > s_small > s_big


def test_ssim_matches_vendored_skimage_golden():
    """skimage.metrics.structural_similarity's exact algorithm (gaussian
    weights sigma=1.5, truncate=3.5 -> 11x11 window, population covariance,
    pad-cropped mean) re-derived in ~20 lines of numpy so the cross-check
    runs even where skimage isn't installed. Because the crop margin equals
    the kernel radius (5), every retained pixel's filter support is fully
    in-bounds — boundary mode is irrelevant and a separable 'valid'
    correlation reproduces skimage bit-for-bit at fp64."""
    rs = np.random.RandomState(0)
    a = rs.rand(1, 64, 64, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rs.randn(1, 64, 64, 3).astype(np.float32), 0, 1)

    r = np.arange(-5, 6, dtype=np.float64)
    k = np.exp(-(r ** 2) / (2 * 1.5 ** 2))
    k /= k.sum()

    def filt(x):  # separable valid gaussian over [H, W]
        x = np.apply_along_axis(lambda v: np.convolve(v, k, "valid"), 0, x)
        return np.apply_along_axis(lambda v: np.convolve(v, k, "valid"), 1, x)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    vals = []
    for ch in range(3):
        x, y = a[0, :, :, ch].astype(np.float64), b[0, :, :, ch].astype(np.float64)
        ux, uy = filt(x), filt(y)
        vx = filt(x * x) - ux * ux
        vy = filt(y * y) - uy * uy
        vxy = filt(x * y) - ux * uy
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux * ux + uy * uy + c1) * (vx + vy + c2))
        vals.append(s.mean())
    golden = float(np.mean(vals))

    ours = float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage.metrics")
    rs = np.random.RandomState(0)
    a = rs.rand(1, 64, 64, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rs.randn(1, 64, 64, 3).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
    ref = skimage.structural_similarity(
        a[0], b[0], channel_axis=-1, data_range=1.0, gaussian_weights=True,
        sigma=1.5, use_sample_covariance=False,
    )
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_cosine_similarity():
    a = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    b = jnp.array([[1.0, 0.0], [-1.0, -1.0]])
    out = np.asarray(cosine_similarity(a, b))
    np.testing.assert_allclose(out, [1.0, -1.0], atol=1e-6)


def test_to_unit_range():
    x = jnp.array([-1.0, 0.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(to_unit_range(x)), [0, 0.5, 1, 1])
