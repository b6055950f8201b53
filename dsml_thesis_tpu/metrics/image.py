"""Image quality metrics in jnp: PSNR, SSIM (+ MSE/MAE helpers).

Parity targets: the reference computes PSNR/SSIM via piq with data_range=1,
images mapped from [-1,1] to [0,1] (face_reenactment/manipulation_metrics.py:13-77,
talking_face/image_metrics.py:21-60). SSIM follows the standard Wang et al.
formulation (11x11 gaussian window, k1=0.01, k2=0.03), matching piq defaults.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_unit_range(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1], clipped (reference metric scripts do (x+1)/2)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR over NHWC batches."""
    mse = jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    k = np.outer(g, g)
    return jnp.asarray(k, dtype=jnp.float32)


def _filter2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' 2-D filter over NHWC."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], kernel.shape + (1, c))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
         k1: float = 0.01, k2: float = 0.03,
         downsample: bool = True) -> jnp.ndarray:
    """Per-image SSIM over NHWC batches (11x11 gaussian, sigma 1.5).

    downsample=True applies piq's default pre-pooling: average-pool by
    f = max(1, round(min(H, W) / 256)) before filtering — a no-op at the
    reference's 128/256px but required for piq parity on larger images."""
    if downsample:
        f = max(1, round(min(a.shape[1], a.shape[2]) / 256))
        if f > 1:
            pool = lambda x: jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, f, f, 1), (1, f, f, 1), "VALID"
            ) / (f * f)
            a, b = pool(a), pool(b)
    kernel = _gaussian_kernel()
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _filter2d(a, kernel)
    mu_b = _filter2d(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _filter2d(a * a, kernel) - mu_aa
    sigma_bb = _filter2d(b * b, kernel) - mu_bb
    sigma_ab = _filter2d(a * b, kernel) - mu_ab
    ssim_map = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """CSIM building block (identity embeddings, csim.py:17-77)."""
    # eps matches torch F.cosine_similarity's clamp: a zero embedding (a
    # fully masked crop) must contribute 0, not NaN-poison the batch mean
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=axis, keepdims=True), 1e-8)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=axis, keepdims=True), 1e-8)
    return jnp.sum(an * bn, axis=axis)
