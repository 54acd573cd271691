"""Photometric losses: masked L1 and window-11 SSIM.

Matches the reference ``utils/loss_utils.py`` semantics exactly, including the
quirk that the SSIM mask is applied *multiplicatively to both images before*
the SSIM windows are computed (``loss_utils.py:44-46``).

The SSIM blur is implemented as two separable depthwise 1-D convolutions
(`lax.conv_general_dilated` with feature_group_count) — XLA maps these onto
the TPU convolution units and fuses the surrounding elementwise algebra.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def l1_loss(network_output: jnp.ndarray, gt: jnp.ndarray, mask=None) -> jnp.ndarray:
    if mask is None:
        return jnp.abs(network_output - gt).mean()
    return jnp.abs((network_output - gt) * mask).mean()


def l2_loss(network_output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((network_output - gt) ** 2).mean()


@functools.lru_cache(maxsize=8)
def _gaussian_window_np(window_size: int, sigma: float):
    import numpy as np

    gauss = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / float(2 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    return gauss / gauss.sum()


def _gaussian_window(window_size: int, sigma: float):
    # cache plain numpy: caching a jnp array here would leak tracers when the
    # first call happens inside a jit trace
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def _blur(img: jnp.ndarray, window: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Depthwise separable gaussian blur of (N,C,H,W) with SAME padding."""
    c = img.shape[1]
    pad = window_size // 2
    kh = jnp.tile(window.reshape(1, 1, window_size, 1), (c, 1, 1, 1))
    kw = jnp.tile(window.reshape(1, 1, 1, window_size), (c, 1, 1, 1))
    dn = lax.conv_dimension_numbers(img.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(img, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
                                   feature_group_count=c)
    out = lax.conv_general_dilated(out, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
                                   feature_group_count=c)
    return out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, mask=None, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """SSIM over (C,H,W) or (N,C,H,W) images; reference ``loss_utils.py:36-69``."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
        if mask is not None:
            mask = mask[None]
    if mask is not None:
        img1 = img1 * mask
        img2 = img2 * mask

    window = _gaussian_window(window_size, 1.5)
    mu1 = _blur(img1, window, window_size)
    mu2 = _blur(img2, window, window_size)

    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window, window_size) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window, window_size) - mu2_sq
    sigma12 = _blur(img1 * img2, window, window_size) - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
