"""Photometric losses: masked L1 and window-11 SSIM.

Matches the reference ``utils/loss_utils.py`` semantics exactly, including the
quirk that the SSIM mask is applied *multiplicatively to both images before*
the SSIM windows are computed (``loss_utils.py:44-46``).

The SSIM blur is implemented as two banded-matrix matmuls on the MXU
(blur along an axis == multiply by a banded Toeplitz matrix). A/B on TPU at
the s2 production shape (4×15×1280×940, fwd+bwd wrt img1,
`scripts/profile_ssim.py`):

    grouped depthwise conv   28.6 ms
    shifted multiply-adds    31.4 ms  (and MISCOMPILES on TPU: wrong value;
                                       correct on CPU — do not use)
    banded matmul             8.6 ms  ← this implementation

The dense band burns ~85× the minimal FLOPs but rides the MXU at full tilt,
and its VJP is the transposed matmul — same speed backward.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(network_output: jnp.ndarray, gt: jnp.ndarray, mask=None) -> jnp.ndarray:
    if mask is None:
        return jnp.abs(network_output - gt).mean()
    return jnp.abs((network_output - gt) * mask).mean()


def l2_loss(network_output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((network_output - gt) ** 2).mean()


@functools.lru_cache(maxsize=8)
def _gaussian_window_np(window_size: int, sigma: float):
    gauss = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / float(2 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    return gauss / gauss.sum()


@functools.lru_cache(maxsize=16)
def _band_matrix_np(size: int, window_size: int, sigma: float):
    """(size, size) banded Toeplitz blur matrix; rows index source pixels,
    columns destination pixels. Zero rows outside the band reproduce SAME
    zero-padding exactly."""
    w = _gaussian_window_np(window_size, sigma)
    pad = window_size // 2
    band = np.zeros((size, size), np.float32)
    for k in range(window_size):
        off = k - pad
        d = np.arange(max(0, -off), min(size, size - off))
        band[d, d + off] = w[k]
    return band


def _blur(img: jnp.ndarray, window_size: int, sigma: float = 1.5,
          fast: bool = False) -> jnp.ndarray:
    """Depthwise separable gaussian blur of (N,C,H,W) with SAME padding,
    as two MXU matmuls (see module docstring for the TPU A/B).

    Precision must NOT be default: the TPU default rounds matmul INPUTS to
    bf16 (`preferred_element_type` only widens the accumulator), putting
    ~2e-3 absolute error on the blurred moments — bigger than SSIM's
    C2 = 9e-4 — so sigma1_sq+sigma2_sq crosses -C2 and the ratio explodes
    on real render-vs-GT pairs (the r4 prod drive logged eval_ssim = -4.73;
    the controlled re-run measured 0.0434 vs 0.9952, MEASUREMENTS.md "SSIM
    precision root cause"). Two correct modes, A/B'd on the s2 production
    shape (scripts/profile_ssim.py, fwd+bwd of the full ssim()):
      HIGHEST      26.2 ms, |d - f64| = 2.1e-6  (metric-grade; default)
      fast (X3)    15.9 ms, |d - f64| = 3.5e-3 worst-case on an
                   adversarial flat+noise pair (gradient-grade; the
                   training losses opt in — SGD noise dwarfs 3.5e-3 on a
                   loss TERM, and the r4 drive converged to PSNR 33.9/35.2
                   with a blur that was off by 1.75 ABSOLUTE)."""
    bh = jnp.asarray(_band_matrix_np(img.shape[2], window_size, sigma))
    bw = jnp.asarray(_band_matrix_np(img.shape[3], window_size, sigma))
    prec = (jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3 if fast
            else jax.lax.Precision.HIGHEST)
    out = jnp.einsum("nchw,wv->nchv", img, bw,
                     preferred_element_type=jnp.float32, precision=prec)
    return jnp.einsum("nchw,hg->ncgw", out, bh,
                      preferred_element_type=jnp.float32, precision=prec)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, mask=None, window_size: int = 11,
         size_average: bool = True, fast: bool = False) -> jnp.ndarray:
    """SSIM over (C,H,W) or (N,C,H,W) images; reference ``loss_utils.py:36-69``.

    ``fast=True`` runs the blur at the 3-pass bf16 dot algorithm (see
    ``_blur``): ~1.6× faster fwd+bwd, ≤3.5e-3 worst-case value error — used
    by the s2/s3 TRAINING LOSSES only; metrics/eval keep the exact default.

    Inputs are force-cast to f32 BEFORE any products: a bf16 image makes
    ``img1*img1`` round in bf16, which breaks the Cauchy–Schwarz guarantee
    sigma² ≥ 0 by ~2e-3 > C2 = 9e-4 and explodes the ratio on flat/bright
    regions. This was the r4 production-drive bug (eval_ssim = −4.73 /
    +1.217; SSIM is bounded by [−1,1]): the s3 eval render reached this
    function as bf16. Measured on a 512² flat pair: f32 +0.9990,
    bf16/bf16 −17.30, bf16/f32 +1.2027 (matches the logged +1.217).
    The reference computes SSIM in full f32 (utils/loss_utils.py:36-69);
    regression-tested by ``tests/test_foundation.py`` (bf16 + f64 oracle)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
        if mask is not None:
            mask = mask[None]
    if mask is not None:
        mask = mask.astype(jnp.float32)
        img1 = img1 * mask
        img2 = img2 * mask

    # one blur over the 5 stacked maps instead of 5 separate blurs: one pair
    # of matmuls with a 5× wider batch dim instead of five pairs
    c = img1.shape[1]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=1)
    b = _blur(stacked, window_size, fast=fast)
    mu1, mu2 = b[:, 0:c], b[:, c:2 * c]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = b[:, 2 * c:3 * c] - mu1_sq
    sigma2_sq = b[:, 3 * c:4 * c] - mu2_sq
    sigma12 = b[:, 4 * c:5 * c] - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    # f32 like ssim(): an all-bf16 pair would compute the MSE in bf16
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
