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


_BLOCK = 128


@functools.lru_cache(maxsize=16)
def _band_blocks_np(size: int, window_size: int, sigma: float):
    """(nc,128,128) diagonal/upper/lower block stacks of the 128-padded band
    matrix: the band is block-tridiagonal at 128-blocks (window 11 ≪ 128),
    so `x @ band` = 3 batched (…,128)@(128,128) matmuls at 3·128/size of the
    dense FLOPs (≈0.3× at production heights)."""
    nc = -(-size // _BLOCK)
    sp = nc * _BLOCK
    b = np.zeros((sp, sp), np.float32)
    b[:size, :size] = _band_matrix_np(size, window_size, sigma)
    zero = np.zeros((_BLOCK, _BLOCK), np.float32)
    D = np.stack([b[c * _BLOCK:(c + 1) * _BLOCK, c * _BLOCK:(c + 1) * _BLOCK]
                  for c in range(nc)])
    U = np.stack([b[(c - 1) * _BLOCK:c * _BLOCK, c * _BLOCK:(c + 1) * _BLOCK]
                  if c > 0 else zero for c in range(nc)])
    L = np.stack([b[(c + 1) * _BLOCK:(c + 2) * _BLOCK, c * _BLOCK:(c + 1) * _BLOCK]
                  if c + 1 < nc else zero for c in range(nc)])
    return D, U, L, nc, sp


def _blur_block_axis(x: jnp.ndarray, size: int, window_size: int, sigma: float,
                     precision) -> jnp.ndarray:
    """Blur the LAST axis of ``x`` by the banded matrix in block-tridiagonal
    form (see ``_band_blocks_np``); numerically identical to the dense
    ``x @ band`` at the same dot precision (same products, same adds per
    output up to the 3-term regroup)."""
    D, U, L, nc, sp = _band_blocks_np(size, window_size, sigma)
    D, U, L = jnp.asarray(D), jnp.asarray(U), jnp.asarray(L)
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, sp - size)])
    xc = x.reshape(*x.shape[:-1], nc, _BLOCK)
    zeros = jnp.zeros_like(xc[..., :1, :])
    xprev = jnp.concatenate([zeros, xc[..., :-1, :]], axis=-2)
    xnext = jnp.concatenate([xc[..., 1:, :], zeros], axis=-2)
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    y = (jnp.einsum("...ck,ckv->...cv", xc, D, **kw)
         + jnp.einsum("...ck,ckv->...cv", xprev, U, **kw)
         + jnp.einsum("...ck,ckv->...cv", xnext, L, **kw))
    return y.reshape(*x.shape[:-1], sp)[..., :size]


def _blur(img: jnp.ndarray, window_size: int, sigma: float = 1.5) -> jnp.ndarray:
    """Depthwise separable gaussian blur of (N,C,H,W) with SAME padding,
    as two MXU matmuls (see module docstring for the TPU A/B).

    Precision is pinned to HIGHEST for portability: on TPU generations where
    the default matmul precision rounds f32 INPUTS to bf16
    (`preferred_element_type` only widens the accumulator), the blurred
    moments would carry ~2e-3 absolute error — bigger than SSIM's
    C2 = 9e-4 — and sigma1_sq+sigma2_sq could cross -C2. On the current
    chip default precision measures f32-exact (probe_ssim_precision.py), so
    HIGHEST costs nothing here; see MEASUREMENTS.md "SSIM bf16 fix (r5)"."""
    bh = jnp.asarray(_band_matrix_np(img.shape[2], window_size, sigma))
    bw = jnp.asarray(_band_matrix_np(img.shape[3], window_size, sigma))
    out = jnp.einsum("nchw,wv->nchv", img, bw,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nchw,hg->ncgw", out, bh,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, mask=None, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """SSIM over (C,H,W) or (N,C,H,W) images; reference ``loss_utils.py:36-69``.

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
    b = _blur(stacked, window_size)
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
