"""Quality-parity measurement: PSNR/SSIM over camera sets.

The reference validates visually (debug renders as oracles, SURVEY.md §4);
BASELINE.md asks for numbers (≤0.1 dB PSNR delta vs the CUDA reference at
1080p). This module turns the eval split that ``Scene.split_cameras`` /
``AvatarDataset`` already build (reference ``scene/scene.py:88-99`` llffhold
convention) into logged PSNR/SSIM scalars.
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax.numpy as jnp
import numpy as np

from gaussian_garments_tpu.utils.losses import psnr as _psnr, ssim as _ssim


def image_metrics(render: jnp.ndarray, gt: jnp.ndarray,
                  mask: jnp.ndarray | None = None) -> Dict[str, float]:
    """PSNR/SSIM of one (3,H,W) render vs ground truth in [0,1].

    ``psnr_masked`` restricts the MSE to the penalized-mask region (the
    garment ∪ background area the training loss sees — io_utils.py:90-111);
    ``ssim_masked`` applies the mask multiplicatively to both images before
    the SSIM windows, exactly like the training loss (reference
    loss_utils.py:44-46) — the unmasked full-frame SSIM is dominated by the
    (identical) background and saturates near 1. Full-image metrics are
    reported alongside for cross-paper comparability.
    """
    render = jnp.clip(render, 0.0, 1.0)
    out = {
        "psnr": float(_psnr(render, gt)),
        "ssim": float(_ssim(render[None], gt[None])),
    }
    if mask is not None:
        m = mask.astype(jnp.float32)
        if m.ndim == 2:
            m = m[None]
        denom = jnp.maximum(m.sum() * gt.shape[0], 1.0)
        mse = (((render - gt) * m) ** 2).sum() / denom
        out["psnr_masked"] = float(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))
        out["ssim_masked"] = float(_ssim(render[None], gt[None], mask=m[None]))
    return out


def evaluate_cameras(cams: Sequence, render_fn: Callable,
                     max_cams: int | None = None) -> Dict[str, float]:
    """Mean metrics over ``cams``; ``render_fn(cam) -> (3,H,W)`` image.

    Returns {} when the camera list is empty (e.g. --eval not set).
    """
    cams = list(cams)[: (max_cams or len(cams))]
    if not cams:
        return {}
    acc: Dict[str, float] = {}
    for cam in cams:
        m = image_metrics(render_fn(cam), cam.original_image, cam.gt_alpha_mask)
        for k, v in m.items():
            acc[k] = acc.get(k, 0.0) + v
    return {k: v / len(cams) for k, v in acc.items()}
