"""Exact per-pixel Gaussian compositor (correctness oracle).

Computes, for every pixel, alpha-blending over *all* depth-sorted splats using
the parallel-prefix (cumulative log-transmittance) formulation:

    T_i = Π_{j<i} (1 - α_j)  =  exp( cumsum_exclusive( log(1-α_j) ) )
    C   = Σ_i  c_i α_i T_i   + T_N · bg

which is mathematically identical to the CUDA kernel's sequential
front-to-back loop (``renderCUDA`` of ``diff_gaussian_rasterization_depth_alpha``)
including its thresholds: α capped at 0.99, contributions with α < 1/255
skipped, and compositing stopped once T < 1e-4. On TPU the cumulative
formulation is the natural one — a vectorized scan instead of a serial loop —
and it is exactly differentiable by jax autodiff, so no hand-written backward
is needed for the oracle.

O(N·H·W) memory/compute: use only for tests and tiny debug scenes. The
production path is ``ops.tiled`` (same math, tile-binned).
"""
from __future__ import annotations

import jax.numpy as jnp

from gaussian_garments_tpu.ops.projection import ProjectedGaussians

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99


def composite_pixels(
    pix_xy: jnp.ndarray,        # (P, 2) pixel centers
    means2d: jnp.ndarray,       # (K, 2) depth-sorted (front first)
    conic: jnp.ndarray,         # (K, 3)
    rgb: jnp.ndarray,           # (K, 3)
    opacity: jnp.ndarray,       # (K,)
    depth: jnp.ndarray,         # (K,)
    valid: jnp.ndarray,         # (K,) bool
    bg: jnp.ndarray,            # (3,)
):
    """Blend K front-to-back-sorted splats over P pixels.

    Returns (color (P,3), depth (P,), alpha (P,)). Shared by the oracle and the
    tiled XLA path (which calls it per tile).
    """
    # d = splat_center - pixel (CUDA: d = xy - pixf)
    dx = means2d[:, 0][:, None] - pix_xy[:, 0][None, :]   # (K, P)
    dy = means2d[:, 1][:, None] - pix_xy[:, 1][None, :]
    power = -0.5 * (conic[:, 0][:, None] * dx * dx + conic[:, 2][:, None] * dy * dy) \
        - conic[:, 1][:, None] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * jnp.exp(power))  # (K, P)
    ok = valid[:, None] & (power <= 0.0) & (alpha >= ALPHA_EPS)
    alpha = jnp.where(ok, alpha, 0.0)

    # exclusive cumulative transmittance
    log1ma = jnp.log1p(-alpha)
    logT = jnp.cumsum(log1ma, axis=0) - log1ma        # exclusive prefix (K, P)
    T = jnp.exp(logT)
    # CUDA early exit: once T would drop below 1e-4 the loop stops *before*
    # applying the splat; mask those contributions so T freezes, like the loop.
    contrib = jnp.where(T >= T_EPS, alpha * T, 0.0)    # (K, P)

    color = contrib.T @ rgb                             # (P, 3)
    depth_out = contrib.T @ depth                       # (P,)
    alpha_out = jnp.sum(contrib, axis=0)                # (P,)
    color = color + (1.0 - alpha_out)[:, None] * bg[None, :]
    return color, depth_out, alpha_out


def rasterize_reference(
    proj: ProjectedGaussians,
    *,
    image_height: int,
    image_width: int,
    bg: jnp.ndarray,
    pixel_chunk: "int | None" = None,
):
    """Render the full image with the exact per-pixel compositor.

    Returns (image (3,H,W), depth (1,H,W), alpha (1,H,W)) matching the CUDA
    rasterizer's output tensors (``gaussian_renderer/__init__.py:103-111``).

    ``pixel_chunk``: sequentially composite that many pixels at a time
    (lax.map) — bounds the O(K·P) intermediate to O(K·chunk) so the oracle
    fits device memory at harness sizes (512²·20K splats is a 20 GB (K,P)
    buffer unchunked).
    """
    import jax

    order = jnp.argsort(proj.depth)
    means2d = proj.means2d[order]
    conic = proj.conic[order]
    rgb = proj.rgb[order]
    opacity = proj.opacity[order]
    depth = proj.depth[order]
    valid = (proj.radii[order] > 0)

    ys = jnp.arange(image_height, dtype=jnp.float32)
    xs = jnp.arange(image_width, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (H*W, 2)

    if pixel_chunk is None:
        color, d, a = composite_pixels(pix, means2d, conic, rgb, opacity,
                                       depth, valid, bg)
    else:
        hw = pix.shape[0]
        pad = (-hw) % pixel_chunk
        pix_p = jnp.pad(pix, ((0, pad), (0, 0)))
        chunks = pix_p.reshape(-1, pixel_chunk, 2)
        color, d, a = jax.lax.map(
            lambda px: composite_pixels(px, means2d, conic, rgb, opacity,
                                        depth, valid, bg), chunks)
        color = color.reshape(-1, 3)[:hw]
        d = d.reshape(-1)[:hw]
        a = a.reshape(-1)[:hw]
    image = color.reshape(image_height, image_width, 3).transpose(2, 0, 1)
    return image, d.reshape(1, image_height, image_width), a.reshape(1, image_height, image_width)
