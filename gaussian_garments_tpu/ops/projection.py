"""EWA projection of 3D Gaussians to screen space.

This is the TPU-native equivalent of the per-splat preprocessing performed by
the reference's external CUDA rasterizer (``preprocessCUDA`` in
``diff_gaussian_rasterization_depth_alpha``; marshaled from
``/root/reference/gaussian_renderer/__init__.py:36-111``): view/projection
transform, frustum cull, 3D covariance from (scale, rotation), EWA splat of the
covariance through the local affine approximation of the perspective map,
low-pass dilation, conic inversion, 3σ screen radius, and SH→RGB evaluation.

Everything is batched jnp over the splat axis — XLA fuses the whole stage into
a handful of VPU loops; the 3×3 matrix products are laid out as explicit
elementwise algebra (no tiny-matmul MXU traffic).

Matrix convention: the camera matrices are stored **transposed** (row-vector
convention), exactly like the reference (``scene/cameras.py:59-62``):
``p_view = [p, 1] @ world_view_transform``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from gaussian_garments_tpu.utils import sh as sh_utils


@struct.dataclass
class ProjectedGaussians:
    """Per-splat screen-space quantities consumed by the compositors."""

    means2d: jnp.ndarray   # (N, 2) pixel coords (ndc2Pix convention)
    conic: jnp.ndarray     # (N, 3) inverse 2D covariance (a, b, c): ax²+2bxy+cy²
    depth: jnp.ndarray     # (N,) view-space z
    radii: jnp.ndarray     # (N,) int32 3σ pixel radius (0 = culled)
    rgb: jnp.ndarray       # (N, 3) pre-activated colors
    opacity: jnp.ndarray   # (N,) in [0, 1]


def transform_point_4x3(p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Row-vector affine transform: (N,3) @ (4,4)[:, :3].

    Precision pinned to HIGHEST: splat positions ride this matmul into clip
    space, and the TPU default rounds matmul INPUTS to bf16 (~2e-3 relative
    → ~2 px at fx≈2200), while the reference CUDA transform is f32
    (forward.cu transformPoint4x3). K=3 keeps the matmul memory-bound, so
    HIGHEST is free (bench-neutral, MEASUREMENTS.md r5)."""
    return jnp.matmul(p, m[:3, :3], precision=jax.lax.Precision.HIGHEST) + m[3, :3]


def transform_point_4x4(p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Row-vector homogeneous transform → (N,4); HIGHEST like 4x3 above."""
    return jnp.matmul(p, m[:3, :], precision=jax.lax.Precision.HIGHEST) + m[3, :]


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray, scaling_modifier: float = 1.0) -> jnp.ndarray:
    """Σ = (R S)(R S)ᵀ packed as upper-triangular 6-vector (xx,xy,xz,yy,yz,zz).

    Same packing as the CUDA ``computeCov3D`` and the reference's python path
    (``scene/gaussian_model.py:27-31``).

    TPU note: written as column-wise scalar algebra on (N,) vectors —
    Σᵢⱼ = Σₖ Rᵢₖ Rⱼₖ sₖ² — NOT as batched (N,3,3) matmuls. A (N,3,3) array
    pads its two minor dims to the (8,128) vreg tile, so every materialized
    intermediate costs ~1024 slots per splat and the batched tiny dot_general
    blocks fusion with the downstream EWA math: measured 4.9 ms of the 6 ms
    projection stage at 150K splats, vs ~0.3 ms fused column form.
    """
    from gaussian_garments_tpu.utils import quaternion

    q = quaternion.normalize(rotations)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scaling_modifier * scales
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    return jnp.stack(
        [
            r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2,
            r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2,
            r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2,
            r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2,
            r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2,
            r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2,
        ],
        axis=-1,
    )


def _ewa_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tanfovx: float,
    tanfovy: float,
):
    """EWA: Σ₂D = J W Σ Wᵀ Jᵀ (upper 2×2) + 0.3·I low-pass dilation.

    ``J`` is the Jacobian of the perspective projection evaluated at the
    (fov-clamped) view-space mean; ``W`` is the world→view rotation.
    Returns the 2D covariance as (N, 3) = (c00, c01, c11).
    """
    t = transform_point_4x3(means3d, viewmatrix)  # (N,3) view space
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tz = t[:, 2]
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy)
    tx, ty = txtz * tz, tytz * tz

    # J rows (only first two matter): [fx/tz, 0, -fx tx/tz²], [0, fy/tz, -fy ty/tz²]
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    # M = J @ W : (2,3) per splat, W = world→view rotation = viewmatrix[:3,:3].T
    # (transposed storage ⇒ W[r, c] = viewmatrix[c, r]).
    W = viewmatrix[:3, :3]  # note: W_rv[c, r] layout; we index accordingly
    # row0 of M: j00 * W_row0 + j02 * W_row2 where W_row_r[c] = viewmatrix[c, r]
    m0 = j00[:, None] * W[:, 0][None, :] + j02[:, None] * W[:, 2][None, :]  # (N,3)
    m1 = j11[:, None] * W[:, 1][None, :] + j12[:, None] * W[:, 2][None, :]  # (N,3)

    # Unpack symmetric Σ
    sxx, sxy, sxz, syy, syz, szz = (cov3d[:, i] for i in range(6))

    def sigma_dot(v):  # Σ @ v for v (N,3)
        return jnp.stack(
            [
                sxx * v[:, 0] + sxy * v[:, 1] + sxz * v[:, 2],
                sxy * v[:, 0] + syy * v[:, 1] + syz * v[:, 2],
                sxz * v[:, 0] + syz * v[:, 1] + szz * v[:, 2],
            ],
            axis=-1,
        )

    s_m0 = sigma_dot(m0)
    s_m1 = sigma_dot(m1)
    c00 = jnp.sum(m0 * s_m0, axis=-1) + 0.3
    c01 = jnp.sum(m0 * s_m1, axis=-1)
    c11 = jnp.sum(m1 * s_m1, axis=-1) + 0.3
    return jnp.stack([c00, c01, c11], axis=-1), tz


def project_gaussians(
    means3d: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    *,
    image_width: int,
    image_height: int,
    tanfovx: float,
    tanfovy: float,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    opacities: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    scaling_modifier: float = 1.0,
    screen_offset: Optional[jnp.ndarray] = None,
) -> ProjectedGaussians:
    """Project N Gaussians into one camera.

    Mirrors the argument contract of the CUDA rasterizer call
    (``gaussian_renderer/__init__.py:103-111``): either ``scales``+``rotations``
    or ``cov3d_precomp``; either ``shs`` (eval at ``sh_degree``) or
    ``colors_precomp``.

    ``screen_offset`` (N,2), if given, is added to the pixel-space means — a
    differentiable hook standing in for the reference's
    ``screenspace_points.retain_grad()`` channel used for densification stats
    (``gaussian_renderer/__init__.py:28-33``).
    """
    n = means3d.shape[0]
    if cov3d_precomp is None:
        cov3d = build_cov3d(scales, rotations, scaling_modifier)
    else:
        cov3d = cov3d_precomp

    focal_x = image_width / (2.0 * tanfovx)
    focal_y = image_height / (2.0 * tanfovy)

    # --- projection ---
    p_hom = transform_point_4x4(means3d, projmatrix)  # (N,4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    cov2d, depth = _ewa_cov2d(means3d, cov3d, viewmatrix, focal_x, focal_y, tanfovx, tanfovy)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det, cov2d[:, 0] * inv_det], axis=-1)

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))

    # ndc2Pix: ((v + 1) * S - 1) * 0.5
    mx = ((p_proj[:, 0] + 1.0) * image_width - 1.0) * 0.5
    my = ((p_proj[:, 1] + 1.0) * image_height - 1.0) * 0.5
    means2d = jnp.stack([mx, my], axis=-1)
    if screen_offset is not None:
        means2d = means2d + screen_offset

    # frustum cull: view z <= 0.2, degenerate covariance, off-screen rect
    x0 = mx - radius
    x1 = mx + radius
    y0 = my - radius
    y1 = my + radius
    visible = (depth > 0.2) & (det != 0.0) & (x1 >= 0) & (x0 < image_width) & (y1 >= 0) & (y0 < image_height)
    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)

    # --- color ---
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        # shs: (N, K, 3) with K = (max_deg+1)²; eval_sh wants [..., C, K]
        dirs = means3d - campos[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        sh_view = jnp.swapaxes(shs, -1, -2)  # (N, 3, K)
        # eval_sh broadcasting contract: dirs (N,3) against sh (N,C,K) — the
        # direction components enter as (N,1), matching the reference
        # (utils/sh_utils.py:62: dirs[..., 0:1] vs sh[..., i] of shape (N,C)).
        rgb = sh_utils.eval_sh(sh_degree, sh_view, dirs)
        rgb = jnp.maximum(rgb + 0.5, 0.0)

    opac = jnp.zeros((n,)) if opacities is None else opacities.reshape(n)
    opac = jnp.where(visible, opac, 0.0)

    return ProjectedGaussians(
        means2d=means2d,
        conic=conic,
        depth=depth,
        radii=radii,
        rgb=rgb,
        opacity=opac,
    )
