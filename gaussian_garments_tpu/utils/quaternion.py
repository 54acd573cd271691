"""Quaternion / rotation utilities (wxyz convention, matching the reference's
``utils/general_utils.py:88-120`` ``build_rotation`` and the roma-based quat
algebra used by ``scene/mesh_gaussian_model.py``)."""
from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis (torch.nn.functional.normalize).

    The norm is computed with a defined (zero) gradient at q = 0, matching
    torch's subgradient, where ``jnp.linalg.norm`` would give NaN. An all-zero
    quaternion should never reach here (capacity padding uses identity quats),
    but a NaN in the backward of a *masked-out* splat still poisons the shared
    face-frame gradients through 0·NaN, so this path must stay NaN-free.
    """
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq)) * (sq != 0.0)
    return q / jnp.maximum(norm, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz unit quaternion(s) -> rotation matrices ``[..., 3, 3]``.

    Normalizes the input first, matching ``build_rotation``.
    """
    q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices ``[..., 3, 3]`` -> wxyz unit quaternions.

    Branch-free (numerically-stable max-pivot selection via where), so it is
    jit/vmap friendly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the one with the largest pivot.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = _safe_sqrt(1.0 + tr) / 2.0
    cand0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)

    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2
    cand1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)

    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2
    cand2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)

    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2
    cand3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    use2 = (m11 >= m22)[..., None]
    q = jnp.where(use0, cand0, jnp.where(use1, cand1, jnp.where(use2, cand2, cand3)))
    return normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions: rotation b followed by a
    (i.e. ``R(a @ b) = R(a) @ R(b)``)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s); reference ``utils/general_utils.py:111-120``."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular 6-vector of a symmetric 3x3 (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2], cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def covariance_from_scaling_rotation(scaling, scaling_modifier, rotation):
    """Σ = L Lᵀ packed as 6-vector; reference ``scene/gaussian_model.py:27-31``.

    Delegates to the column-wise form in ``ops.projection.build_cov3d`` (no
    (N,3,3) intermediates — see its TPU note)."""
    from gaussian_garments_tpu.ops.projection import build_cov3d

    return build_cov3d(scaling, rotation, scaling_modifier)
