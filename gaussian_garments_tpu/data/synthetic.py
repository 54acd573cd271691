"""Synthetic multi-view garment scenes.

The reference has no test data generator — humans eyeball debug renders
(SURVEY.md §4). For CI we synthesize a rippled cloth sheet, a camera ring,
and ground-truth multi-view images rendered by our own *oracle* rasterizer
from a known splat configuration, so stage-2/3 integration tests can assert
convergence (PSNR up, vertex error down) in minutes on CPU.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gaussian_garments_tpu.utils.camera import Camera, make_camera


def make_cloth_template(nx: int = 12, ny: int = 12, size: float = 1.0,
                        ripple: float = 0.05) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A rippled rectangular sheet: (vertices (V,3), faces (F,3), uvs (V,2))."""
    xs = np.linspace(-size / 2, size / 2, nx)
    ys = np.linspace(-size / 2, size / 2, ny)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    gz = ripple * np.sin(3.0 * np.pi * gx / size) * np.cos(2.0 * np.pi * gy / size)
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)
    uvs = np.stack([(gx + size / 2) / size, (gy + size / 2) / size], axis=-1).reshape(-1, 2).astype(np.float32)

    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            faces.append([a, b, a + 1])
            faces.append([a + 1, b, b + 1])
    return verts, np.asarray(faces, np.int64), uvs


def make_camera_ring(
    n: int = 8,
    radius: float = 2.0,
    height: float = 0.8,
    target: Optional[np.ndarray] = None,
    fx: float = 200.0,
    width: int = 128,
    height_px: int = 128,
) -> List[Camera]:
    """n pinhole cameras on a ring looking at ``target`` (COLMAP convention:
    x right, y down, z forward)."""
    target = np.zeros(3) if target is None else np.asarray(target, np.float64)
    cams = []
    for k in range(n):
        a = 2 * np.pi * k / n
        pos = np.array([radius * np.cos(a), radius * np.sin(a), height])
        fwd = target - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, -1.0])  # -z world up => y-down camera
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        r_w2c = np.stack([right, down, fwd], axis=0)
        t_w2c = -r_w2c @ pos
        cams.append(
            make_camera(
                R=r_w2c.T, T=t_w2c, fx=fx, fy=fx,
                cx=width / 2, cy=height_px / 2, width=width, height=height_px,
                uid=k, colmap_id=k, image_name=f"synthetic_{k:02d}",
            )
        )
    return cams


def face_checker_colors(faces: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Deterministic per-face RGB in [0,1] (checker + position gradient)."""
    centers = verts[faces].mean(axis=1)
    c = np.zeros((len(faces), 3), np.float32)
    c[:, 0] = 0.5 + 0.5 * np.sin(12 * centers[:, 0])
    c[:, 1] = 0.5 + 0.5 * np.cos(12 * centers[:, 1])
    c[:, 2] = np.linspace(0.2, 0.9, len(faces))
    return np.clip(c, 0.0, 1.0)


def render_ground_truth(cameras: List[Camera], verts: np.ndarray, faces: np.ndarray,
                        colors: np.ndarray, splat_log_scale: float = -4.6,
                        opacity: float = 0.95) -> List[Camera]:
    """Attach one opaque splat per face of the *true* mesh and render every
    camera with the oracle rasterizer; returns cameras with
    original_image/gt_alpha_mask filled (mask = alpha > 0.5)."""
    from gaussian_garments_tpu.ops.projection import project_gaussians
    from gaussian_garments_tpu.ops.rasterizer_ref import rasterize_reference
    from gaussian_garments_tpu.utils.sh import rgb2sh

    centers = verts[faces].mean(axis=1).astype(np.float32)
    n = len(centers)
    scales = np.full((n, 3), np.exp(splat_log_scale), np.float32)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1
    opac = np.full((n,), opacity, np.float32)
    shs = rgb2sh(np.asarray(colors, np.float32))[:, None, :]

    out = []
    for cam in cameras:
        proj = project_gaussians(
            jnp.asarray(centers), cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, image_width=cam.image_width, image_height=cam.image_height,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            shs=jnp.asarray(shs), opacities=jnp.asarray(opac), sh_degree=0,
        )
        img, _, alpha = rasterize_reference(
            proj, image_height=cam.image_height, image_width=cam.image_width, bg=jnp.zeros(3)
        )
        mask = (np.asarray(alpha) > 0.5).astype(np.float32)
        out.append(cam.replace(original_image=img, gt_alpha_mask=jnp.asarray(mask)))
    return out


def make_scene(n_cams: int = 8, nx: int = 12, ny: int = 12, width: int = 128, height: int = 128):
    """Full synthetic scene: (cameras-with-GT, true_verts, faces, uvs, colors)."""
    verts, faces, uvs = make_cloth_template(nx, ny)
    colors = face_checker_colors(faces, verts)
    cams = make_camera_ring(n_cams, width=width, height_px=height)
    cams = render_ground_truth(cams, verts, faces, colors)
    return cams, verts, faces, uvs, colors
