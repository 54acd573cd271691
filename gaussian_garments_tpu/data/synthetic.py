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
    from gaussian_garments_tpu.ops.tiled import rasterize_tiled
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
        # the exact O(N·H·W) oracle only at test sizes; the tiled compositor
        # (same math) for anything larger
        if n * cam.image_height * cam.image_width <= 3e8:
            img, _, alpha = rasterize_reference(
                proj, image_height=cam.image_height, image_width=cam.image_width,
                bg=jnp.zeros(3))
        else:
            img, _, alpha, _ = rasterize_tiled(
                proj, image_height=cam.image_height, image_width=cam.image_width,
                bg=jnp.zeros(3))
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


def write_reference_layout(data_root, output_root, subject: str, sequence: str,
                           *, n_cams: int = 4, n_frames: int = 2,
                           nx: int = 10, ny: int = 10, res: int = 64) -> dict:
    """Write a synthetic dataset in the reference's exact on-disk layout
    (DataPreparation.md): per-camera rgb_images/garment_masks/
    foreground_masks + cameras.json + smplx/*.ply under the data root;
    template_uv.obj + point_cloud.ply under <output>/stage1. The garment
    translates slightly every frame so stage-2 tracking has real motion."""
    import json
    import os
    from pathlib import Path

    import jax.numpy as jnp

    from gaussian_garments_tpu.utils.io import save_image, store_ply, write_obj, write_ply

    verts, faces, uvs = make_cloth_template(nx, ny)
    colors = face_checker_colors(faces, verts)
    cams = make_camera_ring(n_cams, width=res, height_px=res)

    seq_dir = Path(data_root) / subject / sequence
    cam_json = {}
    for k, cam in enumerate(cams):
        name = f"Cam{k:03d}"
        intr = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
        extr = np.concatenate([cam.R.T, np.asarray(cam.T)[:, None]], axis=1)
        cam_json[name] = {"intrinsics": intr.tolist(), "extrinsics": extr.tolist(), "ids": k}

    frame_meshes = []
    for t in range(n_frames):
        v_t = verts + np.array([0.004 * t, 0.002 * t, 0.0], np.float32)
        frame_meshes.append(v_t)
        gt_cams = render_ground_truth(cams, v_t, faces, colors)
        for k, cam in enumerate(gt_cams):
            name = f"Cam{k:03d}"
            img = np.asarray(cam.original_image).transpose(1, 2, 0)
            mask = np.asarray(cam.gt_alpha_mask)[0]
            save_image(seq_dir / name / "rgb_images" / f"{t:05d}.png", img)
            save_image(seq_dir / name / "garment_masks" / f"{t:05d}.png", mask)
            save_image(seq_dir / name / "foreground_masks" / f"{t:05d}.png", mask)

        # "body": a plane far below the garment (keeps collision inert)
        body_v = verts.copy()
        body_v[:, 2] -= 2.0
        os.makedirs(seq_dir / "smplx", exist_ok=True)
        write_ply(seq_dir / "smplx" / f"{t:05d}.ply", {
            "x": body_v[:, 0].astype(np.float32), "y": body_v[:, 1].astype(np.float32),
            "z": body_v[:, 2].astype(np.float32)})
        # append a face element manually (write_ply is vertex-only)
        _append_ply_faces(seq_dir / "smplx" / f"{t:05d}.ply", body_v, faces)

    with open(seq_dir / "cameras.json", "w") as f:
        json.dump(cam_json, f)

    stage1 = Path(output_root) / subject / "stage1"
    os.makedirs(stage1, exist_ok=True)
    write_obj({"vertices": verts, "faces": faces, "uvs": uvs, "texture_faces": faces},
              stage1 / "template_uv.obj")
    centers = verts[faces].mean(1)
    store_ply(stage1 / "point_cloud.ply", centers, colors * 255)
    with open(stage1 / "cameras.json", "w") as f:
        json.dump(cam_json, f)
    return {"verts": verts, "faces": faces, "uvs": uvs, "colors": colors,
            "frames": frame_meshes, "cams": cams}


def _append_ply_faces(path, verts, faces):
    """Rewrite a vertex-only binary PLY with a triangular face element."""
    import numpy as np

    n, m = len(verts), len(faces)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {m}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    vdata = np.ascontiguousarray(verts, np.float32).tobytes()
    fdtype = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
    farr = np.empty(m, fdtype)
    farr["n"] = 3
    farr["idx"] = np.asarray(faces, np.int32)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(vdata)
        f.write(farr.tobytes())
