"""AO + object-space-normal texture baker.

Replaces the reference's embedded Blender Cycles bakes
(``scene/dataloader.py:202-277``, ``inference.py:150-227``) — the AvatarNet's
conditioning inputs — with our own renderer-independent baker:

- **normal map**: smooth (area-weighted vertex) normals interpolated at each
  texel's barycentric anchor, packed to [0,1] like a Blender object-space
  normal bake; background texels are 0 (the reference masks on
  ``normal.sum(0) > 0``, avatar_net.py:66).
- **ambient occlusion**: cosine-weighted hemisphere ray casting from each
  texel anchor (offset ε along the normal) against the full occluder scene
  (garment + body), using the native C++ BVH (ops.raytrace fallback: numpy).

Bakes are cached as .npz per frame, mirroring the reference's PNG cache
(dataloader.py:214-221).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from gaussian_garments_tpu.models.avatar_gaussian import AvatarBinding


def vertex_normals(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    tri = v[f]
    fn = np.cross(tri[:, 2] - tri[:, 1], tri[:, 0] - tri[:, 1])  # area-weighted
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def _hemisphere_dirs(n_samples: int) -> np.ndarray:
    """Deterministic cosine-weighted hemisphere directions (local +z up) via
    a Fibonacci spiral — low-discrepancy, reproducible."""
    i = np.arange(n_samples) + 0.5
    u1 = i / n_samples
    u2 = (i * 0.6180339887498949) % 1.0
    r = np.sqrt(u1)
    theta = 2 * np.pi * u2
    x = r * np.cos(theta)
    y = r * np.sin(theta)
    z = np.sqrt(np.maximum(1 - u1, 0.0))
    return np.stack([x, y, z], axis=1).astype(np.float32)


def _onb(n: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Branchless orthonormal basis around normals (N,3)."""
    sign = np.where(n[:, 2] >= 0, 1.0, -1.0)
    a = -1.0 / (sign + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = np.stack([1.0 + sign * n[:, 0] ** 2 * a, sign * b, -sign * n[:, 0]], axis=1)
    bt = np.stack([b, sign + n[:, 1] ** 2 * a, -n[:, 1]], axis=1)
    return t.astype(np.float32), bt.astype(np.float32)


def bake_textures(
    bind: AvatarBinding,
    mesh_v: np.ndarray,
    mesh_f: np.ndarray,
    occluders: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None,
    *,
    n_samples: int = 64,
    max_dist: float = np.inf,
    eps: float = 1e-4,
    cache_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bake (ambient (1,res,res), normal (3,res,res)) for the current pose.

    ``occluders``: extra (verts, faces) meshes (e.g. the SMPL-X body) joined
    with the garment for the AO scene, like the Blender bake scene
    (inference.py:169-197).
    """
    if cache_path is not None and os.path.exists(cache_path):
        data = np.load(cache_path)
        return data["ambient"], data["normal"]

    res = bind.texture_size
    mesh_v = np.asarray(mesh_v, np.float32)
    mesh_f = np.asarray(mesh_f, np.int64)
    gs_u = np.asarray(bind.gs_u)
    gs_v = np.asarray(bind.gs_v)
    binding = np.asarray(bind.binding)
    bc = np.asarray(bind.gs_bc)
    if bind.alive is not None:
        # dense layout: bake (and ray-cast AO for) alive texels only, so the
        # textures match the compact layout's bit-for-bit
        a = np.asarray(bind.alive)
        gs_u, gs_v, binding, bc = gs_u[a], gs_v[a], binding[a], bc[a]

    # --- anchors + smooth normals ---
    vn = vertex_normals(mesh_v, mesh_f)
    tri = mesh_v[mesh_f[binding]]                       # (G,3,3)
    tri_n = vn[mesh_f[binding]]
    anchors = np.einsum("gk,gkc->gc", bc, tri)
    normals = np.einsum("gk,gkc->gc", bc, tri_n)
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)

    normal_map = np.zeros((res, res, 3), np.float32)
    normal_map[gs_u, gs_v] = normals * 0.5 + 0.5

    # --- AO scene = garment + occluders ---
    all_v, all_f = [mesh_v], [mesh_f]
    off = len(mesh_v)
    for ov, of in (occluders or []):
        all_v.append(np.asarray(ov, np.float32))
        all_f.append(np.asarray(of, np.int64) + off)
        off += len(ov)
    scene_v = np.concatenate(all_v)
    scene_f = np.concatenate(all_f)

    from gaussian_garments_tpu.ops.raytrace import raycast_first_hit

    dirs_local = _hemisphere_dirs(n_samples)            # (S,3)
    t, btan = _onb(normals)
    g = len(anchors)
    hits = np.zeros((g,), np.float64)
    origins = (anchors + normals * eps).astype(np.float32)
    for s in range(n_samples):
        d = (dirs_local[s, 0] * t + dirs_local[s, 1] * btan + dirs_local[s, 2] * normals)
        t_hit, pid = raycast_first_hit(origins, d.astype(np.float32), scene_v, scene_f)
        hits += ((pid >= 0) & (t_hit < max_dist)).astype(np.float64)
    ao = 1.0 - hits / n_samples

    ambient_map = np.zeros((res, res), np.float32)
    ambient_map[gs_u, gs_v] = ao.astype(np.float32)

    ambient = ambient_map[None]
    normal = normal_map.transpose(2, 0, 1)
    if cache_path is not None:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez_compressed(cache_path, ambient=ambient, normal=normal)
    return ambient, normal
