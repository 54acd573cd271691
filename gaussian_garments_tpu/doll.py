"""Multi-garment inference model ("Doll") + simulated-trajectory dataset.

Reference ``inference.py:229-415``:
- ``Doll``: per-garment AvatarSimulationModel + AvatarNet, concatenated splats,
  joint visibility by ray casting against all garment meshes (:270-316),
  compositing of the splat render over the body image (:318-330);
- ``Simulation``: ContourCraft trajectory pkl with the contract of
  README.md:120-132 — ``pred [N,V,3]``, ``cloth_faces [F,3]``,
  ``obstacle [N,B,3]``, ``obstacle_faces``, ``garment_names``; multi-garment
  outfits are concatenations split by template vertex counts.

TPU redesign: visibility is a first-hit ray cast over the *merged* garment
scene (ops.raytrace) keyed by geometry id, matching the reference's open3d
geometry-id test; the body occlusion mask and the shaded body image come from
our mesh rasterizer instead of an OpenGL pass.
"""
from __future__ import annotations

import os
import pickle
import time
from pathlib import Path
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_garments_tpu.config import DEFAULTS
from gaussian_garments_tpu.models import avatar_gaussian as AG
from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.models import mesh_gaussian as MG
from gaussian_garments_tpu.renderer import RasterConfig, SplatBundle, render
from gaussian_garments_tpu.utils.io import read_obj


class Garment(NamedTuple):
    name: str
    template: dict                 # read_obj dict of template_uv.obj
    bind: AG.AvatarBinding
    splats: G.GaussianParams       # loaded from the stage-3 texture ckpt
    net: object                    # AvatarNet module
    net_vars: dict                 # {"params", "buffers"}
    sh_degree: int


def load_garment(name: str, *, sh_degree: int = 3, texture_size: int = 512,
                 dense_texels: bool = False) -> Garment:
    """AvatarSimulationModel + AvatarNet.load_ckpt (inference.py:238-246)."""
    from gaussian_garments_tpu.models.avatar_net import AvatarNet
    from gaussian_garments_tpu.training.checkpoints import load_s3_ckpt

    root = Path(DEFAULTS.output_root) / name
    template = read_obj(root / DEFAULTS.stage1 / "template_uv.obj")
    bind, _ = AG.build_binding(template["uvs"], template["texture_faces"], texture_size,
                               dense=dense_texels)

    net = AvatarNet(texture_size=texture_size, sh_degree=sh_degree)
    ckpt = load_s3_ckpt(root / DEFAULTS.stage3)
    splats = ckpt.get("splats") or AG.init_empty(bind, sh_degree)
    splats = AG.adapt_params_layout(bind, splats)  # cross-layout checkpoints
    return Garment(name=name, template=template, bind=bind, splats=splats,
                   net=net, net_vars={"params": ckpt["net_params"],
                                      "buffers": ckpt.get("net_buffers", {})},
                   sh_degree=sh_degree)


def update_garment(g: Garment, verts, ambient: jnp.ndarray,
                   normal: jnp.ndarray, world_view, campos):
    """AvatarNet forward for one garment (inference.py:251-262). Returns
    (bundle pieces dict, style texture rows). Tracer-safe in ``verts`` so the
    whole per-frame path can live under one jit (the un-jitted per-op
    dispatch through the TPU tunnel costs ~20 ms each — seconds per frame;
    MEASUREMENTS.md "Inference wall decomposition")."""
    from gaussian_garments_tpu.models.avatar_net import apply_shadow

    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(np.asarray(g.template["faces"], np.int64).astype(np.int32))
    frames = MG.compute_face_frames(v, f)
    rows = MG.gather_frame_rows(frames, g.bind.binding, v, f)
    shadow_tex = g.net.apply(g.net_vars, ambient, normal, world_view, campos,
                             g.bind, v, f, frames, rows=rows)
    local_xyz, shs = apply_shadow(g.bind, g.splats, shadow_tex, g.sh_degree)
    anchor = AG.barycentric_3d(g.bind, v, f, rows=rows)
    style_rows = AG.gather_texture(g.bind, shadow_tex)[:, 3:]
    opacity = G.get_opacity(g.splats)
    if g.bind.alive is not None:  # dense layout: dead texels never render
        opacity = opacity * g.bind.alive[:, None].astype(opacity.dtype)
    return {
        "xyz": AG.avatar_world_xyz(local_xyz, g.bind, frames, anchor, rows=rows),
        "anchor": anchor,
        "rotation": MG.world_rotation(g.splats, g.bind.binding, frames, rows=rows),
        "scaling": MG.world_scaling(g.splats, g.bind.binding, frames, rows=rows),
        "opacity": opacity,
        "shs": shs,
        "raw_shs": G.get_features(g.splats),
        "style": style_rows.reshape(style_rows.shape[0], -1, 3),
        "mesh_v": v,
        "mesh_f": f,
    }, frames


def joint_visibility(updates: List[dict], campos: jnp.ndarray) -> jnp.ndarray:
    """Per-splat visibility over the merged garment scene: first hit's
    geometry id must equal the splat's garment (inference.py:285-316)."""
    from gaussian_garments_tpu.ops.raytrace import raycast_jnp

    all_v, all_f, geom_of_face = [], [], []
    off = 0
    for gi, u in enumerate(updates):
        all_v.append(u["mesh_v"])
        all_f.append(u["mesh_f"] + off)
        geom_of_face.append(jnp.full((u["mesh_f"].shape[0],), gi, jnp.int32))
        off += u["mesh_v"].shape[0]
    scene_v = jnp.concatenate(all_v)
    scene_f = jnp.concatenate(all_f)
    geom_of_face = jnp.concatenate(geom_of_face)

    anchors = jnp.concatenate([u["anchor"] for u in updates])
    gs_geom = jnp.concatenate([
        jnp.full((u["anchor"].shape[0],), gi, jnp.int32) for gi, u in enumerate(updates)])
    d = anchors - campos[None]
    dirs = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    origins = jnp.broadcast_to(campos[None], anchors.shape)
    _, pid = raycast_jnp(origins, dirs, scene_v, scene_f)
    hit_geom = jnp.where(pid >= 0, geom_of_face[jnp.maximum(pid, 0)], -1)
    return hit_geom == gs_geom


def joint_visibility_depth(updates: List[dict], viewmatrix, projmatrix, *,
                           image_size: int = 256,
                           rel_tol: float = 5e-3) -> jnp.ndarray:
    """Depth-buffer joint visibility over the merged garment scene — the
    shadow-map equivalent of ``joint_visibility``'s per-splat first-hit ray
    cast (reference inference.py:285-316), same formulation the s3 trainer
    validates at 0.95 agreement vs the exact cast (avatar_gaussian.py).

    One 256² merged-scene depth raster + an anchor projection: O(splats),
    vs the exact path's O(splats · faces) Möller–Trumbore sweep (~seconds
    per frame at 262K texels × 9K faces)."""
    from gaussian_garments_tpu.ops.mesh_raster import project_mesh, rasterize_mesh

    off = 0
    all_v, all_f = [], []
    for u in updates:
        all_v.append(u["mesh_v"])
        all_f.append(u["mesh_f"] + off)
        off += u["mesh_v"].shape[0]
    scene_v = jnp.concatenate(all_v)
    scene_f = jnp.concatenate(all_f)
    anchors = jnp.concatenate([u["anchor"] for u in updates])

    _, depth_buf = rasterize_mesh(scene_v, scene_f, viewmatrix, projmatrix,
                                  image_width=image_size, image_height=image_size)
    xy, z = project_mesh(anchors, viewmatrix, projmatrix, image_size, image_size)
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, image_size - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, image_size - 1)
    sampled = depth_buf.reshape(-1)[yi * image_size + xi]
    return (z > 0.0) & (z <= sampled * (1.0 + rel_tol))


def concat_bundle(updates: List[dict], vis: jnp.ndarray, sh_degree: int,
                  override: str = "shs") -> SplatBundle:
    """prepare_gaussian (:270-283): concatenated splats with visibility by
    opacity masking (static shapes instead of boolean indexing)."""
    shs = jnp.concatenate([u[override] for u in updates])
    return SplatBundle(
        means3d=jnp.concatenate([u["xyz"] for u in updates]),
        opacity=jnp.concatenate([u["opacity"] for u in updates]) * vis[:, None],
        scales=jnp.concatenate([u["scaling"] for u in updates]),
        rotations=jnp.concatenate([u["rotation"] for u in updates]),
        shs=shs,
        active_sh_degree=sh_degree,
    )


def body_mask_and_image(body_v, body_f, garment_vs, garment_fs, camera):
    """Shaded body render + 'body in front of garments' mask, replacing the
    aitviewer depth-compare pass (inference.py:469-477).

    The 1+N per-scene depth rasters stay an UNROLLED python loop: a vmapped
    call over (vertex,face)-padded scenes measured 2.8× SLOWER on the chip
    (42.8 → 118.9 ms — the batched per-tile `tri_tab[idx_t]` gathers lower
    as mixed-index gathers, the same pathology as "never vmap pack_pairs";
    r5 ladder, MEASUREMENTS.md). ~21 ms per scene at 940×1280."""
    from gaussian_garments_tpu import geometry as geo
    from gaussian_garments_tpu.ops.mesh_raster import rasterize_mesh

    kw = dict(viewmatrix=camera.world_view_transform, projmatrix=camera.full_proj_transform,
              image_width=camera.image_width, image_height=camera.image_height)
    b_face, b_z = rasterize_mesh(body_v, body_f, **kw)
    g_z = jnp.full_like(b_z, jnp.inf)
    for gv, gf in zip(garment_vs, garment_fs):
        _, z = rasterize_mesh(gv, gf, **kw)
        g_z = jnp.minimum(g_z, z)
    body_mask = (b_face >= 0) & (b_z < g_z)

    # headlight lambertian shading
    normals = geo.face_normals(body_v, body_f)
    view = camera.camera_center - body_v[body_f].mean(axis=1)
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-12)
    shade = jnp.abs((normals * view).sum(-1))
    shade_img = jnp.where(b_face >= 0, shade[jnp.maximum(b_face, 0)], 1.0)
    body_image = jnp.stack([shade_img] * 3, axis=0)
    return body_mask, body_image


def composite_jnp(garment_rgb: jnp.ndarray, garment_alpha: jnp.ndarray,
                  body_image: jnp.ndarray, body_mask: jnp.ndarray) -> jnp.ndarray:
    """Doll.render compositing (:318-330): garment RGBA over the body image,
    with body-occluded garment pixels removed. Pure-jnp (jit-safe)."""
    rgb = jnp.clip(garment_rgb, 0.0, 1.0)
    a = jnp.clip(garment_alpha, 0.0, 1.0) * (~body_mask)[None].astype(jnp.float32)
    out = rgb * a + body_image * (1.0 - a)
    return jnp.clip(out, 0, 1)


def composite(garment_rgb, garment_alpha, body_image, body_mask) -> np.ndarray:
    return np.asarray(composite_jnp(garment_rgb, garment_alpha, body_image,
                                    body_mask))


class Simulation:
    """Trajectory dataset (inference.py:332-414) with the exact pkl contract
    of README.md:120-132."""

    def __init__(self, traj_path: str, output_path: str, *, sh_degree: int = 3,
                 texture_size: int = 512, exact_visibility: bool = False,
                 dense_texels: bool = False):
        # exact_visibility: per-splat first-hit ray cast (reference parity,
        # O(splats·faces)); default is the depth-buffer formulation
        # (O(splats), validated at 0.95 agreement in s3)
        self.exact_visibility = exact_visibility
        with open(traj_path, "rb") as f:
            self.pkl = pickle.load(f)
        self.garment_names = self.pkl["garment_names"]
        self.garments = [load_garment(n, sh_degree=sh_degree, texture_size=texture_size,
                                      dense_texels=dense_texels)
                         for n in self.garment_names]
        self.output = Path(output_path)
        os.makedirs(self.output, exist_ok=True)

    def __len__(self):
        return len(self.pkl["pred"])

    def split_vertices(self, vertices: np.ndarray) -> List[np.ndarray]:
        """Multi-garment concatenation split by template vertex counts
        (inference.py:355-361)."""
        out = []
        for g in self.garments:
            n = len(g.template["vertices"])
            out.append(vertices[:n])
            vertices = vertices[n:]
        return out

    def prepare_frame(self, idx: int):
        """Write per-frame body/garment meshes and bake AO/normal textures
        with disk caches (inference.py:369-406)."""
        from gaussian_garments_tpu.data.baker import bake_textures
        from gaussian_garments_tpu.utils.io import write_obj

        vert_list = self.split_vertices(np.asarray(self.pkl["pred"][idx]))
        body_v = np.asarray(self.pkl["obstacle"][idx])
        body_f = np.asarray(self.pkl["obstacle_faces"])

        textures = []
        for gi, (g, verts) in enumerate(zip(self.garments, vert_list)):
            mesh_dir = self.output / g.name / "meshes"
            os.makedirs(mesh_dir, exist_ok=True)
            mesh_path = mesh_dir / f"{idx:05d}.obj"
            if not mesh_path.exists():
                out = dict(g.template)
                out["vertices"] = verts
                write_obj(out, mesh_path)
            occluders = [(body_v, body_f)] + [
                (np.asarray(v2), np.asarray(g2.template["faces"]))
                for gj, (g2, v2) in enumerate(zip(self.garments, vert_list)) if gj != gi]
            cache = self.output / g.name / "texture" / f"{idx:05d}.npz"
            ambient, normal = bake_textures(g.bind, verts, g.template["faces"],
                                            occluders=occluders, cache_path=str(cache))
            textures.append((jnp.asarray(ambient), jnp.asarray(normal)))
        return vert_list, textures, (body_v, body_f)

    def forward(self, idx: int, camera,
                timings: Optional[dict] = None) -> Tuple[List[dict], jnp.ndarray]:
        t0 = time.perf_counter()
        vert_list, textures, _ = self.prepare_frame(idx)
        t1 = time.perf_counter()
        updates = []
        for g, verts, (amb, nrm) in zip(self.garments, vert_list, textures):
            u, _ = update_garment(g, verts, amb, nrm,
                                  camera.world_view_transform, camera.camera_center)
            updates.append(u)
        if self.exact_visibility:
            vis = joint_visibility(updates, camera.camera_center)
        else:
            vis = joint_visibility_depth(updates, camera.world_view_transform,
                                         camera.full_proj_transform)
        if timings is not None:
            jax.block_until_ready(vis)
            t2 = time.perf_counter()
            timings["bake_mesh_io_s"] = timings.get("bake_mesh_io_s", 0.0) + (t1 - t0)
            timings["net_vis_s"] = timings.get("net_vis_s", 0.0) + (t2 - t1)
        return updates, vis
