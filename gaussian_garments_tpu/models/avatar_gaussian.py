"""UV-texel Gaussians — TPU-native AvatarGaussianModel / AvatarSimulationModel.

Reference: ``scene/avatar_gaussian_model.py``. One Gaussian per texel inside
the template's UV islands:

- a software scanline rasterizer fills the (res×res) **bind map** with the
  face id owning each texel (:170-225) — host precompute, cached;
- each texel stores the barycentric coordinates of its center inside its UV
  triangle (:59-62, via barycentric_2D), giving a 3D anchor on the deforming
  mesh (``get_barycentric_3d`` :151-159);
- world position = face frame · local offset · face scale + anchor
  (:140-148); the appearance net adds Δxyz to the local offset
  (``get_final_xyz``) and ΔSH to the features;
- appearance initialization copies the stage-2 Template splats' attributes
  through a nearest-neighbor lookup in world space (:69-138).

All per-iteration math is jnp; the bind map and NN init are host-side
one-time precompute like the reference.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussian_garments_tpu import geometry as geo
from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.models import mesh_gaussian as MG


def rasterize_uv_bind_map(uvs: np.ndarray, texture_faces: np.ndarray, res: int) -> np.ndarray:
    """(res,res) int bind map, -1 where no face covers the texel.

    Scanline fill with the reference's exact pixel rule
    (``avatar_gaussian_model.py:196-225``): pixel centers (x+.5, y+.5),
    y ∈ [v1.y, v3.y), x ∈ [fmin, fmax); later faces overwrite earlier ones.
    """
    bind_map = np.full((res, res), -1, np.int64)
    uv_px = np.asarray(uvs, np.float64) * res

    for fi, tf in enumerate(np.asarray(texture_faces)):
        tri = uv_px[tf]
        order = np.argsort(tri[:, 1], kind="stable")
        v1, v2, v3 = tri[order]
        if v3[1] == v1[1]:
            continue
        # v4: point on edge v1-v3 at v2's height
        t = (v2[1] - v1[1]) / (v3[1] - v1[1])
        v4 = v1 + (v3 - v1) * t
        ys = np.arange(int(np.floor(tri[:, 1].min())), int(np.floor(tri[:, 1].max())) + 1)
        yc = ys + 0.5
        ok = (yc >= v1[1]) & (yc < v3[1])
        for _y, y in zip(ys[ok], yc[ok]):
            if y < v2[1]:
                a, b = v1, v2
                c, d = v1, v4
            else:
                a, b = v3, v2
                c, d = v3, v4
            x1 = a[0] + (b[0] - a[0]) * (y - a[1]) / (b[1] - a[1]) if b[1] != a[1] else a[0]
            x2 = c[0] + (d[0] - c[0]) * (y - c[1]) / (d[1] - c[1]) if d[1] != c[1] else c[0]
            fmin, fmax = sorted([x1, x2])
            xs = np.arange(int(np.floor(fmin)), int(np.floor(fmax)) + 1)
            xc = xs + 0.5
            xs = xs[(xc >= fmin) & (xc < fmax)]
            if len(xs) and 0 <= _y < res:
                xs = xs[(xs >= 0) & (xs < res)]
                bind_map[_y, xs] = fi
    return bind_map


@struct.dataclass
class AvatarBinding:
    """Static texel→face binding (host precompute, pytree of jnp constants).

    Two layouts share this container:

    - **compact** (reference semantics): G = number of texels inside a UV
      island; ``alive is None``.
    - **dense** (TPU fast path, ``build_binding(dense=True)``): G = res² in
      row-major texel order, so ``gather_texture``/``scatter_texture`` are
      reshapes instead of (res²,·)-row gathers (the (res²,51) f32 gather +
      its VJP scatter cost ~8.5 ms each at 512² — MEASUREMENTS.md "gather
      cliff"). Dead texels carry a clamped face-0 binding and are masked out
      of rendering (opacity · alive) and of the loss reductions.
    """

    binding: jnp.ndarray      # (G,) int32 face ids
    gs_bc: jnp.ndarray        # (G,3) barycentric coords of the texel center
    flat_idx: jnp.ndarray     # (G,) int32 = gs_u*res + gs_v (row-major texel)
    gs_u: jnp.ndarray         # (G,) int32 row (v) index
    gs_v: jnp.ndarray         # (G,) int32 col (u) index
    alive: Optional[jnp.ndarray] = None  # (G,) bool — dense layout only
    texture_size: int = struct.field(pytree_node=False, default=512)
    dense: bool = struct.field(pytree_node=False, default=False)


def build_binding(uvs: np.ndarray, texture_faces: np.ndarray, res: int,
                  bind_map: Optional[np.ndarray] = None,
                  dense: bool = False) -> Tuple[AvatarBinding, np.ndarray]:
    """Bind map + barycentric anchors (reference __init__ :47-65)."""
    if bind_map is None:
        bind_map = rasterize_uv_bind_map(uvs, texture_faces, res)
    mask = bind_map > -1
    if dense:
        idx = np.arange(res * res)
        gs_u, gs_v = idx // res, idx % res
        alive = mask.reshape(-1)
        binding = np.where(alive, bind_map.reshape(-1), 0)
    else:
        gs_u, gs_v = np.where(mask)
        binding = bind_map[mask]
        alive = None
    uv_tri = np.asarray(uvs)[np.asarray(texture_faces)][binding] * res   # (G,3,2)
    uv_gs = np.stack([gs_v, gs_u], axis=1) + 0.5
    a, b, c = geo.barycentric_2d(jnp.asarray(uv_tri.astype(np.float32)),
                                 jnp.asarray(uv_gs.astype(np.float32)))
    bc = np.stack([np.asarray(a), np.asarray(b), np.asarray(c)], axis=1)
    if dense:
        # dead texels: anchor at v0 of the clamped face (finite, render-masked)
        bc = np.where(alive[:, None], bc, np.array([1.0, 0.0, 0.0]))
    bind = AvatarBinding(
        binding=jnp.asarray(binding.astype(np.int32)),
        gs_bc=jnp.asarray(bc.astype(np.float32)),
        flat_idx=jnp.asarray((gs_u * res + gs_v).astype(np.int32)),
        gs_u=jnp.asarray(gs_u.astype(np.int32)),
        gs_v=jnp.asarray(gs_v.astype(np.int32)),
        alive=None if alive is None else jnp.asarray(alive),
        texture_size=res,
        dense=dense,
    )
    return bind, bind_map


# ---------------------------------------------------------------------------
# differentiable texel geometry
# ---------------------------------------------------------------------------

def barycentric_3d(bind: AvatarBinding, mesh_v: jnp.ndarray, mesh_f: jnp.ndarray,
                   rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """3D anchor of each texel on the current mesh (reference :151-159).

    Column-wise over a per-face flattened vertex table: the nested
    ``mesh_v[mesh_f[binding]]`` gather + batched (G,3)·(G,3,3) einsum cost
    9.7 ms at 262K texels on TPU; one (G,9) row-gather + 9 fused
    multiply-adds replace it (``scripts/profile_vis.py``)."""
    if rows is None:
        tv = mesh_v[mesh_f].reshape(-1, 9)[bind.binding]    # (G,9)
    else:
        tv = rows[:, MG.FR_V]
    bc = bind.gs_bc
    return jnp.stack([
        bc[:, 0] * tv[:, 0 + c] + bc[:, 1] * tv[:, 3 + c]
        + bc[:, 2] * tv[:, 6 + c] for c in range(3)], axis=1)


def avatar_world_xyz(local_xyz: jnp.ndarray, bind: AvatarBinding,
                     frames: MG.FaceFrames, anchor: jnp.ndarray,
                     rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """world = R_face @ local · s_face + anchor (reference get_xyz /
    get_final_xyz :140-148)."""
    if rows is None:
        rows = MG.gather_frame_rows(frames, bind.binding)
    xyz = MG.rows_rot_apply(rows[:, MG.FR_R], local_xyz)
    return xyz * rows[:, MG.FR_S] + anchor


def local_offset(bind: AvatarBinding, frames: MG.FaceFrames, gs_3d: jnp.ndarray,
                 rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """World anchor → local face-frame offset (reference get_local_offset)."""
    if rows is None:
        rows = MG.gather_frame_rows(frames, bind.binding)
    global_off = (gs_3d - rows[:, MG.FR_C]) / rows[:, MG.FR_S]
    return MG.rows_rot_apply_t(rows[:, MG.FR_R], global_off)  # Rᵀ @ offset


def scatter_texture(bind: AvatarBinding, values: jnp.ndarray, channels: int) -> jnp.ndarray:
    """(G,C) texel values → (C,res,res) texture (zeros elsewhere)."""
    res = bind.texture_size
    if bind.dense:
        flat = values * bind.alive[:, None].astype(values.dtype)
    else:
        flat = jnp.zeros((res * res, channels), values.dtype).at[bind.flat_idx].set(values)
    return flat.reshape(res, res, channels).transpose(2, 0, 1)


def gather_texture(bind: AvatarBinding, texture: jnp.ndarray) -> jnp.ndarray:
    """(C,res,res) texture → (G,C) per-texel rows (reference
    ``shadow_out[self.gaussian_mask]``). Dense layout: a reshape (no gather)."""
    res = bind.texture_size
    flat = texture.transpose(1, 2, 0).reshape(res * res, -1)
    if bind.dense:
        return flat
    return flat[bind.flat_idx]


# ---------------------------------------------------------------------------
# initialization from the stage-2 Template splats
# ---------------------------------------------------------------------------

def init_from_template(
    bind: AvatarBinding,
    template_v: np.ndarray,
    template_f: np.ndarray,
    world_ply_path: str,
    local_ply_path: str,
    max_sh_degree: int,
) -> Tuple[G.GaussianParams, G.GaussianAux]:
    """NN-copy splat attributes from the stage-2 Template point clouds
    (reference init_gaussians :69-138): local xyz starts at zero; features/
    scales/rotations/opacity come from the nearest Template splat in world
    space."""
    from scipy.spatial import cKDTree
    from gaussian_garments_tpu.utils.io import read_ply

    v_j = jnp.asarray(np.asarray(template_v, np.float32))
    f_j = jnp.asarray(np.asarray(template_f, np.int64).astype(np.int32))
    frames = MG.compute_face_frames(v_j, f_j)
    gs_3d = np.asarray(barycentric_3d(bind, v_j, f_j))

    world = read_ply(world_ply_path)
    world_xyz = np.stack([world["x"], world["y"], world["z"]], axis=1)
    _, nb = cKDTree(world_xyz).query(gs_3d)

    try:
        local_params, _ = G.load_ply(local_ply_path, max_sh_degree)
    except AssertionError:
        # stage-2 runs with sh_degree=0 (s2_registration.py:158); higher-order
        # coefficients start at zero — the reference swallows the mismatch the
        # same way (avatar_gaussian_model.py:99-110 try/except)
        local_params, _ = G.load_ply(local_ply_path, 0)
        r = (max_sh_degree + 1) ** 2 - 1
        local_params = local_params.replace(
            features_rest=jnp.zeros((local_params.xyz.shape[0], r, 3), jnp.float32))
    take = lambda a: np.asarray(a)[nb]

    n = len(gs_3d)
    params = G.GaussianParams(
        xyz=jnp.zeros((n, 3), jnp.float32),
        features_dc=jnp.asarray(take(local_params.features_dc)),
        features_rest=jnp.asarray(take(local_params.features_rest)),
        scaling=jnp.asarray(take(local_params.scaling)),
        rotation=jnp.asarray(take(local_params.rotation)),
        opacity=jnp.asarray(take(local_params.opacity)),
    )
    aux = G.GaussianAux(
        alive=jnp.ones((n,), bool),
        max_radii2d=jnp.zeros((n,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((n, 1), jnp.float32),
        denom=jnp.zeros((n, 1), jnp.float32),
    )
    return params, aux


def densify_params(bind: AvatarBinding, params: G.GaussianParams) -> G.GaussianParams:
    """Compact-layout (G_alive,·) params → dense res² rows (host one-time).
    Dead rows are zeros except rotation = identity (NaN-free quat math)."""
    assert bind.dense, "densify_params needs a dense binding"
    res = bind.texture_size
    alive = np.asarray(bind.alive)
    out = {}
    for name in G.PARAM_NAMES:
        val = np.asarray(getattr(params, name))
        full = np.zeros((res * res, *val.shape[1:]), val.dtype)
        full[alive] = val
        out[name] = jnp.asarray(full)
    p = G.GaussianParams(**out)
    unit = jnp.array([1.0, 0.0, 0.0, 0.0], p.rotation.dtype)
    return p.replace(rotation=jnp.where(bind.alive[:, None], p.rotation, unit[None]))


def adapt_params_layout(bind: AvatarBinding, params: G.GaussianParams) -> G.GaussianParams:
    """Convert checkpointed splat rows between the compact and dense texel
    layouts so checkpoints stay layout-independent. No-op when the row count
    already matches ``bind``."""
    rows = params.xyz.shape[0]
    if rows == bind.binding.shape[0]:
        return params
    if bind.dense:
        return densify_params(bind, params)
    # dense checkpoint → compact rows: take the alive texels in row-major
    # order (flat_idx is exactly that order)
    take = np.asarray(bind.flat_idx)
    return G.GaussianParams(**{
        k: jnp.asarray(np.asarray(getattr(params, k))[take]) for k in G.PARAM_NAMES})


def init_empty(bind: AvatarBinding, max_sh_degree: int) -> G.GaussianParams:
    """AvatarSimulationModel.init_empty_gaussians (:318-332): zero splats to
    be filled from a texture checkpoint."""
    n = bind.binding.shape[0]
    r = (max_sh_degree + 1) ** 2 - 1
    return G.GaussianParams(
        xyz=jnp.zeros((n, 3), jnp.float32),
        features_dc=jnp.zeros((n, 1, 3), jnp.float32),
        features_rest=jnp.zeros((n, r, 3), jnp.float32),
        scaling=jnp.zeros((n, 3), jnp.float32),
        rotation=jnp.zeros((n, 4), jnp.float32),
        opacity=jnp.zeros((n, 1), jnp.float32),
    )


# ---------------------------------------------------------------------------
# texture-space (de)serialization (AvatarSimulationModel :334-360)
# ---------------------------------------------------------------------------

def gaussian_maps(bind: AvatarBinding, params: G.GaussianParams) -> Dict[str, np.ndarray]:
    """Pack splat attributes into (res,res,·) textures + mask.

    The on-disk format is layout-independent: dense-layout rows at dead
    texels are zeroed so a dense run writes the same checkpoint a compact
    run would."""
    res = bind.texture_size
    mask = np.zeros((res, res), bool)
    if bind.alive is not None:
        mask = np.asarray(bind.alive).reshape(res, res)
    else:
        mask[np.asarray(bind.gs_u), np.asarray(bind.gs_v)] = True
    out = {"mask": mask}
    for name in G.PARAM_NAMES:
        val = np.asarray(getattr(params, name))
        tex = np.zeros((res, res, *val.shape[1:]), val.dtype)
        tex[np.asarray(bind.gs_u), np.asarray(bind.gs_v)] = val
        tex[~mask] = 0
        out[name] = tex
    return out


def load_gaussian_maps(maps: Dict[str, np.ndarray],
                       bind: Optional[AvatarBinding] = None) -> G.GaussianParams:
    """Texture checkpoint → params. Pass a dense ``bind`` to load into the
    dense layout (full res² rows; dead rotations patched to identity so the
    masked-out rows stay NaN-free through quat math)."""
    if bind is not None and bind.dense:
        res = bind.texture_size
        params = G.GaussianParams(**{
            k: jnp.asarray(np.asarray(maps[k]).reshape(res * res, *maps[k].shape[2:]))
            for k in G.PARAM_NAMES})
        unit = jnp.array([1.0, 0.0, 0.0, 0.0], params.rotation.dtype)
        return params.replace(rotation=jnp.where(
            bind.alive[:, None], params.rotation, unit[None]))
    mask = maps["mask"]
    return G.GaussianParams(**{k: jnp.asarray(maps[k][mask]) for k in G.PARAM_NAMES})


# ---------------------------------------------------------------------------
# visibility
# ---------------------------------------------------------------------------

def get_visible_mask_exact(bind: AvatarBinding, mesh_v, mesh_f, cam_center) -> jnp.ndarray:
    """Per-texel ray-cast visibility, the reference's semantics
    (:227-263): visible iff the camera→anchor ray's first hit is the texel's
    own face. O(G·F) in jnp (use for parity tests / offline)."""
    from gaussian_garments_tpu.ops.raytrace import raycast_jnp

    gs_3d = barycentric_3d(bind, mesh_v, mesh_f)
    d = gs_3d - cam_center[None]
    dirs = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    origins = jnp.broadcast_to(cam_center[None], gs_3d.shape)
    _, pid = raycast_jnp(origins, dirs, mesh_v, mesh_f)
    return pid == bind.binding


def get_visible_mask_depth(bind: AvatarBinding, mesh_v, mesh_f, viewmatrix, projmatrix,
                           *, image_width: int, image_height: int,
                           rel_tol: float = 5e-3,
                           rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-texel depth-buffer visibility — in-jit, per-texel-exact semantics.

    The reference ray-casts camera→anchor per texel and asks whether the first
    hit is the texel's own face (avatar_gaussian_model.py:227-263). The
    shadow-map formulation is equivalent at raster granularity: render the
    mesh depth buffer, project each texel anchor, and mark it visible iff its
    view depth is within ``rel_tol`` of the nearest surface along that pixel.
    O(texels) + one mesh raster, vs the O(texels · faces) exact ray cast.

    Agreement with ``get_visible_mask_exact`` on the synthetic half-occluded
    scene: 0.95 at 256²-512² (the face-granular raster approximation this
    replaces scores 0.90; the residual is nearest-pixel quantization at
    silhouettes plus the exact test's own first-hit-neighbor-graze
    strictness, which mislabels ~3.5% of an unoccluded sheet).
    """
    from gaussian_garments_tpu.ops.mesh_raster import project_mesh, rasterize_mesh

    _, depth_buf = rasterize_mesh(mesh_v, mesh_f, viewmatrix, projmatrix,
                                  image_width=image_width, image_height=image_height)
    anchors = barycentric_3d(bind, mesh_v, mesh_f, rows=rows)
    xy, z = project_mesh(anchors, viewmatrix, projmatrix, image_width, image_height)
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, image_width - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, image_height - 1)
    # single flat index: a (G,2)-index 2D gather lowers as a slower
    # mixed-index gather on TPU than the 1D flattened form
    sampled = depth_buf.reshape(-1)[yi * image_width + xi]
    return (z > 0.0) & (z <= sampled * (1.0 + rel_tol))


def get_visible_mask_raster(bind: AvatarBinding, mesh_v, mesh_f, viewmatrix, projmatrix,
                            *, image_width: int, image_height: int) -> jnp.ndarray:
    """Fast in-jit visibility: a face-id buffer render; a texel is visible iff
    its bound face owns ≥1 pixel. Face-granular approximation of the
    reference's per-texel ray-cast (documented deviation; faces are ~1 texel
    group at 512² on an 8k-face template)."""
    from gaussian_garments_tpu.ops.mesh_raster import visible_faces

    vis = visible_faces(mesh_v, mesh_f, viewmatrix, projmatrix,
                        image_width=image_width, image_height=image_height)
    return vis[bind.binding]
