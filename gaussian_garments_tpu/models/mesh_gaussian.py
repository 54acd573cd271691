"""Mesh-attached Gaussians — TPU-native MeshGaussianModel.

Reference: ``scene/mesh_gaussian_model.py``. Every splat is bound to one
template face (``binding``); its world-space pose is the local parameter
transformed by the face's orthonormal frame + isotropic scale, recomputed from
the deforming mesh every iteration (``update_face_coor`` :90-95):

    xyz_world   = R_face @ xyz_local · s_face + face_center          (:123-128)
    scale_world = exp(scaling_local) · s_face                        (:106-115)
    rot_world   = q_face ⊗ q_local                                   (:117-122)

TPU design: the face frames are a pure function of (mesh.v, mesh.f) → jnp
batch (`compute_face_frames`), fully differentiable, so ∂loss/∂mesh.v flows
through the rendered image — the mechanism stage 2 uses to track geometry.
Binding-aware densify/clone/split/prune (keeping ≥1 splat per face,
:130-208) are host-side structural edits like the base model's.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussian_garments_tpu import geometry as geo
from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.utils.quaternion import (
    normalize as quat_normalize,
    quat_multiply,
    quat_to_rotmat,
    rotmat_to_quat,
)


@struct.dataclass
class FaceFrames:
    center: jnp.ndarray     # (F,3)
    orien_mat: jnp.ndarray  # (F,3,3) columns a0|a1|a2
    orien_quat: jnp.ndarray  # (F,4) wxyz
    scaling: jnp.ndarray    # (F,)


def compute_face_frames(v: jnp.ndarray, f: jnp.ndarray) -> FaceFrames:
    """update_face_coor (:90-95): frames from current mesh vertices."""
    orien, scale = geo.compute_face_orientation(v, f)
    quat = rotmat_to_quat(orien)
    return FaceFrames(center=v[f].mean(axis=1), orien_mat=orien, orien_quat=quat, scaling=scale)


# ---------------------------------------------------------------------------
# local -> world (differentiable, inside jit)
#
# Column-wise frame rows: the per-splat (3,3)/(4,)/(1,)/(3,) gathers and the
# batched tiny ``einsum("mij,mj->mi")`` matmuls materialize (8,128)-padded
# (N,3,3) intermediates on TPU (the same pathology the column-wise cov3d
# rewrite removed from projection — MEASUREMENTS.md). Instead the F-row frame
# table is flattened once and ONE wide row-gather feeds pure column
# arithmetic; gather cost on TPU is per ROW, width nearly free.
# ---------------------------------------------------------------------------

# frame-row table layout (frame_rows / gather_frame_rows)
FR_R = slice(0, 9)        # R row-major (R[i,j] at 3i+j)
FR_Q = slice(9, 13)       # normalized wxyz quaternion
FR_S = slice(13, 14)      # isotropic face scale
FR_C = slice(14, 17)      # face center
FR_V = slice(17, 26)      # face vertices v0|v1|v2 (only with mesh_v/mesh_f)


def frame_rows(frames: FaceFrames, mesh_v: Optional[jnp.ndarray] = None,
               mesh_f: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(F,17) flattened frame table — or (F,26) with the face-vertex columns
    appended (for barycentric anchors). All work here is F-sized (cheap)."""
    cols = [
        frames.orien_mat.reshape(-1, 9),
        quat_normalize(frames.orien_quat),
        frames.scaling[:, None],
        frames.center,
    ]
    if mesh_v is not None:
        cols.append(mesh_v[mesh_f].reshape(-1, 9))
    return jnp.concatenate(cols, axis=1)


def gather_frame_rows(frames: FaceFrames, binding: jnp.ndarray,
                      mesh_v: Optional[jnp.ndarray] = None,
                      mesh_f: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One (N, 17|26) row-gather of the frame table. Hot paths compute this
    once and pass it to every ``rows=``-accepting geometry function."""
    return frame_rows(frames, mesh_v, mesh_f)[binding]


def rows_rot_apply(r9: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """R @ v with R as row-major columns: out_i = Σ_j r9[:,3i+j]·v_j."""
    return jnp.stack([
        r9[:, 3 * i + 0] * vec[:, 0] + r9[:, 3 * i + 1] * vec[:, 1]
        + r9[:, 3 * i + 2] * vec[:, 2] for i in range(3)], axis=1)


def rows_rot_apply_t(r9: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Rᵀ @ v: out_j = Σ_i r9[:,3i+j]·v_i."""
    return jnp.stack([
        r9[:, 0 + j] * vec[:, 0] + r9[:, 3 + j] * vec[:, 1]
        + r9[:, 6 + j] * vec[:, 2] for j in range(3)], axis=1)


def world_xyz(params: G.GaussianParams, binding: jnp.ndarray, frames: FaceFrames,
              rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if rows is None:
        rows = gather_frame_rows(frames, binding)
    xyz = rows_rot_apply(rows[:, FR_R], params.xyz)
    return xyz * rows[:, FR_S] + rows[:, FR_C]


def world_scaling(params: G.GaussianParams, binding: jnp.ndarray, frames: FaceFrames,
                  rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    fs = rows[:, FR_S] if rows is not None else frames.scaling[binding][:, None]
    return jnp.exp(params.scaling) * fs


def world_rotation(params: G.GaussianParams, binding: jnp.ndarray, frames: FaceFrames,
                   rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    # the table stores the quat already normalized (normalize commutes with
    # the gather)
    q_face = rows[:, FR_Q] if rows is not None \
        else quat_normalize(frames.orien_quat[binding])
    q_local = quat_normalize(params.rotation)
    return quat_normalize(quat_multiply(q_face, q_local))


def local_to_world(params: G.GaussianParams, binding: jnp.ndarray, frames: FaceFrames) -> G.GaussianParams:
    """Bake face frames into the raw tensors (reference local_to_world :212-221)."""
    return params.replace(
        xyz=world_xyz(params, binding, frames),
        scaling=jnp.log(jnp.maximum(world_scaling(params, binding, frames), 1e-20)),
        rotation=world_rotation(params, binding, frames),
    )


# ---------------------------------------------------------------------------
# creation
# ---------------------------------------------------------------------------

def create_from_template(
    template_vertices: np.ndarray,
    template_faces: np.ndarray,
    face_colors: np.ndarray,
    max_sh_degree: int,
    capacity: Optional[int] = None,
) -> Tuple[G.GaussianParams, G.GaussianAux, np.ndarray, np.ndarray]:
    """One splat per face: local xyz = 0, color from the stage-1 dense cloud
    (reference __init__ :58-72 + create_from_pcd :223-247 — note the quirk
    that initial log-scales come from *world* NN distances of the face
    centers although ``_scaling`` is local; reproduced for parity).

    Returns (params, aux, binding (N,), binding_counter (F,)).
    """
    tv = np.asarray(template_vertices, np.float32)
    tf = np.asarray(template_faces, np.int64)
    centers = tv[tf].mean(axis=1)
    n = len(tf)

    params, aux = G.create_from_pcd(centers, face_colors, max_sh_degree, capacity)
    # local positions start at the face anchor (zeros)
    params = params.replace(xyz=jnp.zeros_like(params.xyz))
    binding = np.arange(n, dtype=np.int64)
    binding_counter = np.ones(n, dtype=np.int32)
    capacity = params.xyz.shape[0]
    binding_padded = np.zeros(capacity, np.int64)
    binding_padded[:n] = binding
    return params, aux, binding_padded, binding_counter


# ---------------------------------------------------------------------------
# binding-aware structural edits (host-side)
# ---------------------------------------------------------------------------

def densify_and_prune(
    params: G.GaussianParams,
    aux: G.GaussianAux,
    adam: G.AdamState,
    binding: np.ndarray,
    binding_counter: np.ndarray,
    mesh_v: np.ndarray,
    mesh_f: np.ndarray,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: Optional[float],
    percent_dense: float,
    rng: Optional[np.random.RandomState] = None,
    grow_capacity: float = 1.5,
) -> Tuple[G.GaussianParams, G.GaussianAux, G.AdamState, np.ndarray, np.ndarray, Dict[str, int]]:
    """Binding-aware densify/clone/split/prune (reference :130-208).

    Thresholds use *world* scaling (local·face_scale); split keeps the
    reference's convention of writing the sampled world position back into the
    local ``_xyz`` slot (a reference quirk that works because face scales
    shrink the offset — reproduced for parity); pruning never removes the last
    splat of a face.
    """
    rng = rng or np.random.RandomState(0)
    old_capacity = params.xyz.shape[0]
    alive = np.asarray(aux.alive)
    bind = np.asarray(binding)[alive].copy()
    counter = np.asarray(binding_counter).copy()
    h = G._compact(params, aux, adam)

    frames_np = jax.tree.map(np.asarray, compute_face_frames(jnp.asarray(mesh_v), jnp.asarray(mesh_f.astype(np.int32))))

    def wscale(hh, bb):
        return np.exp(hh.params["scaling"]) * frames_np.scaling[bb][:, None]

    grads = h.grad_accum / np.maximum(h.denom, 1e-12)
    grads[~np.isfinite(grads)] = 0.0

    # --- clone ---
    ws = wscale(h, bind)
    clone_mask = (np.linalg.norm(grads, axis=-1) >= max_grad) & (ws.max(axis=1) <= percent_dense * extent)
    n_clone = int(clone_mask.sum())
    if n_clone:
        h = G._cat(h, {k: h.params[k][clone_mask] for k in G.PARAM_NAMES})
        new_b = bind[clone_mask]
        np.add.at(counter, new_b, 1)
        bind = np.concatenate([bind, new_b])
        grads = np.concatenate([grads, np.zeros((n_clone, 1), np.float32)])

    # --- split ---
    ws = wscale(h, bind)
    split_mask = (grads[:, 0] >= max_grad) & (ws.max(axis=1) > percent_dense * extent)
    n_split = int(split_mask.sum())
    if n_split:
        N = 2
        stds = np.repeat(ws[split_mask], N, axis=0)
        samples = rng.normal(0.0, 1.0, stds.shape).astype(np.float32) * stds
        rots = np.asarray(quat_to_rotmat(jnp.asarray(np.tile(h.params["rotation"][split_mask], (N, 1)))))
        # world position of the originals
        R = frames_np.orien_mat[bind[split_mask]]
        wxyz = (np.einsum("mij,mj->mi", R, h.params["xyz"][split_mask])
                * frames_np.scaling[bind[split_mask]][:, None]
                + frames_np.center[bind[split_mask]])
        new_xyz = np.einsum("nij,nj->ni", rots, samples) + np.tile(wxyz, (N, 1))
        face_s = frames_np.scaling[bind[split_mask]][:, None]
        new_local_scale = np.log(np.repeat(ws[split_mask] / face_s, N, axis=0) / (0.8 * N))
        new = {
            "xyz": new_xyz.astype(np.float32),
            "scaling": new_local_scale.astype(np.float32),
            "rotation": np.tile(h.params["rotation"][split_mask], (N, 1)),
            "features_dc": np.tile(h.params["features_dc"][split_mask], (N, 1, 1)),
            "features_rest": np.tile(h.params["features_rest"][split_mask], (N, 1, 1)),
            "opacity": np.tile(h.params["opacity"][split_mask], (N, 1)),
        }
        new_b = np.tile(bind[split_mask], N)
        np.add.at(counter, new_b, 1)
        n_before = h.params["xyz"].shape[0]
        h = G._cat(h, new)
        bind = np.concatenate([bind, new_b])
        keep = np.ones((h.params["xyz"].shape[0],), bool)
        keep[:n_before] = ~split_mask
        keep, bind, counter = _guarded_prune(~keep, bind, counter)
        h = G._select(h, keep)

    # --- prune ---
    opac = 1.0 / (1.0 + np.exp(-h.params["opacity"][:, 0]))
    prune = opac < min_opacity
    if max_screen_size:
        prune |= h.max_radii2d > max_screen_size
        prune |= wscale(h, bind).max(axis=1) > 0.1 * extent
    keep, bind, counter = _guarded_prune(prune, bind, counter)
    n_prune = int((~keep).sum())
    h = G._select(h, keep)

    n = h.params["xyz"].shape[0]
    capacity = old_capacity if n <= old_capacity else int(np.ceil(n * grow_capacity))
    new_params, new_aux, new_adam = G._repack(h, adam.step, capacity)
    bind_padded = np.zeros(capacity, np.int64)
    bind_padded[:n] = bind
    stats = {"n_clone": n_clone, "n_split": n_split, "n_prune": n_prune, "n_alive": n, "capacity": capacity}
    return new_params, new_aux, new_adam, bind_padded, counter, stats


def _guarded_prune(prune: np.ndarray, bind: np.ndarray, counter: np.ndarray):
    """Never prune the last splat of a face (reference prune_points :130-137),
    then decrement binding counters. Returns (keep_mask, new_bind, counter)."""
    to_prune_bind = bind[prune]
    decrement = np.zeros_like(counter)
    np.add.at(decrement, to_prune_bind, 1)
    redundant = (counter - decrement) > 0
    real_prune = prune.copy()
    real_prune[prune] = redundant[to_prune_bind]
    np.add.at(counter, bind[real_prune], -1)
    keep = ~real_prune
    return keep, bind[keep], counter


# ---------------------------------------------------------------------------
# ARAP regularizers (reference :381-417; caches built by the Scene)
# ---------------------------------------------------------------------------

class ArapCache(NamedTuple):
    """Previous-frame quantities for the ARAP terms (scene/scene.py:160-181)."""

    prev_rot: jnp.ndarray          # (M,4) world rotations at t-1
    prev_offset: jnp.ndarray       # (M,k,3) neighbor offsets at t-1
    neighbor_indices: jnp.ndarray  # (M,k)
    neighbor_weight: jnp.ndarray   # (M,k)
    prev_gv_offset: jnp.ndarray    # (M,3,3) splat->face-vertex offsets at t-1
    gv_neighbor_weight: jnp.ndarray  # (M,3)


def _rel_rot(prev_rot, curr_rot):
    prev_m = quat_to_rotmat(prev_rot)
    curr_m = quat_to_rotmat(curr_rot)
    return prev_m @ jnp.swapaxes(curr_m, -1, -2)


def gg_arap_loss(cache: ArapCache, xyz: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-Gaussian ARAP (reference GG_ARAP_loss :381-391)."""
    rel = _rel_rot(cache.prev_rot, rot)                              # (M,3,3)
    curr_offset = xyz[cache.neighbor_indices] - xyz[:, None]        # (M,k,3)
    in_prev = jnp.einsum("mij,mkj->mki", rel, curr_offset)
    sq = ((in_prev - cache.prev_offset) ** 2).sum(-1) * cache.neighbor_weight
    return jnp.sqrt(sq + 1e-20).mean()


def gv_arap_loss(cache: ArapCache, xyz: jnp.ndarray, rot: jnp.ndarray,
                 mesh_v: jnp.ndarray, mesh_f: jnp.ndarray, binding: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-vertex ARAP (reference GV_ARAP_loss :393-402)."""
    rel = _rel_rot(cache.prev_rot, rot)
    gv_offset = mesh_v[mesh_f[binding]] - xyz[:, None]               # (M,3,3)
    in_prev = jnp.einsum("mij,mkj->mki", rel, gv_offset)
    sq = ((in_prev - cache.prev_gv_offset) ** 2).sum(-1) * cache.gv_neighbor_weight
    return jnp.sqrt(sq + 1e-20).mean()


def dynamic_3d_loss(cache: ArapCache, xyz: jnp.ndarray, rot: jnp.ndarray, lam: float):
    """Rigid + rotation-consistency pair (reference dynamic3DLoss :404-417)."""
    rel = _rel_rot(cache.prev_rot, rot)
    curr_offset = xyz[cache.neighbor_indices] - xyz[:, None]
    in_prev = jnp.einsum("mij,mkj->mki", rel, curr_offset)
    rigid = jnp.sqrt(((in_prev - cache.prev_offset) ** 2).sum(-1) * cache.neighbor_weight + 1e-20).mean()
    rel_quat = rotmat_to_quat(rel)
    rot_term = jnp.sqrt(
        ((rel_quat[cache.neighbor_indices] - rel_quat[:, None]) ** 2).sum(-1) * cache.neighbor_weight + 1e-20
    ).mean()
    return {"rigid": rigid * lam, "rot": rot_term * lam}
