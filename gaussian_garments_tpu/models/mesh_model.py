"""Garment mesh + cloth energies (TPU-native MeshModel).

Reference: ``scene/mesh_model.py`` — StVK membrane stretching (:128-157),
dihedral bending (:95-126), cubic body-collision penalty (:177-183),
virtual-edge anti-collapse (:159-161), inertial/gravity (:185-194, λ=0 by
default), momentum rest-shape update (:47-57), with the exact material
constants (:23-27).

TPU design: the mesh state is an immutable pytree (``MeshState``) whose
connectivity tables are static numpy precompute (``geometry.build_connectivity``,
host, once per template); every energy is a batched gather + segment reduction
in jnp, differentiable w.r.t. vertices, so the whole cloth term jits into the
stage-2 training step.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussian_garments_tpu import geometry as geo

# material constants (reference scene/mesh_model.py:23-27)
DENSITY = 0.20022
LAME_MU = 23600.0
LAME_LAMBDA = 44400.0
BENDING_COEFF = 3.9625778333333325e-05
THICKNESS = 4.7e-4


@struct.dataclass
class MeshState:
    """All per-template mesh state needed by the cloth energies."""

    # geometry (v is the optimized tensor; vt the template rest pose)
    v: jnp.ndarray                  # (V,3) current vertices
    vt: jnp.ndarray                 # (V,3) template vertices
    f: jnp.ndarray                  # (F,3) int32 faces

    # static rest-state quantities
    v_mass: jnp.ndarray             # (V,1)
    f_area: jnp.ndarray             # (F,1)
    dm_inv: jnp.ndarray             # (F,2,2) (momentum-updated per frame)
    f_connectivity: jnp.ndarray     # (E,2) adjacent faces per interior edge
    f_connectivity_edges: jnp.ndarray  # (E,2) edge vertex ids
    edges: jnp.ndarray              # (Eall,2) unique mesh edges
    virtual_edge: jnp.ndarray       # (Ev,2) opposed face pairs
    ve_len: jnp.ndarray             # (Ev,) rest virtual-edge lengths

    # body collision (set by init_body; zero-size placeholders otherwise)
    nn_points: jnp.ndarray          # (V,3) nearest body-face centers
    nn_normals: jnp.ndarray         # (V,3) their normals
    has_body: bool = struct.field(pytree_node=False, default=False)

    # inertial target
    tar_v: Optional[jnp.ndarray] = None


def create(vt: np.ndarray, ft: np.ndarray) -> MeshState:
    """Build MeshState from a template mesh (reference __init__/init_compute)."""
    vt = np.asarray(vt, np.float32)
    ft = np.asarray(ft, np.int64)
    conn = geo.build_connectivity(vt, ft)
    v_j = jnp.asarray(vt)
    f_j = jnp.asarray(ft.astype(np.int32))
    return MeshState(
        v=v_j,
        vt=v_j,
        f=f_j,
        v_mass=geo.vertex_mass(v_j, f_j, DENSITY)[:, None],
        f_area=geo.face_areas(v_j, f_j)[:, None],
        dm_inv=geo.make_dm_inv(v_j, f_j),
        f_connectivity=jnp.asarray(conn["f_connectivity"].astype(np.int32)),
        f_connectivity_edges=jnp.asarray(conn["f_connectivity_edges"].astype(np.int32)),
        edges=jnp.asarray(conn["edges"].astype(np.int32)),
        virtual_edge=jnp.asarray(conn["virtual_edge"].astype(np.int32)),
        ve_len=jnp.asarray(conn["ve_len"]),
        nn_points=jnp.zeros_like(v_j),
        nn_normals=jnp.zeros_like(v_j),
        has_body=False,
        tar_v=v_j,
    )


def momentum_update(mesh: MeshState, v_new: jnp.ndarray, me: float = 0.3, mve: float = 0.3) -> MeshState:
    """Blend the rest-shape matrix & virtual-edge lengths toward the previous
    frame (reference momentum_update :47-57): Dm⁻¹ ← ((1−Me)·Dm_new + Me·Dm_t)⁻¹."""
    new_dm = jnp.linalg.inv(geo.make_dm_inv(v_new, mesh.f))
    tmp_dm = jnp.linalg.inv(geo.make_dm_inv(mesh.vt, mesh.f))
    dm_inv = jnp.linalg.inv(new_dm * (1 - me) + tmp_dm * me)
    new_ve = geo.get_ve_len(mesh.virtual_edge, v_new, mesh.f)
    tmp_ve = geo.get_ve_len(mesh.virtual_edge, mesh.vt, mesh.f)
    return mesh.replace(dm_inv=dm_inv, ve_len=new_ve * (1 - mve) + tmp_ve * mve)


def init_body(mesh: MeshState, body_v: np.ndarray, body_f: np.ndarray,
              collision_face_ids: np.ndarray) -> MeshState:
    """Bind each garment vertex to its precomputed nearest body face
    (reference init_body :163-175; the NN binding itself is done by the Scene
    via a host KDTree, like ``scene/scene.py:114-120``)."""
    bv = jnp.asarray(np.asarray(body_v, np.float32))
    bf = jnp.asarray(np.asarray(body_f, np.int64).astype(np.int32))
    fc = bv[bf].mean(axis=1)
    normals = geo.face_normals(bv, bf)
    ids = jnp.asarray(np.asarray(collision_face_ids).reshape(-1).astype(np.int32))
    return mesh.replace(nn_points=fc[ids], nn_normals=normals[ids], has_body=True)


# ---------------------------------------------------------------------------
# energies (all differentiable w.r.t. mesh.v)
# ---------------------------------------------------------------------------

def bending_energy(mesh: MeshState) -> jnp.ndarray:
    """Dihedral bending: Σ k·(l²/4a)·θ²/2 over interior edges
    (reference bending_energy :95-126)."""
    fn = geo.face_normals(mesh.v, mesh.f)
    n0 = fn[mesh.f_connectivity[:, 0]]
    n1 = fn[mesh.f_connectivity[:, 1]]
    v0 = mesh.v[mesh.f_connectivity_edges[:, 0]]
    v1 = mesh.v[mesh.f_connectivity_edges[:, 1]]
    e = v1 - v0
    l = jnp.linalg.norm(e, axis=-1, keepdims=True)
    e_norm = e / jnp.maximum(l, 1e-12)

    a = mesh.f_area[:, 0][mesh.f_connectivity].sum(axis=-1)
    cos = (n0 * n1).sum(-1)
    sin = (e_norm * jnp.cross(n0, n1)).sum(-1)
    theta = jnp.arctan2(sin, cos)
    scale = l[:, 0] ** 2 / (4.0 * a)
    return (BENDING_COEFF * scale * theta**2 / 2.0).sum()


def stretching_energy(mesh: MeshState) -> jnp.ndarray:
    """StVK membrane: Σ area·thickness·tr(Sᵀ G), S = μG + ½λ tr(G) I
    (reference stretching_energy :128-157)."""
    tri = geo.gather_triangles(mesh.v, mesh.f)
    F = geo.deformation_gradient(tri, mesh.dm_inv)  # (F,3,2)
    G = geo.green_strain_tensor(F)                   # (F,2,2)
    g_trace = jnp.trace(G, axis1=-2, axis2=-1)
    I = jnp.eye(2, dtype=G.dtype)
    S = LAME_MU * G + 0.5 * LAME_LAMBDA * g_trace[:, None, None] * I
    energy_density = jnp.trace(jnp.swapaxes(S, -1, -2) @ G, axis1=-2, axis2=-1)
    return (mesh.f_area[:, 0] * THICKNESS * energy_density).sum()


def collision_energy(mesh: MeshState, eps: float = 1e-3) -> jnp.ndarray:
    """Cubic penetration penalty vs the bound body faces
    (reference collision :177-183)."""
    distance = ((mesh.v - mesh.nn_points) * mesh.nn_normals).sum(-1)
    interpenetration = jnp.maximum(eps - distance, 0.0)
    return (interpenetration**3).sum()


def virtual_edge_energy(mesh: MeshState) -> jnp.ndarray:
    """Penalize only *compressed* virtual edges (reference penalize_virtual).
    A template with no opposed faces (flat sheet) has zero virtual edges —
    return 0 instead of the NaN an empty mean would give."""
    if mesh.virtual_edge.shape[0] == 0:
        return jnp.zeros(())
    cur = geo.get_ve_len(mesh.virtual_edge, mesh.v, mesh.f)
    return jnp.maximum(mesh.ve_len - cur, 0.0).mean()


def inertial_energy(mesh: MeshState, timestep: float = 1.0 / 30.0) -> jnp.ndarray:
    """(reference inertial :185-190; λ=0 by default — note the reference
    detaches v, making this a constant; we keep v differentiable, which is the
    physically-meaningful version, and document the deviation)."""
    x_diff = mesh.tar_v - mesh.v
    num = (x_diff * mesh.v_mass * x_diff).sum(-1)
    return (num / (2 * timestep**2)).sum()


def gravitational_energy(mesh: MeshState, g: float = 9.81) -> jnp.ndarray:
    return (g * mesh.v_mass[:, 0] * mesh.v[:, 1]).sum()


def get_energy_loss(mesh: MeshState, opt, use_body: bool) -> Dict[str, jnp.ndarray]:
    """Dispatch matching reference get_energy_loss (:196-205)."""
    loss = {
        "bending": bending_energy(mesh) * opt.lambda_bending,
        "stretching": stretching_energy(mesh) * opt.lambda_stretching,
    }
    if use_body:
        loss["collision"] = collision_energy(mesh) * opt.lambda_collision
    else:
        loss["virtual_edge"] = virtual_edge_energy(mesh) * opt.lambda_virtual
    return loss
