"""SMPL-X linear blend skinning (jnp).

Reference ``lbs.py`` (full file): batch Rodrigues (:10-30), kinematic-chain
rigid transforms (:44-72), the core ``lbs()`` (:172-243), and
``prepare_lbs`` un-pose/re-pose of garment vertices via nearest-body-vertex
blend weights (:96-169). The reference depends on the external ``smplx``
package for model data; here the model is a plain arrays container
(``SmplxModel``) loadable from the standard SMPL-X npz/pkl, so the math is
self-contained and jit-able.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NUM_BODY_JOINTS = 21


class SmplxModel(NamedTuple):
    """SMPL-X model tensors (numpy; converted to jnp at use)."""

    v_template: np.ndarray        # (V,3)
    shapedirs: np.ndarray         # (V,3,n_betas)
    expr_dirs: np.ndarray         # (V,3,n_expr)
    posedirs: np.ndarray          # (P, V*3)
    J_regressor: np.ndarray       # (J,V)
    parents: np.ndarray           # (J,)
    lbs_weights: np.ndarray       # (V,J)
    left_hand_components: np.ndarray   # (n_pca, 45)
    right_hand_components: np.ndarray  # (n_pca, 45)
    pose_mean: np.ndarray         # (165,)
    faces: np.ndarray             # (F,3)


def load_smplx_model(path: str) -> SmplxModel:
    """Load from the official SMPL-X .npz (or a pickled dict with the same
    keys)."""
    if path.endswith(".npz"):
        d = dict(np.load(path, allow_pickle=True))
    else:
        import pickle
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="latin1")
    shapedirs = np.asarray(d["shapedirs"], np.float32)
    n_pose = 4 * 9 if shapedirs.shape[-1] > 300 else 0  # unused
    pose_mean = _build_pose_mean(d)
    return SmplxModel(
        v_template=np.asarray(d["v_template"], np.float32),
        shapedirs=shapedirs[..., :10],
        expr_dirs=shapedirs[..., 300:310] if shapedirs.shape[-1] >= 310
        else np.zeros((*shapedirs.shape[:2], 10), np.float32),
        posedirs=np.asarray(d["posedirs"], np.float32).reshape(-1, 486).T
        if np.asarray(d["posedirs"]).ndim == 3 else np.asarray(d["posedirs"], np.float32),
        J_regressor=np.asarray(d["J_regressor"], np.float32),
        parents=np.asarray(d["kintree_table"])[0].astype(np.int64)
        if "kintree_table" in d else np.asarray(d["parents"], np.int64),
        lbs_weights=np.asarray(d["weights"], np.float32),
        left_hand_components=np.asarray(d.get("hands_componentsl", np.eye(45))[:12], np.float32),
        right_hand_components=np.asarray(d.get("hands_componentsr", np.eye(45))[:12], np.float32),
        pose_mean=pose_mean,
        faces=np.asarray(d["f"], np.int64) if "f" in d else np.asarray(d.get("faces"), np.int64),
    )


def _build_pose_mean(d: Dict) -> np.ndarray:
    pm = np.zeros(165, np.float32)
    if "hands_meanl" in d:
        pm[75:120] = np.asarray(d["hands_meanl"], np.float32)
        pm[120:165] = np.asarray(d["hands_meanr"], np.float32)
    return pm


def batch_rodrigues(rot_vecs: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """(N,3) axis-angle -> (N,3,3) rotations (reference :10-30)."""
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[:, None]
    sin = jnp.sin(angle)[:, None]
    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1).reshape(-1, 3, 3)
    ident = jnp.eye(3)[None]
    return ident + sin * K + (1 - cos) * (K @ K)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray):
    """Kinematic chain -> (posed_joints (B,J,3), rel_transforms (B,J,4,4));
    reference :44-72."""
    b, j = joints.shape[0], joints.shape[1]
    rel = joints.at[:, 1:].add(-joints[:, np.asarray(parents)[1:]])

    t = jnp.concatenate([rot_mats, rel[..., None]], axis=-1)      # (B,J,3,4)
    bottom = jnp.tile(jnp.asarray([0.0, 0, 0, 1])[None, None, None], (b, j, 1, 1))
    transforms_mat = jnp.concatenate([t, bottom], axis=-2)        # (B,J,4,4)

    chain = [transforms_mat[:, 0]]
    for i in range(1, j):
        chain.append(chain[int(parents[i])] @ transforms_mat[:, i])
    transforms = jnp.stack(chain, axis=1)

    posed_joints = transforms[:, :, :3, 3]
    jh = jnp.concatenate([joints, jnp.zeros((b, j, 1))], axis=-1)  # homogeneous w=0
    correction = jnp.einsum("bjxy,bjy->bjx", transforms, jh)
    rel_transforms = transforms.at[:, :, :3, 3].add(-correction[:, :, :3])
    return posed_joints, rel_transforms


def lbs(betas, pose, v_template, shapedirs, posedirs, J_regressor, parents, lbs_weights):
    """Core LBS (reference :172-243). Returns (A (J,4,4), verts (V,3),
    pose_offsets (V,3)) for batch element 0.

    Matmul precision pinned to f32 for the whole skinning chain: the TPU
    default rounds matmul inputs to bf16 (~2e-3 relative → ~2 mm on body
    vertices), while the reference smplx lbs is f32 torch. These matmuls run
    once per frame on (V,J)-sized operands — memory-bound, so f32 passes
    cost nothing measurable."""
    with jax.default_matmul_precision("float32"):
        return _lbs_f32(betas, pose, v_template, shapedirs, posedirs,
                        J_regressor, parents, lbs_weights)


def _lbs_f32(betas, pose, v_template, shapedirs, posedirs, J_regressor, parents, lbs_weights):
    b = max(betas.shape[0], pose.shape[0])
    v_shaped = v_template[None] + jnp.einsum("bl,mkl->bmk", betas, shapedirs)
    J = jnp.einsum("bik,ji->bjk", v_shaped, J_regressor)
    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(b, -1, 3, 3)
    ident = jnp.eye(3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(b, -1)
    pose_offsets = (pose_feature @ posedirs).reshape(b, -1, 3)

    _, A = batch_rigid_transform(rot_mats, J, parents)
    v_posed = pose_offsets + v_shaped

    num_joints = J_regressor.shape[0]
    W = jnp.broadcast_to(lbs_weights[None], (b, *lbs_weights.shape))
    T = (W @ A.reshape(b, num_joints, 16)).reshape(b, -1, 4, 4)
    vh = jnp.concatenate([v_posed, jnp.ones((b, v_posed.shape[1], 1))], axis=2)
    v = jnp.einsum("bvxy,bvy->bvx", T, vh)[:, :, :3]
    return A[0], v[0], pose_offsets[0]


def _full_pose(model: SmplxModel, p: Dict) -> jnp.ndarray:
    # f32 like lbs(): hand-PCA projection feeds joint angles
    with jax.default_matmul_precision("float32"):
        lh = jnp.asarray(p["left_hand_pose"]).reshape(1, -1) @ jnp.asarray(model.left_hand_components)
        rh = jnp.asarray(p["right_hand_pose"]).reshape(1, -1) @ jnp.asarray(model.right_hand_components)
    full = jnp.concatenate([
        jnp.asarray(p["global_orient"]).reshape(1, 3),
        jnp.asarray(p["body_pose"]).reshape(NUM_BODY_JOINTS, 3),
        jnp.asarray(p["jaw_pose"]).reshape(1, 3),
        jnp.asarray(p["leye_pose"]).reshape(1, 3),
        jnp.asarray(p["reye_pose"]).reshape(1, 3),
        lh.reshape(15, 3),
        rh.reshape(15, 3),
    ], axis=0).reshape(1, 165)
    return full + jnp.asarray(model.pose_mean)[None]


def smplx_pose2mesh(model: SmplxModel, params: Dict, erase_transl: bool = False) -> Dict:
    """Pose the SMPL-X body (reference :74-94)."""
    betas = jnp.asarray(params["betas"]).reshape(1, -1)
    expr = jnp.asarray(params["expression"]).reshape(1, -1)
    shape = jnp.concatenate([betas, expr], axis=-1)
    dirs = jnp.concatenate([jnp.asarray(model.shapedirs), jnp.asarray(model.expr_dirs)], axis=-1)
    _, verts, _ = lbs(shape, _full_pose(model, params), jnp.asarray(model.v_template),
                      dirs, jnp.asarray(model.posedirs), jnp.asarray(model.J_regressor),
                      model.parents, jnp.asarray(model.lbs_weights))
    v = np.asarray(verts) + np.asarray(params["transl"]).reshape(1, 3)
    if erase_transl:
        v = v - np.asarray(params["transl"]).reshape(1, 3)
    return {"vertices": v, "faces": model.faces}


def prepare_lbs(model: SmplxModel, params: Dict, vertices: np.ndarray,
                blend_weights: Optional[np.ndarray] = None,
                nn_ids: Optional[np.ndarray] = None,
                unpose: bool = False) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Un-pose (to canonical) or re-pose garment vertices by NN body blend
    weights (reference :96-169). ``vertices`` must be translation-free."""
    betas = jnp.asarray(params["betas"]).reshape(1, -1)
    expr = jnp.asarray(params["expression"]).reshape(1, -1)
    shape = jnp.concatenate([betas, expr], axis=-1)
    dirs = jnp.concatenate([jnp.asarray(model.shapedirs), jnp.asarray(model.expr_dirs)], axis=-1)
    G, body_vertices, pose_offset = lbs(
        shape, _full_pose(model, params), jnp.asarray(model.v_template), dirs,
        jnp.asarray(model.posedirs), jnp.asarray(model.J_regressor),
        model.parents, jnp.asarray(model.lbs_weights))
    G = np.asarray(G)
    body_vertices = np.asarray(body_vertices)
    pose_offset = np.asarray(pose_offset)

    if unpose:
        G = np.linalg.inv(G)

    vertices = np.asarray(vertices, np.float64).copy()
    if blend_weights is None:
        from scipy.spatial import cKDTree
        assert unpose, "forward pose should provide weights"
        _, nn_ids = cKDTree(body_vertices).query(vertices)
        blend_weights = np.asarray(model.lbs_weights)[nn_ids]

    Gv = np.einsum("ab,bcd->acd", blend_weights, G)       # (N,4,4)
    if not unpose:
        vertices += pose_offset[nn_ids]
    vh = np.concatenate([vertices, np.ones((len(vertices), 1))], axis=-1)
    out = np.einsum("abc,ac->ab", Gv, vh)[:, :3]
    if unpose:
        out -= pose_offset[nn_ids]
    return out.astype(np.float32), blend_weights, nn_ids
