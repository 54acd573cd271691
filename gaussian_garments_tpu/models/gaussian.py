"""Vanilla 3DGS parameter set — TPU-native GaussianModel.

Reference: ``scene/gaussian_model.py`` (parameters+activations :26-59,
create_from_pcd :125-148, training_setup/LR :151-177, PLY :193-259,
densify/clone/split/prune with Adam-state surgery :276-412).

TPU design: parameters are an immutable pytree (``GaussianParams``) inside a
**capacity-padded buffer with an `alive` mask** so every jitted step sees
static shapes. Structural edits (densify/prune) are *host-side* numpy
operations between jit segments — they compact alive rows, apply the exact
reference clone/split/prune rules (including zeroing Adam moments of new
rows), and re-pad, growing capacity geometrically when needed (each growth is
one recompile, amortized O(log N) times per run).

The optimizer is a hand-rolled per-tensor Adam (`AdamState`) equivalent to the
reference's ``torch.optim.Adam(eps=1e-15)`` groups — owning it makes the
densification state surgery a trivial array edit instead of optax tree
plumbing, and lets the xyz learning rate be a traced scalar (the JaxNeRF-style
exponential schedule) without recompilation.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussian_garments_tpu.utils.general import get_expon_lr_func, inverse_sigmoid, knn_numpy
from gaussian_garments_tpu.utils.quaternion import (
    covariance_from_scaling_rotation,
    normalize as quat_normalize,
    quat_to_rotmat,
)
from gaussian_garments_tpu.utils.sh import rgb2sh


@struct.dataclass
class GaussianParams:
    """The six optimizable splat tensors (rows ≥ n_alive are padding)."""

    xyz: jnp.ndarray            # (M, 3)
    features_dc: jnp.ndarray    # (M, 1, 3)
    features_rest: jnp.ndarray  # (M, R, 3), R = (max_sh_degree+1)² - 1
    scaling: jnp.ndarray        # (M, 3) log-scale
    rotation: jnp.ndarray       # (M, 4) wxyz (unnormalized)
    opacity: jnp.ndarray        # (M, 1) logit


@struct.dataclass
class GaussianAux:
    """Non-optimized per-splat state (densification statistics)."""

    alive: jnp.ndarray              # (M,) bool
    max_radii2d: jnp.ndarray        # (M,) f32
    xyz_gradient_accum: jnp.ndarray  # (M, 1)
    denom: jnp.ndarray              # (M, 1)


# ---------------------------------------------------------------------------
# activations (reference scene/gaussian_model.py:33-59)
# ---------------------------------------------------------------------------

def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    return quat_normalize(p.rotation)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_features(p: GaussianParams) -> jnp.ndarray:
    """(M, K, 3) concatenated SH coefficients, DC first."""
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def get_covariance(p: GaussianParams, scaling_modifier: float = 1.0) -> jnp.ndarray:
    return covariance_from_scaling_rotation(get_scaling(p), scaling_modifier, get_rotation(p))


# ---------------------------------------------------------------------------
# creation
# ---------------------------------------------------------------------------

def _pad(a: np.ndarray, capacity: int) -> np.ndarray:
    pad = [(0, capacity - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def _pad_param(name: str, a: np.ndarray, capacity: int) -> np.ndarray:
    """Capacity padding with numerically-safe fill values.

    Dead (alive=False) slots never contribute to the composite, but their
    params still flow through the differentiable local→world chain, so the
    fill must be VJP-safe. Zeros are — except for ``rotation``: an all-zero
    quaternion makes ``normalize(q_face · q_local)`` normalize an exact zero,
    whose norm backward is 0/0, and that NaN leaks into the shared face-frame
    (vertex) gradients through 0·NaN. Dead slots therefore pad with identity
    quaternions.
    """
    if name == "rotation" and a.shape[0] < capacity:
        fill = np.zeros((capacity - a.shape[0],) + a.shape[1:], a.dtype)
        fill[:, 0] = 1.0
        return np.concatenate([a, fill])
    return _pad(a, capacity)


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int,
    capacity: Optional[int] = None,
) -> Tuple[GaussianParams, GaussianAux]:
    """Initialize splats from a colored point cloud.

    Reference ``create_from_pcd`` (scene/gaussian_model.py:125-148): DC SH from
    RGB, isotropic log-scale from the mean squared distance to the 3 nearest
    neighbors (the ``simple_knn.distCUDA2`` init — here a host cKDTree),
    identity rotations, opacity 0.1.
    """
    n = points.shape[0]
    capacity = capacity or n
    assert capacity >= n

    fused_color = rgb2sh(np.asarray(colors, np.float32))
    r = (max_sh_degree + 1) ** 2 - 1
    features_dc = fused_color[:, None, :]                 # (N,1,3)
    features_rest = np.zeros((n, r, 3), np.float32)

    sq, _ = knn_numpy(np.asarray(points, np.float64), 3)
    dist2 = np.maximum(sq.mean(axis=1), 1e-7).astype(np.float32)
    scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opacity = np.asarray(inverse_sigmoid(0.1 * np.ones((n, 1), np.float32)))

    params = GaussianParams(
        xyz=jnp.asarray(_pad(np.asarray(points, np.float32), capacity)),
        features_dc=jnp.asarray(_pad(features_dc, capacity)),
        features_rest=jnp.asarray(_pad(features_rest, capacity)),
        scaling=jnp.asarray(_pad(scales, capacity)),
        rotation=jnp.asarray(_pad_param("rotation", rots, capacity)),
        opacity=jnp.asarray(_pad(opacity.astype(np.float32), capacity)),
    )
    alive = np.zeros((capacity,), bool)
    alive[:n] = True
    aux = GaussianAux(
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity, 1), jnp.float32),
        denom=jnp.zeros((capacity, 1), jnp.float32),
    )
    return params, aux


# ---------------------------------------------------------------------------
# optimizer: per-tensor Adam with named LR groups
# ---------------------------------------------------------------------------

class AdamState(NamedTuple):
    step: jnp.ndarray  # scalar int32 (shared: reference steps all groups together)
    mu: GaussianParams
    nu: GaussianParams


PARAM_NAMES = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.zeros_like, params))


def adam_step(
    params,
    grads,
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step with per-field learning rates (dict field-name → scalar).

    Matches ``torch.optim.Adam(eps=1e-15)`` (reference training_setup
    :151-177) including bias correction. LR values may be traced scalars so
    the xyz exponential schedule costs no recompiles.
    """
    step = state.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    def upd(name, p, g, m, v):
        lr = lrs[name]
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        return p, m, v

    fields = type(params)
    new_p, new_m, new_v = {}, {}, {}
    for name in params.__dataclass_fields__ if hasattr(params, "__dataclass_fields__") else params:
        p = getattr(params, name)
        g = getattr(grads, name)
        m = getattr(state.mu, name)
        v = getattr(state.nu, name)
        new_p[name], new_m[name], new_v[name] = upd(name, p, g, m, v)
    return fields(**new_p), AdamState(step=step, mu=fields(**new_m), nu=fields(**new_v))


def make_lr_schedules(opt, spatial_lr_scale: float):
    """The reference LR groups (training_setup :156-170): xyz is scheduled,
    others constant. Returns a callable iteration → {field: lr}."""
    xyz_sched = get_expon_lr_func(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )

    def lrs(iteration):
        return {
            "xyz": xyz_sched(iteration),
            "features_dc": opt.feature_lr,
            "features_rest": opt.feature_lr / 20.0,
            "opacity": opt.opacity_lr,
            "scaling": opt.scaling_lr,
            "rotation": opt.rotation_lr,
        }

    return lrs


# ---------------------------------------------------------------------------
# densification statistics (jit-side)
# ---------------------------------------------------------------------------

def add_densification_stats(aux: GaussianAux, screen_grad: jnp.ndarray, radii: jnp.ndarray) -> GaussianAux:
    """Accumulate ‖∂L/∂mean2D‖ for visible splats and track max screen radius.

    Reference ``add_densification_stats`` (:410-412) + the max_radii2D update
    in the s2 loop (s2_registration.py:314-315).
    """
    visible = radii > 0
    gnorm = jnp.linalg.norm(screen_grad[:, :2], axis=-1, keepdims=True)
    return aux.replace(
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(visible[:, None], gnorm, 0.0),
        denom=aux.denom + visible[:, None].astype(jnp.float32),
        max_radii2d=jnp.maximum(aux.max_radii2d, jnp.where(visible, radii.astype(jnp.float32), 0.0)),
    )


# ---------------------------------------------------------------------------
# densify / prune (host-side structural edits)
# ---------------------------------------------------------------------------

def _to_np(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


class _HostGaussians(NamedTuple):
    """Compacted (alive-only) numpy view used during structural edits."""

    params: Dict[str, np.ndarray]
    mu: Dict[str, np.ndarray]
    nu: Dict[str, np.ndarray]
    max_radii2d: np.ndarray
    grad_accum: np.ndarray
    denom: np.ndarray


def _compact(params: GaussianParams, aux: GaussianAux, adam: AdamState) -> _HostGaussians:
    alive = np.asarray(aux.alive)
    take = lambda t: {k: np.asarray(getattr(t, k))[alive] for k in PARAM_NAMES}
    return _HostGaussians(
        params=take(params),
        mu=take(adam.mu),
        nu=take(adam.nu),
        max_radii2d=np.asarray(aux.max_radii2d)[alive],
        grad_accum=np.asarray(aux.xyz_gradient_accum)[alive],
        denom=np.asarray(aux.denom)[alive],
    )


def _repack(
    h: _HostGaussians, step: jnp.ndarray, capacity: Optional[int] = None, growth: float = 1.5
) -> Tuple[GaussianParams, GaussianAux, AdamState]:
    n = h.params["xyz"].shape[0]
    capacity = capacity if capacity and capacity >= n else max(n, int(n * 1.0))
    # params pad with safe fills (identity quats for dead rotation slots);
    # Adam moments always pad with zeros
    params = GaussianParams(
        **{k: jnp.asarray(_pad_param(k, v, capacity)) for k, v in h.params.items()})
    pack0 = lambda d: GaussianParams(**{k: jnp.asarray(_pad(v, capacity)) for k, v in d.items()})
    adam = AdamState(step=step, mu=pack0(h.mu), nu=pack0(h.nu))
    alive = np.zeros((capacity,), bool)
    alive[:n] = True
    aux = GaussianAux(
        alive=jnp.asarray(alive),
        max_radii2d=jnp.asarray(_pad(h.max_radii2d, capacity)),
        xyz_gradient_accum=jnp.asarray(_pad(h.grad_accum, capacity)),
        denom=jnp.asarray(_pad(h.denom, capacity)),
    )
    return params, aux, adam


def _cat(h: _HostGaussians, new: Dict[str, np.ndarray]) -> _HostGaussians:
    """densification_postfix: append rows with zeroed Adam moments and reset
    stats (reference :359-376)."""
    n_new = new["xyz"].shape[0]
    params = {k: np.concatenate([h.params[k], new[k]]) for k in PARAM_NAMES}
    mu = {k: np.concatenate([h.mu[k], np.zeros_like(new[k])]) for k in PARAM_NAMES}
    nu = {k: np.concatenate([h.nu[k], np.zeros_like(new[k])]) for k in PARAM_NAMES}
    n = params["xyz"].shape[0]
    return _HostGaussians(
        params, mu, nu,
        max_radii2d=np.zeros((n,), np.float32),
        grad_accum=np.zeros((n, 1), np.float32),
        denom=np.zeros((n, 1), np.float32),
    )


def _select(h: _HostGaussians, keep: np.ndarray) -> _HostGaussians:
    f = lambda d: {k: v[keep] for k, v in d.items()}
    return _HostGaussians(f(h.params), f(h.mu), f(h.nu),
                          h.max_radii2d[keep], h.grad_accum[keep], h.denom[keep])


def densify_and_prune(
    params: GaussianParams,
    aux: GaussianAux,
    adam: AdamState,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: Optional[float],
    percent_dense: float,
    rng: Optional[np.random.RandomState] = None,
    grow_capacity: float = 1.5,
) -> Tuple[GaussianParams, GaussianAux, AdamState, Dict[str, int]]:
    """Exact reference densify_and_prune (:379-408) as a host-side edit.

    Returns the rebuilt (params, aux, adam) plus edit statistics. Capacity is
    kept if the new count fits, otherwise grown by ``grow_capacity``.
    """
    rng = rng or np.random.RandomState(0)
    old_capacity = params.xyz.shape[0]
    h = _compact(params, aux, adam)

    grads = h.grad_accum / np.maximum(h.denom, 1e-12)
    grads[~np.isfinite(grads)] = 0.0
    scaling = np.exp(h.params["scaling"])
    max_scale = scaling.max(axis=1)

    # --- clone (small, under-reconstructed) ---
    clone_mask = (np.linalg.norm(grads, axis=-1) >= max_grad) & (max_scale <= percent_dense * extent)
    n_clone = int(clone_mask.sum())
    if n_clone:
        h = _cat(h, {k: h.params[k][clone_mask] for k in PARAM_NAMES})
        # recompute views after postfix reset
        grads = np.concatenate([grads, np.zeros((n_clone, 1), np.float32)])
        scaling = np.exp(h.params["scaling"])
        max_scale = scaling.max(axis=1)

    # --- split (large, over-reconstructed); N=2 samples, prune originals ---
    split_mask = (grads[:, 0] >= max_grad) & (max_scale > percent_dense * extent)
    n_split = int(split_mask.sum())
    if n_split:
        N = 2
        stds = np.repeat(scaling[split_mask], N, axis=0)
        samples = rng.normal(0.0, 1.0, stds.shape).astype(np.float32) * stds
        rots = np.asarray(quat_to_rotmat(jnp.asarray(np.tile(h.params["rotation"][split_mask], (N, 1)))))
        new_xyz = np.einsum("nij,nj->ni", rots, samples) + np.tile(h.params["xyz"][split_mask], (N, 1))
        new = {
            "xyz": new_xyz.astype(np.float32),
            "scaling": np.log(np.repeat(scaling[split_mask], N, axis=0) / (0.8 * N)).astype(np.float32),
            "rotation": np.tile(h.params["rotation"][split_mask], (N, 1)),
            "features_dc": np.tile(h.params["features_dc"][split_mask], (N, 1, 1)),
            "features_rest": np.tile(h.params["features_rest"][split_mask], (N, 1, 1)),
            "opacity": np.tile(h.params["opacity"][split_mask], (N, 1)),
        }
        n_before = h.params["xyz"].shape[0]
        h = _cat(h, new)
        keep = np.ones((h.params["xyz"].shape[0],), bool)
        keep[:n_before] = ~split_mask
        h = _select(h, keep)

    # --- prune ---
    opac = 1.0 / (1.0 + np.exp(-h.params["opacity"][:, 0]))
    prune = opac < min_opacity
    if max_screen_size:
        prune |= h.max_radii2d > max_screen_size
        prune |= np.exp(h.params["scaling"]).max(axis=1) > 0.1 * extent
    n_prune = int(prune.sum())
    h = _select(h, ~prune)

    n = h.params["xyz"].shape[0]
    capacity = old_capacity if n <= old_capacity else int(np.ceil(n * grow_capacity))
    out = _repack(h, adam.step, capacity)
    stats = {"n_clone": n_clone, "n_split": n_split, "n_prune": n_prune, "n_alive": n, "capacity": capacity}
    return (*out, stats)


def reset_opacity(params: GaussianParams, adam: AdamState) -> Tuple[GaussianParams, AdamState]:
    """opacity ← min(opacity, 0.01) with zeroed Adam moments for the opacity
    tensor (reference reset_opacity :261-264 + replace_tensor_to_optimizer)."""
    new_op = inverse_sigmoid(jnp.minimum(get_opacity(params), 0.01))
    return (
        params.replace(opacity=new_op),
        adam._replace(
            mu=adam.mu.replace(opacity=jnp.zeros_like(new_op)),
            nu=adam.nu.replace(opacity=jnp.zeros_like(new_op)),
        ),
    )


# ---------------------------------------------------------------------------
# PLY (reference save_ply/load_ply :193-259 — same attribute list/layout)
# ---------------------------------------------------------------------------

def save_ply(path, params: GaussianParams, alive: Optional[np.ndarray] = None) -> None:
    from gaussian_garments_tpu.utils.io import write_ply

    sel = np.asarray(alive) if alive is not None else slice(None)
    xyz = np.asarray(params.xyz)[sel]
    n = xyz.shape[0]
    normals = np.zeros_like(xyz)
    # torch layout: features (N, K, 3) -> transpose(1,2) -> flatten => channel-major
    f_dc = np.asarray(params.features_dc)[sel].transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(params.features_rest)[sel].transpose(0, 2, 1).reshape(n, -1)
    opacities = np.asarray(params.opacity)[sel]
    scale = np.asarray(params.scaling)[sel]
    rotation = np.asarray(params.rotation)[sel]

    cols = {}
    for i, a in enumerate(["x", "y", "z"]):
        cols[a] = xyz[:, i].astype(np.float32)
    for i, a in enumerate(["nx", "ny", "nz"]):
        cols[a] = normals[:, i].astype(np.float32)
    for i in range(f_dc.shape[1]):
        cols[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
    for i in range(f_rest.shape[1]):
        cols[f"f_rest_{i}"] = f_rest[:, i].astype(np.float32)
    cols["opacity"] = opacities[:, 0].astype(np.float32)
    for i in range(scale.shape[1]):
        cols[f"scale_{i}"] = scale[:, i].astype(np.float32)
    for i in range(rotation.shape[1]):
        cols[f"rot_{i}"] = rotation[:, i].astype(np.float32)
    write_ply(path, cols)


def load_ply(path, max_sh_degree: int, capacity: Optional[int] = None) -> Tuple[GaussianParams, GaussianAux]:
    from gaussian_garments_tpu.utils.io import read_ply

    v = read_ply(path)
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    n = xyz.shape[0]
    opacities = np.asarray(v["opacity"])[:, None].astype(np.float32)

    f_dc = np.zeros((n, 3, 1), np.float32)
    for i in range(3):
        f_dc[:, i, 0] = v[f"f_dc_{i}"]

    extra = sorted([k for k in v if k.startswith("f_rest_")], key=lambda s: int(s.split("_")[-1]))
    r = (max_sh_degree + 1) ** 2 - 1
    assert len(extra) == 3 * r, f"PLY has {len(extra)} f_rest coeffs, expected {3*r}"
    f_rest = np.zeros((n, len(extra)), np.float32)
    for i, name in enumerate(extra):
        f_rest[:, i] = v[name]
    f_rest = f_rest.reshape(n, 3, r)

    scale_names = sorted([k for k in v if k.startswith("scale_")], key=lambda s: int(s.split("_")[-1]))
    scales = np.stack([v[s] for s in scale_names], axis=1).astype(np.float32)
    rot_names = sorted([k for k in v if k.startswith("rot_")], key=lambda s: int(s.split("_")[-1]))
    rots = np.stack([v[s] for s in rot_names], axis=1).astype(np.float32)

    capacity = capacity or n
    params = GaussianParams(
        xyz=jnp.asarray(_pad(xyz, capacity)),
        features_dc=jnp.asarray(_pad(f_dc.transpose(0, 2, 1), capacity)),
        features_rest=jnp.asarray(_pad(f_rest.transpose(0, 2, 1), capacity)),
        scaling=jnp.asarray(_pad(scales, capacity)),
        rotation=jnp.asarray(_pad_param("rotation", rots, capacity)),
        opacity=jnp.asarray(_pad(opacities, capacity)),
    )
    alive = np.zeros((capacity,), bool)
    alive[:n] = True
    aux = GaussianAux(
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity, 1), jnp.float32),
        denom=jnp.zeros((capacity, 1), jnp.float32),
    )
    return params, aux
