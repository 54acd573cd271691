"""Stage-2 registration trainer: the jitted optimization core.

Reference: the inline loop of ``s2_registration.py:196-338`` —
update_face_coor → render → masked L1/SSIM (+ xyz/scale hinges in template
phase 1) → cloth energies → backward → (densify/prune, opacity reset) → Adam.

TPU redesign:
- the whole iteration is ONE jitted function per phase (template phase 1 =
  splats only, template phase 2 / sequence = vertices only); phase switching
  selects between compiled functions instead of toggling ``requires_grad``;
- instead of 1 random camera per iteration (``s2_registration.py:241-243``),
  each step renders a **batch of k cameras** — sharded over the device mesh's
  "data" axis with psum gradient reduction when a mesh is given (SURVEY.md
  §2.6); densification statistics are rescaled by k so the reference's
  ``densify_grad_threshold`` keeps its meaning;
- densify/clone/split/prune and opacity reset stay host-side edits between
  jit segments (models/gaussian.py, models/mesh_gaussian.py).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.models import mesh_gaussian as MG
from gaussian_garments_tpu.models import mesh_model as MM
from gaussian_garments_tpu.models.adam import TensorAdam, tensor_adam_init, tensor_adam_step
from gaussian_garments_tpu.renderer import BatchedCameras, RasterConfig, SplatBundle, render_batch
from gaussian_garments_tpu.utils.losses import l1_loss, ssim


@struct.dataclass
class S2State:
    """Everything a stage-2 step updates (one frame's optimization state)."""

    params: G.GaussianParams
    aux: G.GaussianAux
    splat_adam: G.AdamState
    binding: jnp.ndarray          # (M,) int32
    mesh: MM.MeshState
    vert_adam: TensorAdam
    iteration: jnp.ndarray        # scalar int32


def init_state(params, aux, binding, mesh: MM.MeshState) -> S2State:
    return S2State(
        params=params,
        aux=aux,
        splat_adam=G.adam_init(params),
        binding=jnp.asarray(np.asarray(binding).astype(np.int32)),
        mesh=mesh,
        vert_adam=tensor_adam_init(mesh.v),
        iteration=jnp.zeros((), jnp.int32),
    )


def _bundle(params, binding, alive, mesh_v, mesh_f, active_sh_degree: int) -> SplatBundle:
    frames = MG.compute_face_frames(mesh_v, mesh_f)
    rows = MG.gather_frame_rows(frames, binding)    # one shared row-gather
    return SplatBundle(
        means3d=MG.world_xyz(params, binding, frames, rows=rows),
        opacity=G.get_opacity(params) * alive[:, None],
        scales=MG.world_scaling(params, binding, frames, rows=rows),
        rotations=MG.world_rotation(params, binding, frames, rows=rows),
        shs=G.get_features(params),
        active_sh_degree=active_sh_degree,
    )


def make_pair_counter(active_sh_degree: int = 0,
                      raster_cfg: RasterConfig = RasterConfig()) -> Callable:
    """Jitted (state, cams) -> (B,) exact per-camera pair counts, built from
    the same bundle as the training step. Drivers probe this over the frame's
    cameras to autosize ``RasterConfig.pair_budget`` (every pair-space op in
    the rasterizer — sort, feature gather, backward segment-sum — costs the
    static budget, not the real pair count)."""
    from gaussian_garments_tpu.renderer import count_pairs_batch

    @jax.jit
    def count(state: S2State, cams: BatchedCameras):
        bundle = _bundle(state.params, state.binding, state.aux.alive,
                         state.mesh.v, state.mesh.f, active_sh_degree)
        return count_pairs_batch(cams, bundle, config=raster_cfg)

    return count


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def _safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with a defined (zero) gradient at 0 — torch's ``norm`` has a
    0 subgradient there, jnp.linalg.norm has NaN; the hinge losses sit exactly
    at 0 at init (local xyz = 0), so this matters."""
    sq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq)) * (sq != 0.0)


def _s2_losses(
    params: G.GaussianParams,
    mesh_v: jnp.ndarray,
    screen_offset: jnp.ndarray,
    state: S2State,
    cams: BatchedCameras,
    bg: jnp.ndarray,
    opt,
    *,
    mode: str,
    use_body: bool,
    active_sh_degree: int,
    raster_cfg: RasterConfig,
):
    mesh = state.mesh.replace(v=mesh_v)
    bundle = _bundle(params, state.binding, state.aux.alive, mesh_v, state.mesh.f, active_sh_degree)
    out = render_batch(cams, bundle, bg, screen_offset=screen_offset, config=raster_cfg)

    image = out["render"]                     # (B,3,H,W)
    gt = cams.image
    mask = cams.mask if opt.only_foreground_loss else None

    loss_dict: Dict[str, jnp.ndarray] = {}
    loss_dict["img"] = l1_loss(image, gt, mask) * (1.0 - opt.lambda_dssim)
    # reference quirk kept verbatim: `1.0 - ssim*λ`, not `(1-ssim)*λ`
    # (s2_registration.py:260). fast=True: 3-pass bf16 blur in the LOSS only
    # (≤3.5e-3 worst-case on the term, ~10 ms/step cheaper; losses._blur)
    loss_dict["ssim"] = 1.0 - ssim(image, gt, mask, fast=True) * opt.lambda_dssim

    vis = out["visibility_filter"] & state.aux.alive[None, :]   # (B,M)

    if mode == "template_p1":
        xyz_excess = jax.nn.relu(_safe_norm(params.xyz, axis=1) - opt.threshold_xyz)  # (M,)
        loss_dict["xyz"] = jax.vmap(lambda v: _masked_mean(xyz_excess, v))(vis).mean() * opt.lambda_xyz
        scale_excess = _safe_norm(jax.nn.relu(jnp.exp(params.scaling) - opt.threshold_scale), axis=1)
        loss_dict["scale"] = jax.vmap(lambda v: _masked_mean(scale_excess, v))(vis).mean() * opt.lambda_scale
    else:
        # cloth energies are gated on the mesh being optimized — the
        # reference adds them only when mesh.v.requires_grad
        # (s2_registration.py:264-267), and template phase 1 creates mesh.v
        # with requires_grad=False (scene/mesh_model.py:13), so phase 1 is
        # photometric-only on splats. PARITY.md "template phase gating".
        energy_use_body = use_body and state.mesh.has_body
        loss_dict.update(MM.get_energy_loss(mesh, opt, energy_use_body))

    total = jnp.zeros(())
    for v in loss_dict.values():
        total = total + v
    return total, (loss_dict, out)


def make_s2_step(
    opt,
    *,
    mode: str,                 # "template_p1" | "template_p2" | "seq"
    use_body: bool,
    active_sh_degree: int = 0,
    raster_cfg: RasterConfig = RasterConfig(),
    axis_name: Optional[str] = None,
    jit: bool = True,
) -> Callable:
    """Build one jitted stage-2 step.

    step(state, cams, bg, xyz_lr, vert_lr) -> (state, loss_dict, metrics)

    - template_p1: optimizes SPLATS ONLY + densification stats, no cloth
      energies (training_setup is_ff=True optimizes splat groups,
      mesh_gaussian_model.py:352-364; mesh.v starts requires_grad=False,
      scene/mesh_model.py:13, so the energy add at s2_registration.py:264-267
      is skipped in phase 1).
    - template_p2: splats frozen, vertices only + energies
      (s2_registration.py:217-225).
    - seq: vertices only + energies (training_setup is_ff=False :366-371).
    """
    assert mode in ("template_p1", "template_p2", "seq")
    optimize_splats = mode == "template_p1"

    def step(state: S2State, cams: BatchedCameras, bg, xyz_lr, vert_lr):
        n_cams = cams.world_view.shape[0]
        screen0 = jnp.zeros((n_cams, state.params.xyz.shape[0], 2))

        loss_closure = functools.partial(
            _s2_losses, state=state, cams=cams, bg=bg, opt=opt,
            mode=mode, use_body=use_body, active_sh_degree=active_sh_degree,
            raster_cfg=raster_cfg,
        )

        if optimize_splats:
            # reference template phase 1: SPLATS ONLY — mesh.v is created
            # with requires_grad=False (scene/mesh_model.py:13) and only the
            # phase-2 switch enables it (s2_registration.py:217-225)
            (loss, (loss_dict, out)), grads = jax.value_and_grad(
                loss_closure, argnums=(0, 2), has_aux=True
            )(state.params, state.mesh.v, screen0)
            g_params, g_screen = grads
            g_verts = None
        else:
            (loss, (loss_dict, out)), g_verts = jax.value_and_grad(
                loss_closure, argnums=1, has_aux=True
            )(state.params, state.mesh.v, screen0)
            g_params, g_screen = None, None

        if axis_name is not None:
            if g_verts is not None:
                g_verts = jax.lax.pmean(g_verts, axis_name)
            if g_params is not None:
                g_params = jax.lax.pmean(g_params, axis_name)
            loss_dict = jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), loss_dict)

        new_state = state
        if optimize_splats:
            lrs = {
                "xyz": xyz_lr,
                "features_dc": opt.feature_lr,
                "features_rest": opt.feature_lr / 20.0,
                "opacity": opt.opacity_lr,
                "scaling": opt.scaling_lr,
                "rotation": opt.rotation_lr,
            }
            new_params, new_adam = G.adam_step(state.params, g_params, state.splat_adam, lrs)
            # densification statistics (reference s2 loop :312-317): rescale
            # the batched-mean screen grads by k to recover per-camera norms.
            vis = out["visibility_filter"] & state.aux.alive[None, :]
            gnorm = jnp.linalg.norm(g_screen, axis=-1) * n_cams        # (B,M)
            if axis_name is not None:
                accum_inc = jax.lax.psum(jnp.where(vis, gnorm, 0.0).sum(0), axis_name)
                denom_inc = jax.lax.psum(vis.sum(0).astype(jnp.float32), axis_name)
                radii_max = jax.lax.pmax(
                    jnp.where(vis, out["radii"], 0).max(0).astype(jnp.float32), axis_name)
            else:
                accum_inc = jnp.where(vis, gnorm, 0.0).sum(0)
                denom_inc = vis.sum(0).astype(jnp.float32)
                radii_max = jnp.where(vis, out["radii"], 0).max(0).astype(jnp.float32)
            new_aux = state.aux.replace(
                xyz_gradient_accum=state.aux.xyz_gradient_accum + accum_inc[:, None],
                denom=state.aux.denom + denom_inc[:, None],
                max_radii2d=jnp.maximum(state.aux.max_radii2d, radii_max),
            )
            new_state = new_state.replace(params=new_params, splat_adam=new_adam, aux=new_aux)

        if g_verts is not None:
            new_v, new_vert_adam = tensor_adam_step(
                state.mesh.v, g_verts, state.vert_adam, vert_lr)
            new_state = new_state.replace(
                mesh=new_state.mesh.replace(v=new_v), vert_adam=new_vert_adam)
        new_state = new_state.replace(iteration=state.iteration + 1)

        metrics = {
            "radii_max": out["radii"].max().astype(jnp.float32),
            "n_overflow": out["raster_aux"]["n_overflow"].sum().astype(jnp.float32),
            "loss": loss,
        }
        if axis_name is not None:
            # make every output bitwise-replicated across shards
            metrics = {
                "radii_max": jax.lax.pmax(metrics["radii_max"], axis_name),
                "n_overflow": jax.lax.psum(metrics["n_overflow"], axis_name),
                "loss": jax.lax.pmean(metrics["loss"], axis_name),
            }
        return new_state, loss_dict, metrics

    return jax.jit(step) if jit else step


# ---------------------------------------------------------------------------
# host-side orchestration helpers
# ---------------------------------------------------------------------------

def densify_and_prune_state(state: S2State, opt, cameras_extent: float,
                            max_screen_size, binding_counter: np.ndarray,
                            rng: Optional[np.random.RandomState] = None):
    """Host structural edit between jit segments (reference :318-320)."""
    params, aux, adam, binding, counter, stats = MG.densify_and_prune(
        state.params, state.aux, state.splat_adam,
        np.asarray(state.binding), binding_counter,
        np.asarray(state.mesh.v), np.asarray(state.mesh.f),
        max_grad=opt.densify_grad_threshold, min_opacity=0.005,
        extent=cameras_extent, max_screen_size=max_screen_size,
        percent_dense=opt.percent_dense, rng=rng,
    )
    new_state = state.replace(
        params=params, aux=aux, splat_adam=adam,
        binding=jnp.asarray(binding.astype(np.int32)),
    )
    return new_state, counter, stats


def reset_opacity_state(state: S2State) -> S2State:
    params, adam = G.reset_opacity(state.params, state.splat_adam)
    return state.replace(params=params, splat_adam=adam)


def getNerfppNorm_radius(cam_centers: np.ndarray) -> float:
    """NeRF++ camera-extent normalization (reference scene/scene.py:19-40)."""
    center = cam_centers.mean(axis=0, keepdims=True)
    diagonal = np.linalg.norm(cam_centers - center, axis=1).max()
    return float(diagonal * 1.1)
