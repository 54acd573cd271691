"""Stage-3 appearance trainer: the jitted optimization core.

Reference: the inline loop of ``s3_appearance.py:105-204`` — per (sequence,
frame, camera) item: set mesh pose → AvatarNet predicts per-texel Δxyz/ΔSH
from baked AO+normal → render through the splat rasterizer with per-texel
visibility masking → masked L1/SSIM + xyz/scale/opacity hinges → joint Adam
over the net and the splat appearance parameters.

TPU redesign (SURVEY.md §2.6): the reference trains bs=1 with a CPU-side
DataLoader; here the step takes a **batch of items** (one per chip when
sharded over the "data" mesh axis) and vmaps the whole per-item forward
(net + render), pmean-ing gradients over ICI. Visibility uses the in-jit
per-texel depth-buffer test (``avatar_gaussian.get_visible_mask_depth``),
the shadow-map equivalent of the reference's per-texel ray cast.

Phases: epoch-1 pre-train freezes the splat tensors (s3_appearance.py:110-113)
— a separate compiled step that only updates the net, exactly like torch Adam
skipping grad-less params.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussian_garments_tpu.models import avatar_gaussian as AG
from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.models import mesh_gaussian as MG
from gaussian_garments_tpu.models.adam import TreeAdam, tree_adam_init, tree_adam_step
from gaussian_garments_tpu.models.avatar_net import AvatarNet, apply_shadow
from gaussian_garments_tpu.renderer import RasterConfig, SplatBundle, _rasterize
from gaussian_garments_tpu.ops.projection import project_gaussians
from gaussian_garments_tpu.training.s2 import _safe_norm
from gaussian_garments_tpu.utils.losses import l1_loss, ssim


@struct.dataclass
class S3Item:
    """One (sequence, frame, camera) batch element (leading axis = batch)."""

    image: jnp.ndarray          # (B,3,H,W)
    mask: jnp.ndarray           # (B,1,H,W)
    bg: jnp.ndarray             # (B,3)
    mesh_v: jnp.ndarray         # (B,V,3)
    ambient: jnp.ndarray        # (B,1,res,res)
    normal: jnp.ndarray         # (B,3,res,res)
    world_view: jnp.ndarray     # (B,4,4)
    full_proj: jnp.ndarray      # (B,4,4)
    campos: jnp.ndarray         # (B,3)
    tanfovx: jnp.ndarray        # (B,)
    tanfovy: jnp.ndarray        # (B,)
    # optional precomputed per-texel visibility (B,G) — a constant of the
    # (frame, camera) item; the driver caches it across epochs (the
    # reference's dataloader computes it per item load too,
    # avatar_gaussian_model.py:227-263). None = compute in-step.
    vis: Optional[jnp.ndarray] = None
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class S3State:
    net_params: dict
    net_buffers: dict
    splats: G.GaussianParams
    net_adam: TreeAdam
    splat_adam: TreeAdam
    iteration: jnp.ndarray


def init_state(net: AvatarNet, bind: AG.AvatarBinding, splats: G.GaussianParams,
               mesh_v: np.ndarray, mesh_f: np.ndarray, item: S3Item) -> S3State:
    v = jnp.asarray(np.asarray(mesh_v, np.float32))
    f = jnp.asarray(np.asarray(mesh_f, np.int64).astype(np.int32))
    frames = MG.compute_face_frames(v, f)
    variables = net.init(
        jax.random.PRNGKey(0), item.ambient[0], item.normal[0],
        item.world_view[0], item.campos[0], bind, v, f, frames,
    )
    return S3State(
        net_params=variables["params"],
        net_buffers=variables.get("buffers", {}),
        splats=splats,
        net_adam=tree_adam_init(variables["params"]),
        splat_adam=tree_adam_init(splats),
        iteration=jnp.zeros((), jnp.int32),
    )


def _splat_lr_tree(args, template: G.GaussianParams):
    """Reference AvatarNet.training_setup LRs (avatar_net.py:40-49)."""
    lrs = G.GaussianParams(
        xyz=args.position_lr_init * 2.5,
        features_dc=args.feature_lr,
        features_rest=args.feature_lr / 20.0,
        scaling=args.scaling_lr,
        rotation=args.rotation_lr,
        opacity=args.opacity_lr,
    )
    return lrs


def _s3_project(net, net_vars, splats, bind, mesh_f, item_row, *,
                sh_degree: int, raster_cfg: RasterConfig, vis_raster_hw):
    """One item: net → shadow textures → projected splats. The rasterize
    happens OUTSIDE the per-item vmap (``_s3_forward_batch``): vmapping the
    rasterizer lowers its sort/gather ~2× slower even at batch 1
    (MEASUREMENTS.md "Batched-render lessons")."""
    mesh_v = item_row["mesh_v"]
    frames = MG.compute_face_frames(mesh_v, mesh_f)
    # ONE (G,26) frame-row gather shared by the net, anchors, world pose and
    # visibility (column-wise texel geometry; MEASUREMENTS.md)
    rows = MG.gather_frame_rows(frames, bind.binding, mesh_v, mesh_f)

    shadow_tex = net.apply(net_vars, item_row["ambient"], item_row["normal"],
                           item_row["world_view"], item_row["campos"],
                           bind, mesh_v, mesh_f, frames, rows=rows)
    local_xyz, shs = apply_shadow(bind, splats, shadow_tex, sh_degree)

    anchor = AG.barycentric_3d(bind, mesh_v, mesh_f, rows=rows)
    means3d = AG.avatar_world_xyz(local_xyz, bind, frames, anchor, rows=rows)
    scales = MG.world_scaling(splats, bind.binding, frames, rows=rows)
    rotations = MG.world_rotation(splats, bind.binding, frames, rows=rows)
    opacity = G.get_opacity(splats).reshape(-1)

    vis = item_row.get("vis")
    if vis is None:
        vis = AG.get_visible_mask_depth(
            bind, mesh_v, mesh_f, item_row["world_view"], item_row["full_proj"],
            image_width=vis_raster_hw[1], image_height=vis_raster_hw[0],
            rows=rows)
    opacity = opacity * vis.astype(opacity.dtype)
    if bind.alive is not None:  # dense layout: dead texels never render
        opacity = opacity * bind.alive.astype(opacity.dtype)

    proj = project_gaussians(
        means3d, item_row["world_view"], item_row["full_proj"], item_row["campos"],
        image_width=item_row["width"], image_height=item_row["height"],
        tanfovx=item_row["tanfovx"], tanfovy=item_row["tanfovy"],
        scales=scales, rotations=rotations, shs=shs, opacities=opacity,
        sh_degree=sh_degree,
    )
    return proj, local_xyz


def _s3_forward_batch(net, net_vars, splats, bind, mesh_f, item: "S3Item", *,
                      sh_degree: int, raster_cfg: RasterConfig, vis_raster_hw):
    """All items: vmapped net+geometry → ONE camera-flattened rasterizer
    launch (same production path as the s2 step). Renders on bg=0 and
    composites the per-item background as ``img + bg·(1−alpha)`` outside the
    kernel — identical math, and the flattened kernel keeps a single (3,) bg.
    Returns (rendered (B,3,H,W), local_xyz (B,N,3))."""
    from gaussian_garments_tpu.renderer import _resolve_backend

    net_vars = _cast_net_vars(net, net_vars)

    def per_item(mesh_v, ambient, normal, wv, fp, cp, tfx, tfy, vis=None):
        row = {
            "mesh_v": mesh_v, "ambient": ambient, "normal": normal,
            "world_view": wv, "full_proj": fp, "campos": cp,
            "tanfovx": tfx, "tanfovy": tfy, "vis": vis,
            "width": item.width, "height": item.height,
        }
        return _s3_project(net, net_vars, splats, bind, mesh_f, row,
                           sh_degree=sh_degree, raster_cfg=raster_cfg,
                           vis_raster_hw=vis_raster_hw)

    vm_args = (item.mesh_v, item.ambient, item.normal, item.world_view,
               item.full_proj, item.campos, item.tanfovx, item.tanfovy)
    if item.vis is not None:
        projs, local_xyz = jax.vmap(per_item)(*vm_args, item.vis)
    else:
        projs, local_xyz = jax.vmap(per_item)(*vm_args)

    bg0 = jnp.zeros(3)
    if _resolve_backend(raster_cfg) == "pallas":
        from gaussian_garments_tpu.ops.pallas_tiles import rasterize_pallas_batch

        image, _, alpha, _ = rasterize_pallas_batch(
            projs, image_height=item.height, image_width=item.width, bg=bg0,
            max_tiles_side=raster_cfg.max_tiles_side,
            pair_budget=raster_cfg.pair_budget, mxu_bf16=raster_cfg.mxu_bf16)
    else:
        image, _, alpha, _ = jax.vmap(
            lambda p: _rasterize(p, image_height=item.height,
                                 image_width=item.width, bg=bg0,
                                 config=raster_cfg))(projs)
        alpha = alpha[:, None] if alpha.ndim == 3 else alpha
    rendered = image + item.bg[:, :, None, None] * (1.0 - alpha.reshape(
        image.shape[0], 1, item.height, item.width))
    return rendered, local_xyz


def _cast_net_vars(net, net_vars):
    """bf16-activation mode: cast params/buffers at apply time (f32 masters
    stay in the optimizer; the cast's VJP returns f32 grads)."""
    if net.act_dtype == jnp.float32:
        return net_vars
    return jax.tree.map(
        lambda a: a.astype(net.act_dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, net_vars)


def _s3_losses(net, net_params, net_buffers, splats, bind, mesh_f, item: S3Item,
               args, *, sh_degree, raster_cfg, vis_raster_hw):
    net_vars = {"params": net_params, "buffers": net_buffers}
    rendered, local_xyz = _s3_forward_batch(
        net, net_vars, splats, bind, mesh_f, item,
        sh_degree=sh_degree, raster_cfg=raster_cfg, vis_raster_hw=vis_raster_hw)

    mask = item.mask if args.only_foreground_loss else None
    loss_dict: Dict[str, jnp.ndarray] = {}
    loss_dict["img"] = l1_loss(rendered, item.image, mask) * (1.0 - args.lambda_dssim)
    # fast=True: 3-pass bf16 blur in the LOSS only (losses._blur docstring)
    loss_dict["ssim"] = 1.0 - ssim(rendered, item.image, mask,
                                   fast=True) * args.lambda_dssim
    # hinges (s3_appearance.py:134-137): local_xyz per item; scale/opacity
    # global. Dense layout: reduce over alive texels only, so the hinge
    # values/grads match the compact (reference) reduction exactly.
    if bind.alive is not None:
        a = bind.alive.astype(jnp.float32)
        amean = lambda x: (x * a).sum() / jnp.maximum(a.sum(), 1.0) / (
            x.shape[0] if x.ndim == 2 else 1.0)
        xyz_h = amean(jax.nn.relu(_safe_norm(local_xyz, -1) - args.threshold_xyz))
        scale_h = amean(_safe_norm(jax.nn.relu(jnp.exp(splats.scaling) - args.threshold_scale), 1))
        op_h = amean(jax.nn.relu(args.threshold_opacity - G.get_opacity(splats)).reshape(-1))
    else:
        xyz_h = jax.nn.relu(_safe_norm(local_xyz, -1) - args.threshold_xyz).mean()
        scale_h = _safe_norm(jax.nn.relu(jnp.exp(splats.scaling) - args.threshold_scale), 1).mean()
        op_h = jax.nn.relu(args.threshold_opacity - G.get_opacity(splats)).mean()
    loss_dict["xyz"] = xyz_h * args.lambda_xyz
    loss_dict["scale"] = scale_h * args.lambda_scale
    loss_dict["opacity"] = op_h * args.lambda_opacity

    total = jnp.zeros(())
    for v in loss_dict.values():
        total = total + v
    return total, loss_dict


def make_s3_pair_counter(*, raster_cfg: RasterConfig = RasterConfig(),
                         vis_raster_hw=(256, 256)):
    """Jitted (state, bind, mesh_f, item) -> (B,) pair counts for the
    pair_budget autosizing probe — the ``_s3_forward`` geometry without the
    net (local_xyz = splat rest offsets; the net's Δxyz is hinge-bounded, so
    drivers add headroom). At 512² texels the default 2M budget makes every
    pair-space op ~20× larger than the real pair count."""
    from gaussian_garments_tpu.ops.pallas_tiles import TILE_H, TILE_W, count_pairs

    @jax.jit
    def count(state: S3State, bind: AG.AvatarBinding, mesh_f, item: S3Item):
        splats = state.splats
        tiles_x = -(-item.width // TILE_W)
        tiles_y = -(-item.height // TILE_H)

        def per_item(mesh_v, wv, fp, cp, tfx, tfy, vis=None):
            frames = MG.compute_face_frames(mesh_v, mesh_f)
            rows = MG.gather_frame_rows(frames, bind.binding, mesh_v, mesh_f)
            anchor = AG.barycentric_3d(bind, mesh_v, mesh_f, rows=rows)
            means3d = AG.avatar_world_xyz(splats.xyz, bind, frames, anchor, rows=rows)
            scales = MG.world_scaling(splats, bind.binding, frames, rows=rows)
            rotations = MG.world_rotation(splats, bind.binding, frames, rows=rows)
            opacity = G.get_opacity(splats).reshape(-1)
            if vis is None:
                vis = AG.get_visible_mask_depth(
                    bind, mesh_v, mesh_f, wv, fp,
                    image_width=vis_raster_hw[1], image_height=vis_raster_hw[0],
                    rows=rows)
            opacity = opacity * vis.astype(opacity.dtype)
            if bind.alive is not None:
                opacity = opacity * bind.alive.astype(opacity.dtype)
            proj = project_gaussians(
                means3d, wv, fp, cp,
                image_width=item.width, image_height=item.height,
                tanfovx=tfx, tanfovy=tfy, scales=scales, rotations=rotations,
                colors_precomp=jnp.zeros((means3d.shape[0], 3)),
                opacities=opacity, sh_degree=0)
            return count_pairs(proj, tiles_x=tiles_x, tiles_y=tiles_y,
                               max_tiles_side=raster_cfg.max_tiles_side)

        args_ = (item.mesh_v, item.world_view, item.full_proj, item.campos,
                 item.tanfovx, item.tanfovy)
        if item.vis is not None:
            return jax.vmap(per_item)(*args_, item.vis)
        return jax.vmap(per_item)(*args_)

    return count


def make_s3_eval(net: AvatarNet, *, sh_degree: int,
                 raster_cfg: RasterConfig = RasterConfig(),
                 vis_raster_hw=(256, 256), jit: bool = True):
    """eval(state, bind, mesh_f, item) -> (B,3,H,W) rendered images.

    The inference-path forward (net → shadow textures → render) without
    losses/optimizer — used by the drivers to log PSNR/SSIM on the llffhold
    eval split (quality-parity harness; BASELINE.md targets)."""

    def eval_fn(state: S3State, bind: AG.AvatarBinding, mesh_f, item: S3Item):
        net_vars = {"params": state.net_params, "buffers": state.net_buffers}
        rendered, _ = _s3_forward_batch(
            net, net_vars, state.splats, bind, mesh_f, item,
            sh_degree=sh_degree, raster_cfg=raster_cfg,
            vis_raster_hw=vis_raster_hw)
        return rendered

    return jax.jit(eval_fn) if jit else eval_fn


def make_s3_step(net: AvatarNet, args, *, sh_degree: int,
                 raster_cfg: RasterConfig = RasterConfig(),
                 vis_raster_hw=(256, 256),
                 train_gaussians: bool = True,
                 axis_name: Optional[str] = None,
                 jit: bool = True):
    """step(state, bind, mesh_f, item) -> (state, loss_dict)."""

    def step(state: S3State, bind: AG.AvatarBinding, mesh_f, item: S3Item):
        def loss_net(net_params, splats):
            return _s3_losses(net, net_params, state.net_buffers, splats, bind,
                              mesh_f, item, args, sh_degree=sh_degree,
                              raster_cfg=raster_cfg, vis_raster_hw=vis_raster_hw)

        if train_gaussians:
            (loss, ld), (g_net, g_spl) = jax.value_and_grad(loss_net, argnums=(0, 1), has_aux=True)(
                state.net_params, state.splats)
        else:
            (loss, ld), g_net = jax.value_and_grad(loss_net, argnums=0, has_aux=True)(
                state.net_params, state.splats)
            g_spl = None

        if axis_name is not None:
            g_net = jax.lax.pmean(g_net, axis_name)
            ld = jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), ld)
            if g_spl is not None:
                g_spl = jax.lax.pmean(g_spl, axis_name)

        net_lr = jax.tree.map(lambda _: args.lr_init, state.net_params)
        new_net, net_adam = tree_adam_step(state.net_params, g_net, state.net_adam, net_lr)
        new_state = state.replace(net_params=new_net, net_adam=net_adam,
                                  iteration=state.iteration + 1)
        if train_gaussians:
            spl_lr = _splat_lr_tree(args, state.splats)
            new_spl, spl_adam = tree_adam_step(state.splats, g_spl, state.splat_adam, spl_lr)
            new_state = new_state.replace(splats=new_spl, splat_adam=spl_adam)
        return new_state, ld

    return jax.jit(step) if jit else step
