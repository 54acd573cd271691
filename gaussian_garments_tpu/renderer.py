"""Public differentiable render API.

Mirrors the reference ``gaussian_renderer.render`` / ``doll_render``
(``gaussian_renderer/__init__.py:21-221``) — the single most important
interface in the pipeline — but functional: the caller passes a
``SplatBundle`` (world-space splat tensors + SH config) instead of a stateful
model, and gets back the same output dict
``{render, viewspace_points, visibility_filter, radii, 3dposition, depth, alpha}``.

Differences by design (documented for parity review):
- ``viewspace_points`` grads: JAX has no ``retain_grad``; pass
  ``screen_offset`` (zeros (N,2)) and differentiate w.r.t. it — identical
  gradient signal (``∂L/∂mean2D``) used for densification stats.
- ``vis_mask``: the reference drops rows (dynamic shape); we zero opacities,
  which renders identically and keeps shapes static for XLA.
- Padded/dead splats (capacity scheme) also render with opacity 0.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from gaussian_garments_tpu.ops.projection import project_gaussians
from gaussian_garments_tpu.ops.rasterizer_ref import rasterize_reference
from gaussian_garments_tpu.ops.tiled import rasterize_tiled


@struct.dataclass
class SplatBundle:
    """World-space splat tensors ready for rasterization."""

    means3d: jnp.ndarray                      # (N,3)
    opacity: jnp.ndarray                      # (N,1) activated
    scales: Optional[jnp.ndarray] = None      # (N,3) activated
    rotations: Optional[jnp.ndarray] = None   # (N,4) normalized
    cov3d_precomp: Optional[jnp.ndarray] = None  # (N,6)
    shs: Optional[jnp.ndarray] = None         # (N,K,3)
    colors_precomp: Optional[jnp.ndarray] = None  # (N,3)
    active_sh_degree: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class RasterConfig:
    """Static rasterizer knobs (pytree aux data).

    backend: "auto" (Pallas kernel on TPU, XLA tiled path elsewhere),
    "pallas", "tiled", or "reference" (exact per-pixel oracle)."""

    tile_size: int = struct.field(pytree_node=False, default=16)
    max_tiles_side: int = struct.field(pytree_node=False, default=6)
    tile_capacity: int = struct.field(pytree_node=False, default=256)
    chunk_tiles: int = struct.field(pytree_node=False, default=64)
    use_reference: bool = struct.field(pytree_node=False, default=False)
    backend: str = struct.field(pytree_node=False, default="auto")
    pair_budget: int = struct.field(pytree_node=False, default=2_097_152)
    # bf16 inputs (f32 accumulate) for the kernels' MXU matmuls: ~4× matmul
    # rate, ≤0.4% relative error on blend weights/gradients — quality-gated
    # via the PSNR harness before enabling in production (MEASUREMENTS.md)
    mxu_bf16: bool = struct.field(pytree_node=False, default=False)
    # reference backend only: composite this many pixels at a time so the
    # O(K·P) oracle buffer fits device memory at harness sizes
    ref_pixel_chunk: Optional[int] = struct.field(pytree_node=False, default=None)


def _resolve_backend(config: RasterConfig) -> str:
    if config.use_reference:
        return "reference"
    if config.backend != "auto":
        return config.backend
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "tiled"


def _rasterize(proj, *, image_height, image_width, bg, config: RasterConfig):
    backend = _resolve_backend(config)
    if backend == "reference":
        image, depth, alpha = rasterize_reference(
            proj, image_height=image_height, image_width=image_width, bg=bg,
            pixel_chunk=config.ref_pixel_chunk)
        import jax.numpy as jnp_
        aux = {"n_clipped": jnp_.zeros((), jnp_.int32), "n_overflow": jnp_.zeros((), jnp_.int32)}
        return image, depth, alpha, aux
    if backend == "pallas":
        from gaussian_garments_tpu.ops.pallas_tiles import rasterize_pallas

        return rasterize_pallas(
            proj, image_height=image_height, image_width=image_width, bg=bg,
            max_tiles_side=config.max_tiles_side, pair_budget=config.pair_budget,
            mxu_bf16=config.mxu_bf16)
    return rasterize_tiled(
        proj, image_height=image_height, image_width=image_width, bg=bg,
        tile_size=config.tile_size, max_tiles_side=config.max_tiles_side,
        tile_capacity=config.tile_capacity, chunk_tiles=config.chunk_tiles)


def doll_render(camera, bundle: SplatBundle, bg_color, *, override_shs=None,
                scaling_modifier: float = 1.0, vis_mask=None,
                config: "RasterConfig" = None):
    """Raw-attribute render used at inference (reference ``doll_render``,
    gaussian_renderer/__init__.py:124-221): same as ``render`` but the caller
    supplies already-combined SH (``override_shs``) on a concatenated
    multi-garment bundle. Returns (image, depth, alpha)."""
    if override_shs is not None:
        bundle = bundle.replace(shs=override_shs)
    out = render(camera, bundle, bg_color, scaling_modifier=scaling_modifier,
                 vis_mask=vis_mask, config=config or RasterConfig())
    return out["render"], out["depth"], out["alpha"]


@struct.dataclass
class BatchedCameras:
    """A stacked batch of cameras sharing static width/height — the unit of
    camera data parallelism (SURVEY.md §2.6: stage 2 renders k cameras per
    step, one shard per chip, instead of the reference's 1 random
    camera/iteration)."""

    world_view: jnp.ndarray   # (B,4,4) transposed world->view
    full_proj: jnp.ndarray    # (B,4,4)
    campos: jnp.ndarray       # (B,3)
    tanfovx: jnp.ndarray      # (B,)
    tanfovy: jnp.ndarray      # (B,)
    image: Optional[jnp.ndarray] = None   # (B,3,H,W)
    mask: Optional[jnp.ndarray] = None    # (B,1,H,W)
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_cameras(cls, cameras, include_images: bool = True) -> "BatchedCameras":
        """include_images=False builds a geometry-only batch (the pair-count
        probe batches ~100 cameras; stacking their images would be ~GBs)."""
        import numpy as np
        c0 = cameras[0]
        has_img = include_images and c0.original_image is not None
        has_mask = include_images and c0.gt_alpha_mask is not None
        return cls(
            world_view=jnp.stack([c.world_view_transform for c in cameras]),
            full_proj=jnp.stack([c.full_proj_transform for c in cameras]),
            campos=jnp.stack([c.camera_center for c in cameras]),
            tanfovx=jnp.asarray(np.array([c.tanfovx for c in cameras], np.float32)),
            tanfovy=jnp.asarray(np.array([c.tanfovy for c in cameras], np.float32)),
            image=jnp.stack([c.original_image for c in cameras]) if has_img else None,
            mask=jnp.stack([c.gt_alpha_mask for c in cameras]) if has_mask else None,
            width=c0.image_width,
            height=c0.image_height,
        )


def render_batch(
    cams: BatchedCameras,
    bundle: SplatBundle,
    bg_color: jnp.ndarray,
    *,
    scaling_modifier: float = 1.0,
    vis_mask: Optional[jnp.ndarray] = None,
    screen_offset: Optional[jnp.ndarray] = None,  # (B,N,2)
    config: RasterConfig = RasterConfig(),
):
    """vmapped render over a camera batch. Returns the same dict with a
    leading batch axis on render/depth/alpha/radii."""
    import jax

    opac = bundle.opacity.reshape(-1)
    if vis_mask is not None:
        opac = opac * vis_mask.astype(opac.dtype)

    def proj_one(wv, fp, cp, tfx, tfy, off):
        return project_gaussians(
            bundle.means3d, wv, fp, cp,
            image_width=cams.width, image_height=cams.height,
            tanfovx=tfx, tanfovy=tfy,
            scales=bundle.scales, rotations=bundle.rotations,
            cov3d_precomp=bundle.cov3d_precomp,
            shs=bundle.shs, colors_precomp=bundle.colors_precomp,
            opacities=opac, sh_degree=bundle.active_sh_degree,
            scaling_modifier=scaling_modifier, screen_offset=off,
        )

    if screen_offset is None:
        screen_offset = jnp.zeros((cams.world_view.shape[0], bundle.means3d.shape[0], 2))
    projs = jax.vmap(proj_one)(
        cams.world_view, cams.full_proj, cams.campos, cams.tanfovx, cams.tanfovy, screen_offset
    )
    radii = projs.radii
    if _resolve_backend(config) == "pallas":
        # ONE flattened kernel launch over all cameras (dynamic exact grid)
        # instead of vmapped per-camera launches with static padded grids
        from gaussian_garments_tpu.ops.pallas_tiles import rasterize_pallas_batch

        image, depth, alpha, aux = rasterize_pallas_batch(
            projs, image_height=cams.height, image_width=cams.width,
            bg=bg_color, max_tiles_side=config.max_tiles_side,
            pair_budget=config.pair_budget, mxu_bf16=config.mxu_bf16)
    else:
        image, depth, alpha, aux = jax.vmap(
            lambda p: _rasterize(p, image_height=cams.height,
                                 image_width=cams.width, bg=bg_color,
                                 config=config))(projs)
    return {
        "render": image,
        "depth": depth,
        "alpha": alpha,
        "radii": radii,
        "visibility_filter": radii > 0,
        "raster_aux": aux,
    }


def count_pairs_batch(
    cams: BatchedCameras,
    bundle: SplatBundle,
    *,
    vis_mask: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    config: RasterConfig = RasterConfig(),
) -> jnp.ndarray:
    """(B,) exact per-camera (tile, splat) pair counts for this bundle — the
    probe behind ``RasterConfig.pair_budget`` autosizing (same projection and
    rect math as ``render_batch``, no sort/render)."""
    import jax

    from gaussian_garments_tpu.ops.pallas_tiles import TILE_H, TILE_W, count_pairs

    opac = bundle.opacity.reshape(-1)
    if vis_mask is not None:
        opac = opac * vis_mask.astype(opac.dtype)
    tiles_x = -(-cams.width // TILE_W)
    tiles_y = -(-cams.height // TILE_H)

    def count_one(wv, fp, cp, tfx, tfy):
        proj = project_gaussians(
            bundle.means3d, wv, fp, cp,
            image_width=cams.width, image_height=cams.height,
            tanfovx=tfx, tanfovy=tfy,
            scales=bundle.scales, rotations=bundle.rotations,
            cov3d_precomp=bundle.cov3d_precomp,
            shs=bundle.shs, colors_precomp=bundle.colors_precomp,
            opacities=opac, sh_degree=bundle.active_sh_degree,
            scaling_modifier=scaling_modifier,
        )
        return count_pairs(proj, tiles_x=tiles_x, tiles_y=tiles_y,
                           max_tiles_side=config.max_tiles_side)

    return jax.vmap(count_one)(
        cams.world_view, cams.full_proj, cams.campos, cams.tanfovx, cams.tanfovy)


def render(
    camera,
    bundle: SplatBundle,
    bg_color: jnp.ndarray,
    *,
    scaling_modifier: float = 1.0,
    vis_mask: Optional[jnp.ndarray] = None,
    screen_offset: Optional[jnp.ndarray] = None,
    config: RasterConfig = RasterConfig(),
):
    """Differentiable splat render of one camera.

    Matches the marshaling of the reference ``render``
    (``gaussian_renderer/__init__.py:36-122``): raster settings from the
    camera's tan-fov/matrices, SH evaluated at ``active_sh_degree``, and the
    depth/alpha outputs of the ``depth_alpha`` CUDA variant.
    """
    opac = bundle.opacity.reshape(-1)
    if vis_mask is not None:
        opac = opac * vis_mask.astype(opac.dtype)

    proj = project_gaussians(
        bundle.means3d,
        camera.world_view_transform,
        camera.full_proj_transform,
        camera.camera_center,
        image_width=camera.image_width,
        image_height=camera.image_height,
        tanfovx=camera.tanfovx,
        tanfovy=camera.tanfovy,
        scales=bundle.scales,
        rotations=bundle.rotations,
        cov3d_precomp=bundle.cov3d_precomp,
        shs=bundle.shs,
        colors_precomp=bundle.colors_precomp,
        opacities=opac,
        sh_degree=bundle.active_sh_degree,
        scaling_modifier=scaling_modifier,
        screen_offset=screen_offset,
    )

    image, depth, alpha, aux = _rasterize(
        proj, image_height=camera.image_height, image_width=camera.image_width,
        bg=bg_color, config=config)

    return {
        "render": image,
        "visibility_filter": proj.radii > 0,
        "radii": proj.radii,
        "3dposition": bundle.means3d,
        "depth": depth,
        "alpha": alpha,
        "raster_aux": aux,
    }
