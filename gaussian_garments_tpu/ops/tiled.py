"""Production tiled rasterizer (XLA path).

TPU-native redesign of the CUDA tile rasterizer in
``diff_gaussian_rasterization_depth_alpha`` (used by every stage of the
reference, ``gaussian_renderer/__init__.py:103-111``). The CUDA kernel builds
dynamic per-tile splat lists with atomics and shared-memory batching; on TPU we
want static shapes and big vector ops, so the same algorithm becomes:

1. **Pair expansion** (static capacity): every splat emits up to SIDE² candidate
   (tile, splat) pairs covering its screen rect — CUDA's `duplicateWithKeys`.
2. **Global lexicographic sort** by (tile_id, depth_rank) with `jax.lax.sort`
   — CUDA's radix sort over packed 64-bit keys.
3. **Segment lookup** per tile via `searchsorted` — CUDA's `identifyTileRanges`.
4. **Per-tile gather** of the first `tile_capacity` (nearest) splats into a
   dense (T, K) index table.
5. **Compositing**: per tile, the exact cumulative-transmittance blend of
   ``rasterizer_ref.composite_pixels`` vmapped over a chunk of tiles,
   `lax.map`-ed over chunks so peak memory stays bounded. Differentiable end to
   end by autodiff (the blend is a parallel prefix, not a serial loop);
   `jax.checkpoint` on the chunk keeps backward memory flat.

Capacity semantics (vs the unbounded CUDA lists):
- a splat whose rect exceeds SIDE×SIDE tiles is clipped to its top-left
  SIDE×SIDE block; the count of such splats is reported in ``aux``;
- a tile with more than `tile_capacity` splats keeps the nearest K (front-to-
  back order) — occluded tails beyond K are below the T<1e-4 cutoff in
  practice; the overflow count is reported in ``aux``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_garments_tpu.ops.projection import ProjectedGaussians
from gaussian_garments_tpu.ops.rasterizer_ref import composite_pixels


class TileBinning(NamedTuple):
    tile_idx: jnp.ndarray      # (T, K) int32 splat indices (front-to-back)
    tile_mask: jnp.ndarray     # (T, K) bool
    n_clipped: jnp.ndarray     # () int32 — splats whose rect exceeded SIDE²
    n_overflow: jnp.ndarray    # () int32 — tiles with > K splats


def bin_splats(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depth: jnp.ndarray,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    max_tiles_side: int,
    tile_capacity: int,
) -> TileBinning:
    """Build per-tile front-to-back splat lists (steps 1–4 above)."""
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y
    side = max_tiles_side

    r = radii.astype(jnp.float32)
    # CUDA getRect: [min, max) tile rect
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile_size), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile_size), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + r + tile_size - 1) / tile_size) + 1, 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + r + tile_size - 1) / tile_size) + 1, 0, tiles_y).astype(jnp.int32)
    # NOTE: CUDA uses integer division of (p + r + BLOCK - 1) / BLOCK; floor of
    # the float expression above is identical for non-negative operands, and
    # clip handles the negatives that CUDA's max(0, ·) handles.

    alive = radii > 0
    w_tiles = x1 - x0
    h_tiles = y1 - y0
    n_clipped = jnp.sum((alive & ((w_tiles > side) | (h_tiles > side))).astype(jnp.int32))

    off = jnp.arange(side * side, dtype=jnp.int32)
    ox = (off % side)[None, :]          # (1, S²)
    oy = (off // side)[None, :]
    tx = x0[:, None] + ox               # (N, S²)
    ty = y0[:, None] + oy
    pair_valid = alive[:, None] & (tx < x1[:, None]) & (ty < y1[:, None])
    tile_id = jnp.where(pair_valid, ty * tiles_x + tx, num_tiles)  # sentinel last

    # depth rank (front-to-back within tile after lexicographic sort)
    order = jnp.argsort(depth)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    splat_id = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], tile_id.shape)
    keys_tile = tile_id.reshape(-1)
    keys_rank = jnp.broadcast_to(rank[:, None], tile_id.shape).reshape(-1)
    vals = splat_id.reshape(-1)
    sorted_tile, _, sorted_splat = jax.lax.sort((keys_tile, keys_rank, vals), num_keys=2)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    counts = ends - starts
    n_overflow = jnp.sum((counts > tile_capacity).astype(jnp.int32))

    k = jnp.arange(tile_capacity, dtype=jnp.int32)
    gather_pos = jnp.minimum(starts[:, None] + k[None, :], sorted_splat.shape[0] - 1)
    tile_idx = sorted_splat[gather_pos]                      # (T, K)
    tile_mask = k[None, :] < jnp.minimum(counts, tile_capacity)[:, None]
    return TileBinning(tile_idx, tile_mask, n_clipped, n_overflow)


def _composite_chunk(
    idx, mask, tile_origin, means2d, conic, rgb, opacity, depth, bg, tile_size
):
    """Blend one chunk of tiles: idx/mask (C,K), tile_origin (C,2)."""

    local = jnp.arange(tile_size * tile_size, dtype=jnp.float32)
    lx = local % tile_size
    ly = local // tile_size

    def one_tile(idx_t, mask_t, origin_t):
        pix = jnp.stack([origin_t[0] + lx, origin_t[1] + ly], axis=-1)  # (P,2)
        return composite_pixels(
            pix,
            means2d[idx_t],
            conic[idx_t],
            rgb[idx_t],
            opacity[idx_t],
            depth[idx_t],
            mask_t,
            bg,
        )

    return jax.vmap(one_tile)(idx, mask, tile_origin.astype(jnp.float32))


def rasterize_tiled(
    proj: ProjectedGaussians,
    *,
    image_height: int,
    image_width: int,
    bg: jnp.ndarray,
    tile_size: int = 16,
    max_tiles_side: int = 6,
    tile_capacity: int = 192,
    chunk_tiles: int = 64,
):
    """Render the full image with the tiled compositor.

    Returns ``(image (3,H,W), depth (1,H,W), alpha (1,H,W), aux)`` where aux
    carries binning diagnostics (clipped/overflow counts).
    """
    tiles_x = -(-image_width // tile_size)
    tiles_y = -(-image_height // tile_size)
    num_tiles = tiles_x * tiles_y

    binning = bin_splats(
        proj.means2d, proj.radii, proj.depth,
        tiles_x=tiles_x, tiles_y=tiles_y, tile_size=tile_size,
        max_tiles_side=max_tiles_side, tile_capacity=tile_capacity,
    )

    # tile origins in pixels
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    origin = jnp.stack([(t_ids % tiles_x) * tile_size, (t_ids // tiles_x) * tile_size], axis=-1)

    # pad tiles to a multiple of chunk_tiles and map over chunks
    pad = (-num_tiles) % chunk_tiles
    idx = jnp.pad(binning.tile_idx, ((0, pad), (0, 0)))
    mask = jnp.pad(binning.tile_mask, ((0, pad), (0, 0)))
    org = jnp.pad(origin, ((0, pad), (0, 0)))
    n_chunks = (num_tiles + pad) // chunk_tiles

    comp = jax.checkpoint(
        functools.partial(
            _composite_chunk,
            means2d=proj.means2d, conic=proj.conic, rgb=proj.rgb,
            opacity=proj.opacity, depth=proj.depth, bg=bg, tile_size=tile_size,
        ),
        static_argnums=(),
    )

    def chunk_fn(args):
        return comp(*args)

    color, dpt, alp = jax.lax.map(
        chunk_fn,
        (
            idx.reshape(n_chunks, chunk_tiles, -1),
            mask.reshape(n_chunks, chunk_tiles, -1),
            org.reshape(n_chunks, chunk_tiles, 2),
        ),
    )
    # (n_chunks, C, P, 3) -> (T_pad, P, 3) -> image
    p = tile_size

    def untile(x, ch):
        x = x.reshape(num_tiles + pad, p * p, ch)[:num_tiles]
        x = x.reshape(tiles_y, tiles_x, p, p, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * p, tiles_x * p, ch)
        return x[:image_height, :image_width]

    image = untile(color.reshape(-1, p * p, 3), 3).transpose(2, 0, 1)
    depth_img = untile(dpt.reshape(-1, p * p, 1), 1).transpose(2, 0, 1)
    alpha_img = untile(alp.reshape(-1, p * p, 1), 1).transpose(2, 0, 1)

    aux = {"n_clipped": binning.n_clipped, "n_overflow": binning.n_overflow}
    return image, depth_img, alpha_img, aux
