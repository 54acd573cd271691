"""Pallas TPU kernel for per-tile splat compositing.

This is the hot loop of the renderer — the TPU equivalent of the CUDA
``renderCUDA`` kernel in ``diff_gaussian_rasterization_depth_alpha``
(SURVEY.md §2.5 #1). The XLA fallback (``ops.tiled``) gathers a *fixed*
capacity K of splats per tile, so its work is T·K·P regardless of occupancy;
this kernel walks each tile's exact pair segment (work ∝ Σ pairs, like the
CUDA kernel).

Design (vector registers are 8 sublanes × 128 lanes):
- **pixels live on sublanes** (one 16×32 tile = 512 sublanes) and **pairs on
  lanes** (SUB=128 splats per prefix sub-block), so the per-step working set
  is (PIX, 128) f32 — perfectly tiled vregs;
- pair features are gathered once in XLA into a transposed ``(16, NP)`` array
  in (tile, depth)-sorted **pair space** (no per-tile alignment padding);
- the grid is a flattened **work-item list**: one item per (tile, CHUNK-pair
  chunk) overlap. A chunk that spans a tile boundary simply appears as the
  last item of one tile and the first item of the next, with complementary
  lane masks — Mosaic double-buffers the input block DMA and keeps the output
  tile block resident while consecutive items share a tile;
- the production path (``rasterize_pallas_batch``) flattens ALL cameras of a
  batch into one global item list and runs a **dynamic grid** of exactly the
  real item count (empty tiles emit no items; a grid step costs ~0.8 µs even
  as a no-op — MEASUREMENTS.md "Batched-render lessons");
- the front-to-back transmittance prefix is a strictly-upper-triangular
  (128×128) matmul on the MXU (parallel prefix instead of CUDA's serial loop);
- color/depth accumulate as one (4×128)@(PIX×128)ᵀ MXU matmul per step into a
  CHANNEL-MAJOR (8, PIX) output tile — a (PIX, 8) tile would pad its 8-wide
  minor dim to 128 lanes in HBM, 16×-inflating the kernel's writes and every
  downstream pass (mask, untile, cotangent assembly, backward reads);
- item-granular early exit once every pixel saturates (T < 1e-4) — the
  forward records each tile's live item count + boundary log T, and the
  backward's dynamic grid keeps ONLY those live items (dead pairs have
  exactly zero gradient) while the pair-grad reduction discards unvisited
  grad blocks — mirroring
  the CUDA per-pixel break (the DMA still streams, fully overlapped).

Gradients: ``rasterize_pallas`` wires a ``jax.custom_vjp`` whose backward is
a dedicated second Pallas kernel (``_backward_kernel``): a back-to-front
re-traversal of the same work-item list reusing the forward's packed pairs as
residuals, reconstructing per-pair transmittance from the saved final
log-transmittance and accumulating the analytic gradients (same masking
thresholds as the forward — mirrored in ``ops/rasterizer_ref.py`` and
``ops/tiled.py``, enforced by ``tests/test_pallas.py``).

Feature rows (16, padded): [0]=mean_x [1]=mean_y [2]=conic_a [3]=conic_b
[4]=conic_c [5]=opacity [6]=r [7]=g [8]=b [9]=view_depth [10:16]=pad.

Packed bf16 feature rows (``feats_packed``, auto beyond ~190K splats): the
(N,16) f32 table costs 26-45 ms to gather 2.1M rows once it exceeds the
~12 MB on-chip working set (vs ~9-12 ms under it — measured cliff,
``scripts/profile_gather_cliff.py``); a bf16 table halves the bytes and
restores the fast gather at 262K texel-splat scale. Precision-critical
columns are split hi/lo (hi=bf16(x), lo=bf16(x−hi): ~7.6e-6 relative — the
pair ≈ f16-extended): [0]=mx_hi [1]=mx_lo [2]=my_hi [3]=my_lo [4]=ca_hi
[5]=ca_lo [6]=cb_hi [7]=cb_lo [8]=cc_hi [9]=cc_lo [10]=opacity [11]=r
[12]=g [13]=b [14]=d_hi [15]=d_lo; opacity/rgb stay single bf16 (≤0.4%
relative, below the 1/255 alpha masking granularity). Both kernels
reconstruct f32 rows via ``_unpack_block``; pair-gradient outputs stay f32.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_garments_tpu.ops.projection import ProjectedGaussians

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
LOG_T_EPS = float(np.log(1e-4))
ALPHA_MAX = 0.99
TILE_W = 16        # pixel-x per tile (lane-aligned)
TILE_H = int(os.environ.get("GG_TILE_H", "32"))
                   # pixel-y per tile: 16x32 tiles generate ~0.66x the
                   # (tile,splat) pairs of the CUDA-canonical 16x16 at bench
                   # scale, shrinking EVERY pair-space cost (binning sort,
                   # feature gather, both kernels' item counts, the backward
                   # pair-grad segment_sum) for ~1.33x per-pair pixel math —
                   # measured win, MEASUREMENTS.md "tile shape A/B".
                   # GG_TILE_H overrides for shape experiments (the r5 ladder
                   # shows the fwd kernel is grid-step-bound at ~6.5K items,
                   # so taller tiles trade per-pair pixel math for item count)
PIX = TILE_W * TILE_H  # 512 pixels on sublanes
FDIM = 16
CHUNK = 256        # pairs per work item (multiple of SUB; 512 measured
                   # SLOWER — 39.2 vs 36.1 ms at bench: the halved grid-step
                   # count does not pay for the extra masked sub-block work
                   # in partially-filled chunks)
SUB = 128          # lanes per prefix-matmul sub-block == vreg lane width


class PackedPairs(NamedTuple):
    feats_t: jnp.ndarray       # (16, NP+CHUNK) f32, (tile,depth)-sorted pair space
    starts: jnp.ndarray        # (T+1,) int32 segment starts (+ guard row)
    counts: jnp.ndarray        # (T+1,) int32 real pair counts (+ 0 guard)
    chunk_of_item: jnp.ndarray  # (W,) int32 input block per work item
    tile_of_item: jnp.ndarray   # (W,) int32 output tile per work item
    k_of_item: jnp.ndarray      # (W,) int32 item index within its tile
    sorted_rank: jnp.ndarray   # (NP,) int32 depth rank per sorted pair
    rank: jnp.ndarray          # (N,) int32 depth rank per splat (bwd reorder)
    n_valid: jnp.ndarray       # () int32 total real pairs (pre-truncation)
    n_clipped: jnp.ndarray     # () int32 splats whose rect exceeded SIDE²
    n_items_total: jnp.ndarray  # () int32 real work items (dynamic grid bound)


def _lower_bound(sorted_arr: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Vectorized first-index-of lower bound: unrolled binary search (the
    gathers are tiny — #queries × log₂ n — where a scatter-add histogram over
    the same data costs ~30 ms at 2M pairs on TPU)."""
    n = sorted_arr.shape[0]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    for _ in range(max(1, int(np.ceil(np.log2(n + 1))))):
        mid = (lo + hi) >> 1
        v = sorted_arr[jnp.minimum(mid, n - 1)]
        # mid == n only in the converged lo == hi == n state (query greater
        # than every element); the clamped read then compares sorted[n-1]
        # and, un-guarded, walks lo past n — an off-by-one that corrupts the
        # last tile's segment whenever the pair table has no junk tail
        # (n_valid == np_slots, e.g. an exactly-full pair budget)
        go_right = (v < queries) & (mid < n)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


RANK_BITS = 18
RANK_MASK = (1 << RANK_BITS) - 1


def _tile_rects(proj: ProjectedGaussians, *, tiles_x: int, tiles_y: int):
    """Per-splat tile rect (x0,y0,x1,y1) + alive mask, with opacity-aware
    per-axis tight extents (EXACT culling).

    The kernel zeroes any contribution with alpha < ALPHA_EPS, and
    alpha = opac·exp(−½dᵀCd) with C = conic, so pairs outside the level set
    ½dᵀCd = ln(opac/ALPHA_EPS) are identically zero in the composite. The
    ellipse's per-axis extent is √(2τ·(C⁻¹)ₐₐ); the reference's 3σ circular
    rect (`radii`) stays as the outer clamp, so this only removes exact
    zeros (reference CUDA uses the plain 3σ rect). Big win after opacity
    resets in s2 (opac 0.01 → extents shrink ~2.2×/axis) and for s3
    visibility masking (opac 0 → no pairs at all)."""
    means2d, radii = proj.means2d, proj.radii
    r = radii.astype(jnp.float32)
    ca, cb, cc = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    det = ca * cc - cb * cb
    tau2 = 2.0 * jnp.log(jnp.maximum(proj.opacity, 1e-12) / ALPHA_EPS)
    good = jnp.isfinite(det) & (det > 1e-24) & jnp.isfinite(tau2)
    ex = jnp.where(good, jnp.sqrt(jnp.maximum(tau2 * cc, 0.0) /
                                  jnp.maximum(det, 1e-24)), r)
    ey = jnp.where(good, jnp.sqrt(jnp.maximum(tau2 * ca, 0.0) /
                                  jnp.maximum(det, 1e-24)), r)
    ex = jnp.minimum(jnp.where(jnp.isfinite(ex), ex, r), r)
    ey = jnp.minimum(jnp.where(jnp.isfinite(ey), ey, r), r)

    x0 = jnp.clip(jnp.floor((means2d[:, 0] - ex) / TILE_W), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - ey) / TILE_H), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + ex + TILE_W - 1) / TILE_W) + 1, 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + ey + TILE_H - 1) / TILE_H) + 1, 0, tiles_y).astype(jnp.int32)

    alive = (radii > 0) & (proj.opacity >= ALPHA_EPS)
    return x0, y0, x1, y1, alive


# float-safety margin (pixels) on the per-row ellipse spans: never cull a
# pixel whose alpha crosses ALPHA_EPS exactly at the span boundary
_SPAN_EPS_PX = 1e-3


def _row_spans(proj: ProjectedGaussians, x0, y0, x1, y1, alive, *,
               tiles_x: int, side: int):
    """Per-(splat, tile-row) EXACT x-span of the alpha ≥ 1/255 level set.

    The global rect is the bounding box of the opacity-aware ellipse
    {½dᵀCd ≤ τ}; for anisotropic (surface-aligned) garment splats most of
    the box's corner tiles never intersect the ellipse. For tile row r with
    pixel-y strip dy ∈ [l, u], the reachable dx interval is
    [−max(−dx⁻), max(dx⁺)] where dx±(dy) = (−b·dy ± √D(dy))/a,
    D(dy) = (b²−ac)dy² + a·(2τ): dx⁺ is concave (D is a downward parabola),
    so its strip max sits at dy* = −(b/c)·ex clamped into [l, u] (and the
    mirrored point for dx⁻). This is the SnugBox/SpeedySplat-style exact
    per-row bound, computed as (N, side) vectorized XLA — culled pairs have
    alpha < ALPHA_EPS at every pixel of their tile, so the composite (and
    every gradient) is bit-identical. Returns (row_w, row_o): width and
    x-offset from x0 per row, both < 16 (nibble-packable; requires
    side ≤ 8)."""
    mx, my = proj.means2d[:, 0:1], proj.means2d[:, 1:2]        # (N,1)
    a, b, c = proj.conic[:, 0:1], proj.conic[:, 1:2], proj.conic[:, 2:3]
    tau2 = 2.0 * jnp.log(jnp.maximum(proj.opacity[:, None], 1e-12) / ALPHA_EPS)
    det = a * c - b * b
    good = (jnp.isfinite(det) & (det > 1e-24) & jnp.isfinite(tau2)
            & (a > 1e-24) & (c > 1e-24))
    a_ = jnp.where(good, a, 1.0)
    c_ = jnp.where(good, c, 1.0)
    ex = jnp.sqrt(jnp.maximum(tau2 * c_, 0.0) / jnp.maximum(det, 1e-24))

    r_idx = jnp.arange(side, dtype=jnp.int32)[None, :]         # (1, side)
    ry = y0[:, None] + r_idx                                   # (N, side)
    in_rect = (ry < y1[:, None]) & (r_idx < side)
    l = (ry * TILE_H).astype(jnp.float32) - my                 # strip dy range
    u = l + float(TILE_H - 1)

    def strip_extent(dy_star):
        dy_c = jnp.clip(dy_star, l, u)
        d_ = (b * b - a * c) * dy_c * dy_c + a_ * tau2
        ok = d_ > 0.0                    # |dy*| < ey always, so d_ ≤ 0 means
        # the whole strip lies outside the ellipse (an edge row the global
        # rect's rounding let through) → empty row
        return ok, dy_c, jnp.sqrt(jnp.maximum(d_, 0.0))

    # px − mx ∈ [dx⁻, dx⁺]; strip max of dx⁺ sits at dy = −(b/c)·ex, strip
    # max of −dx⁻ at the mirrored +(b/c)·ex (both concave)
    okp, dyp, sqp = strip_extent(-(b / c_) * ex)
    okn, dyn, sqn = strip_extent((b / c_) * ex)
    xpos = (-b * dyp + sqp) / a_ + _SPAN_EPS_PX
    xneg = (b * dyn + sqn) / a_ + _SPAN_EPS_PX

    x_hi = jnp.minimum(x1, x0 + side)[:, None]                 # clipped window
    rx0 = jnp.clip(jnp.floor((mx - xneg) / TILE_W).astype(jnp.int32),
                   x0[:, None], x_hi)
    rx1 = jnp.clip(jnp.floor((mx + xpos) / TILE_W).astype(jnp.int32) + 1,
                   rx0, x_hi)
    row_ok = in_rect & (okp & okn | jnp.logical_not(good))
    # bad-conic splats (good=False) keep the full rect row (matches the
    # _tile_rects radii fallback); safe selects avoid NaN poisoning
    w_full = jnp.clip(x1 - x0, 0, side)[:, None]
    row_w = jnp.where(row_ok,
                      jnp.where(good, rx1 - rx0, w_full), 0)
    row_o = jnp.where(row_ok & good, rx0 - x0[:, None], 0)
    row_w = jnp.where(alive[:, None], row_w, 0)
    return row_w.astype(jnp.int32), row_o.astype(jnp.int32)


def count_pairs(proj: ProjectedGaussians, *, tiles_x: int, tiles_y: int,
                max_tiles_side: int) -> jnp.ndarray:
    """Exact (tile, splat) pair count this camera generates — identical
    row-span math to ``pack_pairs``, none of its sort/gather cost. Drivers
    use it to autosize ``RasterConfig.pair_budget`` to the scene instead of
    paying the static-shape cost of the 2M default (all pair-space ops —
    sort, feature gather, backward segment-sum — scale with the budget, not
    with the real pair count; MEASUREMENTS.md)."""
    x0, y0, x1, y1, alive = _tile_rects(proj, tiles_x=tiles_x, tiles_y=tiles_y)
    # branch condition MUST mirror pack_pairs' (row-exact only on the compact
    # path): a mismatch would undercount the budget and truncate pairs
    if max_tiles_side <= 8 and proj.means2d.shape[0] <= (1 << RANK_BITS):
        row_w, _ = _row_spans(proj, x0, y0, x1, y1, alive,
                              tiles_x=tiles_x, side=max_tiles_side)
        return jnp.sum(row_w).astype(jnp.int32)
    w = jnp.clip(x1 - x0, 0, max_tiles_side)
    h = jnp.clip(y1 - y0, 0, max_tiles_side)
    return jnp.sum(jnp.where(alive, w * h, 0).astype(jnp.int32))


def _mm(a, b, dims, bf16: bool):
    """dot_general with optional bf16 inputs (f32 accumulate). The MXU runs
    bf16×bf16→f32 at full rate where f32×f32 needs multi-pass decomposition
    (~4× slower); the 0/1 prefix masks are exact in bf16 and the value
    operands lose ≤0.4% relative — opt-in via RasterConfig.mxu_bf16, gated by
    the PSNR harness (MEASUREMENTS.md)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


# feature tables beyond this byte size fall off the fast-gather working set
# (measured cliff between 8.5 and 16.8 MB; scripts/profile_gather_cliff.py)
FEATS_PACK_BYTES = 12_000_000


def budget_bucket(max_count: int, *, headroom: float = 1.5,
                  cap: int = 2_097_152, floor: int = 1 << 15) -> int:
    """Smallest {2^k, 1.5·2^k} bucket ≥ headroom·max_count, capped.

    Drivers key their compiled steps on this: every pair-space op (binning
    sort, feature gather, backward segment-sum) costs per STATIC slot
    (~17.6 ns/row for the segment-sum — width/dtype-free,
    scripts/profile_segsum2.py), so the half-octave bucket set trims up to
    33% static overshoot vs pure pow2 at one extra recompile per half
    octave."""
    need = max(int(floor), int(np.ceil(max_count * headroom)))
    k = max(2, (need - 1).bit_length())          # 2^k >= need
    half = 3 << (k - 2)                          # 1.5 * 2^(k-1)
    return min(half if half >= need else (1 << k), cap)


def _unpack_block(fb, packed: bool):
    """(16,W) feature block slice → named f32 rows
    (mx, my, ca, cb, cc, opacity, rgbd(4,W))."""
    if not packed:
        return (fb[0:1, :], fb[1:2, :], fb[2:3, :], fb[3:4, :], fb[4:5, :],
                fb[5:6, :], fb[6:10, :])
    c = lambda i: fb[i:i + 1, :].astype(jnp.float32)
    mx = c(0) + c(1)
    my = c(2) + c(3)
    ca = c(4) + c(5)
    cb = c(6) + c(7)
    cc = c(8) + c(9)
    op = c(10)
    rgbd = jnp.concatenate([c(11), c(12), c(13), c(14) + c(15)], axis=0)
    return (mx, my, ca, cb, cc, op, rgbd)


def _transpose_row(row: jnp.ndarray) -> jnp.ndarray:
    """(1, PIX) lane-major → (PIX, 1) sublane-major inside a kernel.

    out[i,0] = Σₖ I[i,k]·row[0,k]: one (PIX×PIX)·(PIX×1) MXU matvec. Mosaic
    has no direct cross-lane/sublane vector transpose; the identity mask is
    materialized from iotas like the prefix masks."""
    rr = jax.lax.broadcasted_iota(jnp.int32, (PIX, PIX), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (PIX, PIX), 1)
    ident = (rr == cc).astype(jnp.float32)
    return jax.lax.dot_general(ident, row, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _feats_table(proj: ProjectedGaussians, feats_packed: bool) -> jnp.ndarray:
    """(N, 16) per-splat feature table in SPLAT order (unpermuted).

    f32 path: [mx, my, ca, cb, cc, opac, r, g, b, depth, 0×6].
    packed path (beyond the gather working-set cliff, FEATS_PACK_BYTES):
    bf16 hi/lo pairs for means/conic/depth, single bf16 opacity/rgb —
    halves the gather bytes at ≤7.6e-6 rel error (MEASUREMENTS.md)."""
    n = proj.means2d.shape[0]
    if feats_packed:
        def sp(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo
        mxh, mxl = sp(proj.means2d[:, 0])
        myh, myl = sp(proj.means2d[:, 1])
        cah, cal = sp(proj.conic[:, 0])
        cbh, cbl = sp(proj.conic[:, 1])
        cch, ccl = sp(proj.conic[:, 2])
        dh, dl = sp(proj.depth)
        return jnp.stack([
            mxh, mxl, myh, myl, cah, cal, cbh, cbl, cch, ccl,
            proj.opacity.astype(jnp.bfloat16),
            proj.rgb[:, 0].astype(jnp.bfloat16),
            proj.rgb[:, 1].astype(jnp.bfloat16),
            proj.rgb[:, 2].astype(jnp.bfloat16),
            dh, dl,
        ], axis=1)                                      # (N, 16) bf16
    zrow = jnp.zeros((n,))
    return jnp.stack([
        proj.means2d[:, 0], proj.means2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        proj.opacity,
        proj.rgb[:, 0], proj.rgb[:, 1], proj.rgb[:, 2],
        proj.depth,
        zrow, zrow, zrow, zrow, zrow, zrow,
    ], axis=1)                                          # (N, 16) f32


def pack_pairs(
    proj: ProjectedGaussians,
    *,
    tiles_x: int,
    tiles_y: int,
    max_tiles_side: int,
    pair_budget: int,
    feats_packed: "bool | None" = None,
    _force_two_key: bool = False,
) -> PackedPairs:
    """Binning + pair-space feature gather + work-item tables (XLA): CUDA's
    duplicateWithKeys + radix sort + identifyTileRanges.

    TPU-shaped differences from the CUDA stage (each measured; see
    MEASUREMENTS.md "binning decomposition"):
    - one **key-only** int32 sort of (tile ≪ 18 | depth-rank) — no payload
      co-sort: the splat identity lives in the key's rank bits, and all
      downstream consumers (feature gather, backward segment-sum) work in
      depth-rank space, converting to splat order with cheap N-sized gathers;
    - per-tile segment bounds via a vectorized binary search over the sorted
      keys — a scatter-add histogram costs ~30 ms at 2M pairs on TPU;
    - the feature gather is one row-major (N,16)-table gather (per-element
      XLA gather overhead dwarfs bytes: 3 scalar gathers cost 142 ms where
      one 3-wide row gather costs 13 ms).
    """
    means2d, radii, depth = proj.means2d, proj.radii, proj.depth
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y
    side = max_tiles_side
    if feats_packed is None:
        feats_packed = n * FDIM * 4 > FEATS_PACK_BYTES

    x0, y0, x1, y1, alive = _tile_rects(proj, tiles_x=tiles_x, tiles_y=tiles_y)
    n_clipped = jnp.sum((alive & (((x1 - x0) > side) | ((y1 - y0) > side))).astype(jnp.int32))

    order = jnp.argsort(depth)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    if n <= (1 << RANK_BITS) and side <= 15:
        # ---- compact generation, RANK-MAJOR: emit exactly the valid pairs
        # (sorting all N·side² candidate slots costs ~2.6× more at 150K
        # splats / side=6), iterating splats in depth-rank order so that
        # per-pair metadata is a segment-constant broadcast — done with one
        # N-row delta scatter + one (NP,·) cumsum instead of a 2.1M row
        # gather (~13 ms, which would eat the whole sort saving;
        # MEASUREMENTS.md "binning decomposition"). When side ≤ 8 the rect is
        # refined to EXACT per-tile-row ellipse spans (``_row_spans``) packed
        # as (offset, width) nibbles — rows 0-3 in one extra broadcast column,
        # rows 4-5 in meta's free bits when side ≤ 6 (``meta_pack``), else a
        # second column — ~2× fewer pairs at bench scale shrinks every
        # pair-space cost downstream (sort, gather, kernel grids, backward
        # segment-sum). ----
        row_exact = side <= 8
        # meta-packed spans (r4): with side ≤ 6, the rows-4..5 span nibbles
        # fit in meta's free low bits — meta becomes (tile ≪ 16 | ow₄ ≪ 8 |
        # ow₅), which needs num_tiles ≤ 32767 so the tile field stays out of
        # the sign bit. This drops the packB broadcast column entirely: one
        # fewer int32 column through the delta scatter AND the (NP,·) cumsum
        # (~1.2 ms/column at 786K slots; MEASUREMENTS.md).
        meta_pack = row_exact and side <= 6 and num_tiles <= 32767
        tile_base = y0 * tiles_x + x0
        if row_exact:
            row_w, row_o = _row_spans(proj, x0, y0, x1, y1, alive,
                                      tiles_x=tiles_x, side=side)
            area = jnp.sum(row_w, axis=1)
            # deliberate int32 WRAP semantics: packing byte 3 (ow << 24 with
            # ow up to 0x88) may set the sign bit, and the delta-scatter +
            # cumsum reconstruction below is exact mod 2^32 (deltas of
            # negative values borrow and re-carry); extraction uses masked
            # shifts only. Do not "fix" to int64/uint32 — int64 is emulated
            # on TPU and uint32 breaks the shared scatter with the signed
            # meta/base columns.
            ow = (row_o << 4) | row_w                           # (N, side)
            packA = jnp.zeros((n,), jnp.int32)
            for r_ in range(min(side, 4)):
                packA = packA | (ow[:, r_] << (8 * r_))
            if meta_pack:
                meta = tile_base << 16
                if side > 4:
                    meta = meta | (ow[:, 4] << 8)
                if side > 5:
                    meta = meta | ow[:, 5]
                row_cols = [packA]
            else:
                packB = jnp.zeros((n,), jnp.int32)
                for r_ in range(4, side):
                    packB = packB | (ow[:, r_] << (8 * (r_ - 4)))
                meta = tile_base << 8
                row_cols = [packA] + ([packB] if side > 4 else [])
        else:
            w = jnp.minimum(jnp.maximum(x1 - x0, 0), side)
            h = jnp.minimum(jnp.maximum(y1 - y0, 0), side)
            area = jnp.where(alive, w * h, 0)
            meta = (tile_base << 8) | (w << 4)
            row_cols = []

        # ONE consolidated rank permute for ALL per-splat tables — meta,
        # area, span columns AND the 16-wide feature table (riding the same
        # int32 gather via exact bitcasts): row-gather cost is per ROW
        # (~5.5 ns/row, width nearly free; MEASUREMENTS.md "binning
        # decomposition"), so k separate [order] gathers cost k× one wide one.
        feats_tbl = _feats_table(proj, feats_packed)            # (N, 16)
        if feats_packed:
            fi = jax.lax.bitcast_convert_type(
                feats_tbl.reshape(n, 8, 2), jnp.int32)          # (N, 8)
        else:
            fi = jax.lax.bitcast_convert_type(feats_tbl, jnp.int32)
        pre = jnp.concatenate(
            [jnp.stack([meta, area] + row_cols, axis=1), fi], axis=1)
        pre_r = pre[order]                                      # (N, 2+k+16|8)
        n_spancols = len(row_cols)
        if feats_packed:
            feats_rows = jax.lax.bitcast_convert_type(
                pre_r[:, 2 + n_spancols:], jnp.bfloat16).reshape(n, 16)
        else:
            feats_rows = jax.lax.bitcast_convert_type(
                pre_r[:, 2 + n_spancols:], jnp.float32)
        area_r = pre_r[:, 1]
        base_r = (jnp.cumsum(area_r) - area_r).astype(jnp.int32)   # exclusive
        n_valid = base_r[-1] + area_r[-1]
        np_slots = min(pair_budget, n * side * side)

        # segment-constant per-pair values via delta scatter + cumsum:
        # rows = [packed geometry, fused rank/offset, packed row spans].
        # (jnp.repeat measured FASTER in isolation — 4.9 vs 10.1 ms at 786K
        # slots — but ~2 ms SLOWER in context: XLA fuses this cumsum with the
        # per-pair decode below, which repeat's gather lowering breaks.)
        #
        # Fused rank/offset column (r4): the decode needs per-pair rank rk
        # and in-segment index j = p − bs, i.e. TWO segment-constant values
        # (rk, bs). But u = (rk ≪ SH) − bs is itself segment-constant and
        # recovers both from one column: v = u + p → rk = v ≫ SH,
        # j = v & (2^SH−1) — exact because j < area ≤ 2^SH (area ≤ side²) and
        # u ≥ 0 (bs = Σ areas ≤ 2^SH·rk). One fewer int32 column through the
        # scatter AND the (NP,·) cumsum (~1.2 ms/column at 786K slots).
        SH = 7 if row_exact else 8          # area ≤ 64 (side ≤ 8) | ≤ 225
        u = (jnp.arange(n, dtype=jnp.int32) << SH) - base_r
        vals = jnp.concatenate(
            [pre_r[:, :1], u[:, None],
             pre_r[:, 2:2 + n_spancols]], axis=1)               # (N, 2..4)
        delta = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]], axis=0)
        # FLAT broadcast (r4): an (NP, k) axis-0 cumsum pads its k-wide minor
        # dim to 128 lanes (k/128 utilization — scripts/
        # profile_cumsum_broadcast.py measures the column-concatenated flat
        # form ~8× cheaper); scatter all k delta columns into ONE (k·NP,)
        # grid at column offsets and run ONE dense 1-D cumsum, then subtract
        # each column's inherited carry (the flat running sum crosses the
        # column boundary carrying the previous column's final value — a
        # static-index scalar read, exact in int32 wrap arithmetic).
        # Budget-overflow splats (base_r ≥ np_slots, nondecreasing suffix)
        # must NOT spill into the next column's region: clamp their index to
        # the column's last slot and zero the update (equivalent to the old
        # mode="drop", but keeps indices sorted and in-bounds).
        kc = vals.shape[1]
        in_b = base_r < np_slots
        safe = jnp.where(in_b, base_r, np_slots - 1)
        idx = jnp.concatenate([safe + c * np_slots for c in range(kc)])
        upd = jnp.concatenate(
            [jnp.where(in_b, delta[:, c], 0) for c in range(kc)])
        flat = jnp.zeros((kc * np_slots,), jnp.int32).at[idx].add(
            upd, indices_are_sorted=True)
        gf = jnp.cumsum(flat)                                  # (k·NP,)
        # consumers read the 1-D column slices directly (stacking back to
        # (NP, k) would re-materialize the padded layout this avoids)
        g = [gf[:np_slots]] + [
            gf[c * np_slots:(c + 1) * np_slots] - gf[c * np_slots - 1]
            for c in range(1, kc)]
        ms = g[0]

        p_iota = jnp.arange(np_slots, dtype=jnp.int32)
        v = g[1] + p_iota
        rk = v >> SH
        j = v & ((1 << SH) - 1)
        if row_exact:
            # unpack per-row (offset, width) nibbles; find the pair's row by
            # a static prefix ladder (rows with width 0 are skipped), then
            # its in-row column — no integer divide anywhere
            pa = g[2]
            if meta_pack:
                # rows 4 (bits 8-15) and 5 (bits 0-7) live in meta
                w_r = [(pa >> (8 * r_)) & 0xF if r_ < 4 else
                       (ms >> (8 if r_ == 4 else 0)) & 0xF
                       for r_ in range(side)]
                o_r = [(pa >> (8 * r_ + 4)) & 0xF if r_ < 4 else
                       (ms >> (12 if r_ == 4 else 4)) & 0xF
                       for r_ in range(side)]
            else:
                pb = g[3] if side > 4 else None
                w_r = [((pa >> (8 * r_)) if r_ < 4 else (pb >> (8 * (r_ - 4))))
                       & 0xF for r_ in range(side)]
                o_r = [((pa >> (8 * r_ + 4)) if r_ < 4
                        else (pb >> (8 * (r_ - 4) + 4))) & 0xF
                       for r_ in range(side)]
            pref = [jnp.zeros_like(j)]
            for r_ in range(side):
                pref.append(pref[-1] + w_r[r_])
            jy = jnp.zeros_like(j)
            for r_ in range(1, side):
                jy += (j >= pref[r_]).astype(jnp.int32)
            row_start = pref[0]
            row_off = o_r[0]
            for r_ in range(1, side):
                sel = jy == r_
                row_start = jnp.where(sel, pref[r_], row_start)
                row_off = jnp.where(sel, o_r[r_], row_off)
            tile = (ms >> (16 if meta_pack else 8)) \
                + jy * tiles_x + row_off + (j - row_start)
        else:
            # in-rect coords without an integer divide: jy = j // w via a
            # side-step comparison ladder (w <= side, small constant)
            ws = (ms >> 4) & 0xF
            jy = jnp.zeros_like(j)
            for k in range(1, side):
                jy += (j >= k * ws).astype(jnp.int32)
            jx = j - jy * ws
            tile = (ms >> 8) + jy * tiles_x + jx

        # junk slots (p >= n_valid) sort to the very end in BOTH tile-major
        # (tile = num_tiles) and rank-major (rank bits = RANK_MASK) order
        p_valid = p_iota < n_valid
        if num_tiles < (1 << (31 - RANK_BITS)) and not _force_two_key:
            # fused single int32 key: one key-only sort, splat identity in the
            # rank bits (the fast path for every standard resolution)
            key = jnp.where(p_valid, (tile << RANK_BITS) | rk,
                            (num_tiles << RANK_BITS) | RANK_MASK)
            sorted_key = jax.lax.sort(key)
            sorted_rank = sorted_key & RANK_MASK
            bound_q = (jnp.arange(num_tiles + 1, dtype=jnp.int32) << RANK_BITS)
            bounds = _lower_bound(sorted_key, bound_q)
        else:
            # HQ resolutions (e.g. the reference's 3004×4092 → 48K tiles,
            # inference.py:444-445): (tile ≪ 18 | rank) no longer fits int32,
            # so lexicographically co-sort (tile, rank) as two int32 keys —
            # ~2× the key-only sort cost, still over exactly the compact
            # pairs (the N·side²-slot fallback below would cost far more)
            tile_j = jnp.where(p_valid, tile, num_tiles)
            rk_j = jnp.where(p_valid, rk, jnp.int32(0x7FFFFFFF))
            sorted_tile, sorted_rank = jax.lax.sort(
                (tile_j, rk_j), num_keys=2)
            bounds = _lower_bound(
                sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32))
    else:
        off = jnp.arange(side * side, dtype=jnp.int32)
        tx = x0[:, None] + (off % side)[None, :]
        ty = y0[:, None] + (off // side)[None, :]
        pair_valid = alive[:, None] & (tx < x1[:, None]) & (ty < y1[:, None])
        tile_id = jnp.where(pair_valid, ty * tiles_x + tx, num_tiles)
        sorted_tile, sorted_rank, _ = jax.lax.sort(
            (tile_id.reshape(-1), jnp.broadcast_to(rank[:, None], tile_id.shape).reshape(-1),
             jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], tile_id.shape).reshape(-1)),
            num_keys=2,
        )
        n_valid = _lower_bound(
            sorted_tile, jnp.full((1,), num_tiles, jnp.int32))[0]
        sorted_tile = sorted_tile[:pair_budget]
        sorted_rank = sorted_rank[:pair_budget]
        bounds = _lower_bound(sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32))
        feats_rows = _feats_table(proj, feats_packed)[order]   # (N,16) rank order
    counts = bounds[1:] - bounds[:-1]
    starts = bounds[:-1]

    # ---- work-item tables (pair-space chunks; a boundary chunk appears once
    # per overlapping tile with complementary lane masks) ----
    ends = starts + counts
    n_items = jnp.where(counts > 0, (ends - 1) // CHUNK - starts // CHUNK + 1, 0)
    item_starts = (jnp.cumsum(n_items) - n_items).astype(jnp.int32)
    np_real = sorted_rank.shape[0]                        # = min(budget, N·side²)
    n_blocks = -(-np_real // CHUNK) + 1                   # + guard block
    w_cap = np_real // CHUNK + num_tiles
    boundary = jnp.zeros((w_cap,), jnp.int32).at[item_starts].add(1)
    tile_of_item = jnp.clip(jnp.cumsum(boundary).astype(jnp.int32) - 1, 0, num_tiles - 1)
    k_of_item = jnp.arange(w_cap, dtype=jnp.int32) - item_starts[tile_of_item]
    chunk_of_item = starts[tile_of_item] // CHUNK + k_of_item
    # trailing padding items are routed to the GUARD tile (index num_tiles:
    # count 0, its own output block) so they skip all compute — pointing them
    # at a real tile would run the full body with empty masks (~4 ms at 1080p)
    total_items = item_starts[-1] + n_items[-1]
    idx_w = jnp.arange(w_cap, dtype=jnp.int32)
    item_valid = idx_w < total_items
    chunk_of_item = jnp.where(item_valid,
                              jnp.clip(chunk_of_item, 0, n_blocks - 1),
                              n_blocks - 1)
    tile_of_item = jnp.where(item_valid, tile_of_item, num_tiles)
    k_of_item = jnp.where(item_valid, k_of_item, idx_w - total_items)

    # ---- pair-space feature gather: feats_rows is the (N,16) table already
    # permuted into depth-rank order (on the compact path it rode the
    # consolidated permute above), so the big gather indexes by the key's
    # rank bits directly — no splat-id recovery gather needed.
    # junk ranks (RANK_MASK) MUST clamp, not NaN-fill (jnp.take's default):
    # the kernel masks junk lanes to zero contribution, but 0 × NaN = NaN
    # inside the accumulation matmuls ----
    feats_t = jnp.take(feats_rows, sorted_rank, axis=0, mode="clip").T
    # pad to exactly n_blocks·CHUNK columns: the last block is a zero guard
    feats_t = jnp.pad(feats_t, ((0, 0), (0, n_blocks * CHUNK - np_real)))

    return PackedPairs(
        feats_t,
        jnp.concatenate([starts, jnp.zeros((1,), jnp.int32)]),
        jnp.concatenate([counts, jnp.zeros((1,), jnp.int32)]),
        chunk_of_item, tile_of_item, k_of_item, sorted_rank, rank, n_valid,
        n_clipped, total_items)


def _composite_kernel(
    # scalar prefetch
    chunk_ref, tile_ref, k_ref, starts_ref, counts_ref, tiles_x_ref,
    # inputs (auto-pipelined (16, CHUNK) block of this item's chunk)
    chunk_in,
    # outputs (block revisited while consecutive items share a tile)
    out_ref,            # (1, 8, 256) VMEM — CHANNELS on sublanes, pixels on
                        # lanes: the (…,8) minor dim would pad to 128 lanes in
                        # HBM (16× traffic on every kernel write and every
                        # downstream pass); (8,256) tiles exactly
    # scratch
    t_ref,              # (256, 1) VMEM transmittance carry
    *,
    mxu_bf16: bool = False,
    feats_packed: bool = False,
):
    i = pl.program_id(0)
    tiles_x = tiles_x_ref[0]
    tile = jax.lax.rem(tile_ref[i], tiles_x_ref[1])  # pixel-space tile in cam
    k = k_ref[i]
    start = starts_ref[tile_ref[i]]
    count = counts_ref[tile_ref[i]]
    chunk = chunk_ref[i]

    @pl.when(k == 0)
    def _():
        # zero init is also correct for empty tiles: premult color/alpha 0 and
        # log T_final = 0 (T=1)
        out_ref[0] = jnp.zeros((8, PIX), jnp.float32)
        t_ref[:] = jnp.zeros((PIX, 1), jnp.float32)   # log-transmittance

    # empty tiles skip everything after the k==0 init (their output is zeros
    # and log T_final = 0 already); the input DMA still streams, pipelined
    @pl.when(count > 0)
    def _():
        ox = (jax.lax.rem(tile, tiles_x) * TILE_W).astype(jnp.float32)
        oy = (jax.lax.div(tile, tiles_x) * TILE_H).astype(jnp.float32)
        p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
        px = ox + jax.lax.rem(p, TILE_W).astype(jnp.float32)    # (PIX,1)
        py = oy + jax.lax.div(p, TILE_W).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)

        f = chunk_in[:]                                     # (16,CHUNK)
        logt_in0 = t_ref[:]

        # skip the whole body once every pixel is saturated: later pairs have
        # gate=0 (zero contribution AND zero gradient), so the item is pure
        # overhead. Row 5 then keeps the log-transmittance at the LIVE
        # boundary (it accumulates Σ log1ma over live pairs only — exactly
        # the state the backward restarts from) and row 7 keeps the live
        # item count, which the backward uses to drop dead items from its
        # grid entirely (the CUDA backward's n_contrib walk-back,
        # reference cuda_rasterizer/backward.cu via
        # gaussian_renderer/__init__.py:16's extension)
        @pl.when(jnp.max(logt_in0) >= LOG_T_EPS)
        def _():
            rr = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
            u_excl = (rr < cc).astype(jnp.float32)   # M[j,i]=1 iff j<i
            ones_r = jnp.ones((1, SUB), jnp.float32)
            logt_in = logt_in0
            for b in range(CHUNK // SUB):
                fb = f[:, b * SUB:(b + 1) * SUB]
                mx, my, ca, cb, cc, op, rgbd = _unpack_block(fb, feats_packed)
                dx = mx - px                                # (256,SUB)
                dy = my - py
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                pair_idx = chunk * CHUNK + b * SUB + lane   # global pair ids
                valid = (pair_idx >= start) & (pair_idx < start + count)
                ok = valid & (power <= 0.0) & (alpha >= ALPHA_EPS)
                alpha = jnp.where(ok, alpha, 0.0)
                log1ma = jnp.log1p(-alpha)

                prefix = _mm(
                    log1ma, u_excl, (((1,), (0,)), ((), ())), mxu_bf16
                )                                           # (256,SUB) exclusive
                logt = logt_in + prefix
                t = jnp.exp(logt)
                contrib = jnp.where(t >= T_EPS, alpha * t, 0.0)

                # channel-major accumulation: (4,SUB)·(256,SUB)ᵀ and two
                # MXU matvecs put pixels on LANES of the output rows
                acc4 = _mm(
                    rgbd, contrib, (((1,), (1,)), ((), ())), mxu_bf16
                )                                           # (4,256)
                out_ref[0, 0:4, :] = out_ref[0, 0:4, :] + acc4
                out_ref[0, 4:5, :] = out_ref[0, 4:5, :] + _mm(
                    ones_r, contrib, (((1,), (1,)), ((), ())), mxu_bf16)
                # log-T row stays f32: the backward reconstructs T from it
                out_ref[0, 5:6, :] = out_ref[0, 5:6, :] + jax.lax.dot_general(
                    ones_r, log1ma, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                logt_in = logt_in + jnp.sum(log1ma, axis=1, keepdims=True)
            t_ref[:] = logt_in
            # live item count (monotone overwrite: the last live item wins);
            # f32 is exact for any plausible per-tile item count
            out_ref[0, 7:8, :] = (jnp.zeros((1, PIX), jnp.float32)
                                  + (k + 1).astype(jnp.float32))


def composite_tiles_pallas(
    pairs: PackedPairs,
    *,
    tiles_x: int,
    tiles_y: int,
    interpret: bool = False,
    mxu_bf16: bool = False,
) -> jnp.ndarray:
    """Run the kernel over the work-item list. Returns (T+1, 8, 256): rows 0-2
    premult color, 3 depth, 4 alpha, 5 log T at the live boundary (the
    backward's restart state), 7 live item count (channel-major — see the
    kernel's out_ref layout note); the last tile is the padding-item guard
    (all zeros) — callers slice ``[:T]``. PROFILE-ONLY single-camera wrapper:
    production uses the flat path."""
    num_tiles = tiles_x * tiles_y
    w = pairs.chunk_of_item.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(w,),
        in_specs=[pl.BlockSpec((FDIM, CHUNK), lambda i, ch, tl, kk, st, cn, tx: (0, ch[i]),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PIX), lambda i, ch, tl, kk, st, cn, tx: (tl[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PIX, 1), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_composite_kernel, mxu_bf16=mxu_bf16,
                          feats_packed=pairs.feats_t.dtype == jnp.bfloat16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, 8, PIX), jnp.float32),
        interpret=interpret,
    )(pairs.chunk_of_item, pairs.tile_of_item, pairs.k_of_item,
      pairs.starts, pairs.counts,
      jnp.array([tiles_x, num_tiles], jnp.int32), pairs.feats_t)
    # empty tiles emit no work items (their blocks are uninitialized garbage)
    return jnp.where((pairs.counts > 0)[:, None, None], out, 0.0)


def _untile(flat: jnp.ndarray, tiles_x: int, tiles_y: int, h: int, w: int) -> jnp.ndarray:
    """(T, C, 256) -> (C, H, W); pixel p of a tile is (y=p//16, x=p%16).

    Channel-major tiles keep every reshape/transpose buffer's minor dim a
    multiple of the 128-lane vreg width (a (…,C) minor dim pads C→128)."""
    c = flat.shape[1]
    x = flat.reshape(tiles_y, tiles_x, c, TILE_H, TILE_W)
    x = x.transpose(2, 0, 3, 1, 4).reshape(c, tiles_y * TILE_H, tiles_x * TILE_W)
    return x[:, :h, :w]


def _tile_img(img: jnp.ndarray, tiles_x: int, tiles_y: int) -> jnp.ndarray:
    """(C, H, W) -> (T, C, 256): inverse of _untile (pads to tile multiples)."""
    c, h, w = img.shape
    x = jnp.pad(img, ((0, 0), (0, tiles_y * TILE_H - h), (0, tiles_x * TILE_W - w)))
    x = x.reshape(c, tiles_y, TILE_H, tiles_x, TILE_W)
    return x.transpose(1, 3, 0, 2, 4).reshape(tiles_y * tiles_x, c, PIX)


# ---------------------------------------------------------------------------
# backward kernel: back-to-front re-traversal with suffix sums (the analytic
# gradient structure of the CUDA renderCUDA backward, as parallel prefix ops)
# ---------------------------------------------------------------------------

def _backward_kernel(
    # scalar prefetch (all in REVERSED item order)
    rchunk_ref, rtile_ref, rk_ref, first_chunk_visit_ref,
    starts_ref, counts_ref, tiles_x_ref,
    # inputs
    chunk_in,           # (16, CHUNK) feature block at rchunk[i]
    cot_in,             # (1, 8, 256) channel-major cotangent block at
                        # rtile[i]: rows 0-2 ĝcolor, 3 ĝdepth, 4 ĝalpha',
                        # 5 log T at the live boundary (the forward's row 5)
    # outputs
    grad_ref,           # (16, CHUNK) pair-gradient block at rchunk[i]
    # scratch
    t_ref,              # (256,1) transmittance, reconstructed back-to-front
    s_ref,              # (256,1) suffix Σ_{j>i} G_j w_j
    *,
    mxu_bf16: bool = False,
    feats_packed: bool = False,
):
    i = pl.program_id(0)
    tiles_x = tiles_x_ref[0]
    tile = jax.lax.rem(rtile_ref[i], tiles_x_ref[1])  # pixel-space tile in cam
    rk = rk_ref[i]
    start = starts_ref[rtile_ref[i]]
    count = counts_ref[rtile_ref[i]]
    chunk = rchunk_ref[i]

    cot = cot_in[0]                       # (8, 256) channel-major

    @pl.when(rk == 0)                     # tile's LAST live item (reverse order)
    def _():
        # boundary log T from the forward pass: lane-major (1,256) row 5 →
        # sublane-major (256,1) via an MXU identity matvec (Mosaic has no
        # cheap vector transpose; I·vᵀ is one trivial 256×256×1 matmul)
        t_ref[:] = _transpose_row(cot[5:6, :])
        s_ref[:] = jnp.zeros((PIX, 1), jnp.float32)

    @pl.when(first_chunk_visit_ref[i] == 1)
    def _():
        grad_ref[:] = jnp.zeros((FDIM, CHUNK), jnp.float32)

    @pl.when(count == 0)
    def _():
        pass  # empty tiles: grad block already zeroed on first visit

    @pl.when(count > 0)
    def _():
        add, _ = _backward_body(tile, chunk, start, count, tiles_x, chunk_in,
                                cot, t_ref, s_ref, mxu_bf16=mxu_bf16,
                                feats_packed=feats_packed)
        grad_ref[:] = grad_ref[:] + add


def _backward_body(tile, chunk, start, count, tiles_x, chunk_in, cot,
                   t_ref, s_ref, *, mxu_bf16: bool = False,
                   feats_packed: bool = False):
    ox = (jax.lax.rem(tile, tiles_x) * TILE_W).astype(jnp.float32)
    oy = (jax.lax.div(tile, tiles_x) * TILE_H).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = ox + jax.lax.rem(p, TILE_W).astype(jnp.float32)
    py = oy + jax.lax.div(p, TILE_W).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)

    f = chunk_in[:]
    rr = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    u_suf_incl = (rr >= cc).astype(jnp.float32)   # M[j,i]=1 iff j>=i
    u_suf_excl = (rr > cc).astype(jnp.float32)    # M[j,i]=1 iff j>i

    t_carry = t_ref[:]                            # log T after this chunk
    s_carry = s_ref[:]                            # Σ_{j>chunk} G_j w_j
    cot_a = _transpose_row(cot[4:5, :])           # ĝalpha' → (256,1)

    # (6, PIX) pixel-moment basis [1, x, y, x², xy, y²] in TILE-LOCAL
    # coordinates (lane-major, straight from iota). All six per-pair pixel
    # reductions below collapse into ONE basis @ d_pow MXU matmul because
    # dx = m − px separates per (pixel, pair); tile-local coords keep the
    # per-pair recombination conditioned (globally, px² ~ 3.7e6 would eat
    # ~4 of f32's 7 digits in the m²S0 − 2mSx + Sxx cancellation; locally
    # the cancelled terms stay within ~4× of the result).
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    bx = jax.lax.rem(pos, TILE_W).astype(jnp.float32)
    by = jax.lax.div(pos, TILE_W).astype(jnp.float32)
    basis = jnp.concatenate(
        [jnp.ones((1, PIX), jnp.float32), bx, by, bx * bx, bx * by, by * by],
        axis=0)                                   # (6, PIX)
    adds = [None] * (CHUNK // SUB)
    # sub-blocks processed back-to-front (the chunk is depth-ascending)
    for b in reversed(range(CHUNK // SUB)):
        fb = f[:, b * SUB:(b + 1) * SUB]
        mxr, myr, car, cbr, ccr, opr, rgbd = _unpack_block(fb, feats_packed)
        pair_idx = chunk * CHUNK + b * SUB + lane
        valid = (pair_idx >= start) & (pair_idx < start + count)

        # recompute forward quantities for this sub-block
        dx = mxr - px
        dy = myr - py
        power = -0.5 * (car * dx * dx + ccr * dy * dy) - cbr * dx * dy
        ep = jnp.exp(power)
        raw = opr * ep
        capped = raw > ALPHA_MAX
        alpha = jnp.minimum(ALPHA_MAX, raw)
        ok = valid & (power <= 0.0) & (alpha >= ALPHA_EPS)
        alpha = jnp.where(ok, alpha, 0.0)
        log1ma = jnp.log1p(-alpha)

        # log T before pair i = log T_after − Σ_{j>=i, in block} log(1-α_j)
        # (log space: the positive exponent would overflow f32 through
        # saturated regions where Σ log1ma ≈ −600)
        suf_incl = _mm(
            log1ma, u_suf_incl, (((1,), (0,)), ((), ())), mxu_bf16)
        logt_i = t_carry - suf_incl               # (256,SUB)
        t_i = jnp.exp(logt_i)
        gate = (t_i >= T_EPS).astype(jnp.float32)

        # sensitivity to the blend weight w_i: G = ĝC·c + ĝD·d + ĝA
        g_sens = jax.lax.dot_general(
            cot[0:4, :], rgbd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ) + cot_a                                 # (256,SUB)

        w = gate * alpha * t_i
        gw = g_sens * w

        suf_gw = _mm(
            gw, u_suf_excl, (((1,), (0,)), ((), ())), mxu_bf16)
        s_i = s_carry + suf_gw                    # Σ_{j>i} G_j w_j

        d_alpha = gate * t_i * g_sens - s_i / (1.0 - alpha)
        d_alpha = jnp.where(ok, d_alpha, 0.0)
        d_alpha_un = jnp.where(capped, 0.0, d_alpha)  # min(0.99,·) gate
        d_pow = d_alpha_un * alpha                # dα/dpower = α (uncapped)

        # ---- per-pair reductions over pixels: ONE MXU matmul of the fixed
        # pixel-moment basis against d_pow (d_pow is exactly zero at every
        # ¬ok / capped pixel, so no per-pixel masking of dx/dy is needed):
        #   Σ d_pow·dx   = m_x·S0 − Sx
        #   Σ d_pow·dx²  = m_x²·S0 − 2m_x·Sx + Sxx          (etc.)
        #   Σ d_α'·ep    = S0 / opacity  (α = op·ep uncapped; capped pixels
        #                                 have d_alpha_un = 0 ⇒ zero in S0)
        # Culled splats carry non-finite projected means (w→0 division) —
        # sanitize PER PAIR (their d_pow column is all zero). ----
        # HIGHEST: default TPU dot precision rounds inputs to bf16 (single
        # MXU pass); the quadratic basis rows (values up to 31²) lose ~3
        # digits there and the scales grad degrades to 3.5e-2 vs the tiled
        # oracle (measured). Full-f32 passes on a (6,PIX)@(PIX,SUB) matmul
        # are ~1 MFLOP — free — and restore ≤0.5% agreement.
        mom = jax.lax.dot_general(basis, d_pow, (((1,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
        s0, sx, sy = mom[0:1, :], mom[1:2, :], mom[2:3, :]
        sxx, sxy, syy = mom[3:4, :], mom[4:5, :], mom[5:6, :]
        mxl = jnp.where(jnp.isfinite(mxr), mxr, 0.0) - ox   # (1,SUB) local
        myl = jnp.where(jnp.isfinite(myr), myr, 0.0) - oy
        e_x = mxl * s0 - sx
        e_y = myl * s0 - sy
        e_xx = mxl * mxl * s0 - 2.0 * mxl * sx + sxx
        e_xy = mxl * myl * s0 - mxl * sy - myl * sx + sxy
        e_yy = myl * myl * s0 - 2.0 * myl * sy + syy
        dmx = -(car * e_x + cbr * e_y)
        dmy = -(ccr * e_y + cbr * e_x)
        dca = -0.5 * e_xx
        dcb = -e_xy
        dcc_ = -0.5 * e_yy
        dop = jnp.where(opr > 0.0, s0 / jnp.where(opr > 0.0, opr, 1.0), 0.0)
        grads4 = _mm(
            cot[0:4, :], w, (((1,), (0,)), ((), ())), mxu_bf16
        )                                         # (4,SUB): dr,dg,db,dd

        adds[b] = jnp.concatenate([
            dmx, dmy, dca, dcb, dcc_, dop, grads4,
            jnp.zeros((6, SUB), jnp.float32)], axis=0)

        # carries for the next (earlier) sub-block
        s_carry = s_carry + jnp.sum(gw, axis=1, keepdims=True)
        t_carry = t_carry - jnp.sum(log1ma, axis=1, keepdims=True)

    s_ref[:] = s_carry
    t_ref[:] = t_carry
    return jnp.concatenate(adds, axis=1), None


def _backward_tiles_pallas_profile(pairs: PackedPairs, cot_tiles: jnp.ndarray, *,
                                   tiles_x: int, tiles_y: int,
                                   interpret: bool = False,
                                   mxu_bf16: bool = False) -> jnp.ndarray:
    """PROFILE-ONLY single-camera wrapper: runs the backward kernel over the
    FULL reversed item list (no live filtering — dead items' grads are WRONG
    under the live-boundary row-5 semantics: the grid walks all items and
    reconstructs inflated T for items the forward never composited).
    Production uses ``backward_tiles_flat``, whose grid keeps live items
    only; the leading underscore + name keep this path out of reach of
    non-profiling callers (ADVICE r3).

    cot_tiles: (T, 8, 256) channel-major with rows 0-2 ĝcolor, 3 ĝdepth,
    4 ĝalpha', 5 log T at the live boundary. Returns pair gradients
    (16, NP+CHUNK) with rows [dmx,dmy,dA,dB,dC,dopacity,dr,dg,db,ddepth, 0...].
    """
    num_tiles = tiles_x * tiles_y
    w = pairs.chunk_of_item.shape[0]

    rchunk = pairs.chunk_of_item[::-1]
    rtile = pairs.tile_of_item[::-1]
    # reverse-local index within the tile: 0 = the tile's LAST forward item
    n_items_of_tile = jnp.zeros((num_tiles + 1,), jnp.int32).at[pairs.tile_of_item].add(1)
    rk = n_items_of_tile[rtile] - 1 - pairs.k_of_item[::-1]
    first_visit = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (rchunk[1:] != rchunk[:-1]).astype(jnp.int32)])

    in_specs = [
        pl.BlockSpec((FDIM, CHUNK), lambda i, rc, rt, rkk, fv, st, cn, tx: (0, rc[i]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, PIX), lambda i, rc, rt, rkk, fv, st, cn, tx: (rt[i], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((PIX, 1), jnp.float32), pltpu.VMEM((PIX, 1), jnp.float32)]
    kernel = functools.partial(_backward_kernel, mxu_bf16=mxu_bf16,
                               feats_packed=pairs.feats_t.dtype == jnp.bfloat16)
    out_shape = pairs.feats_t.shape
    out_specs = pl.BlockSpec(
        (FDIM, CHUNK), lambda i, rc, rt, rkk, fv, st, cn, tx: (0, rc[i]),
        memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(w,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=interpret,
    )(rchunk, rtile, rk, first_visit,
      pairs.starts, pairs.counts,
      jnp.array([tiles_x, num_tiles], jnp.int32), pairs.feats_t, cot_tiles)


def flatten_packed(pks: "list[PackedPairs]", *, num_tiles: int) -> "FlatPairs":
    """Flatten per-camera PackedPairs (a PYTHON list — ``pack_pairs`` must
    not be vmapped: the batching rules for its sort/gather/scatter ops lower
    ~2× slower even at batch 1, measured 47.7 vs 24.8 ms at 150K splats) into
    ONE global pair space + work-item list.

    TPU-shaped rationale: the Pallas grid executes serially, and a no-op grid
    step costs ~0.8 µs (MEASUREMENTS.md "per-item overhead") — so the win is
    running ONE kernel whose **dynamic grid** is exactly the number of real
    (tile, chunk) overlaps across all cameras, instead of per-camera static
    grids padded with empty-tile and guard items (the CUDA analogue launches
    exactly numRendered threads; SURVEY §2.5 row 1).

    Global ids: tile ← cam·T + tile, chunk ← cam·NB + chunk, pair ←
    cam·NB·CHUNK + pair; cameras are CHUNK-aligned so no chunk spans two.
    """
    C = len(pks)
    nbw = pks[0].feats_t.shape[1]
    nb = nbw // CHUNK
    # NOT jnp.concatenate: XLA TPU lowers a big concat as pad+select+maximum
    # chains over the full output (6×73 MB fusions at 4 cams); per-camera
    # dynamic_update_slice writes just the bytes once
    if C == 1:
        feats = pks[0].feats_t
    else:
        feats = jnp.zeros((FDIM, C * nbw), pks[0].feats_t.dtype)
        for c, pk in enumerate(pks):
            feats = jax.lax.dynamic_update_slice(feats, pk.feats_t, (0, c * nbw))
    starts_g = jnp.concatenate(
        [pk.starts[:-1] + c * nbw for c, pk in enumerate(pks)]
        + [jnp.zeros((1,), jnp.int32)])
    counts_g = jnp.concatenate([pk.counts[:-1] for pk in pks]
                               + [jnp.zeros((1,), jnp.int32)])

    # compact the per-camera item tables: global item g belongs to camera
    # cam(g) with local index g − off[cam]; entries beyond the real total are
    # routed to the global guard tile (never executed — the grid is exact)
    w = pks[0].chunk_of_item.shape[0]
    tot = jnp.stack([pk.n_items_total for pk in pks])
    off = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), jnp.cumsum(tot).astype(jnp.int32)])
    g = jnp.arange(C * w, dtype=jnp.int32)
    valid = g < off[C]
    if C == 1:
        chunk_g = jnp.where(valid, pks[0].chunk_of_item, nb - 1)
        tile_g = jnp.where(valid, pks[0].tile_of_item, num_tiles)
        k_g = jnp.where(valid, pks[0].k_of_item, 0)
    else:
        cam = jnp.clip(
            jnp.searchsorted(off, g, side="right").astype(jnp.int32) - 1,
            0, C - 1)
        local = jnp.where(valid, g - off[cam], 0)
        chunk_t = jnp.stack([pk.chunk_of_item for pk in pks])
        tile_t = jnp.stack([pk.tile_of_item for pk in pks])
        k_t = jnp.stack([pk.k_of_item for pk in pks])
        chunk_g = jnp.where(valid, chunk_t[cam, local] + cam * nb, C * nb - 1)
        tile_g = jnp.where(valid, tile_t[cam, local] + cam * num_tiles,
                           C * num_tiles)
        k_g = jnp.where(valid, k_t[cam, local], 0)
    return FlatPairs(
        feats, starts_g, counts_g, chunk_g, tile_g, k_g, off[C],
        jnp.stack([pk.sorted_rank for pk in pks]),
        jnp.stack([pk.rank for pk in pks]),
        jnp.stack([pk.n_valid for pk in pks]),
        jnp.stack([pk.n_clipped for pk in pks]))


class FlatPairs(NamedTuple):
    feats_t: jnp.ndarray        # (16, C·NB·CHUNK) flattened pair space
    starts: jnp.ndarray         # (C·T+1,) global pair-space segment starts
    counts: jnp.ndarray         # (C·T+1,) (+ guard 0)
    chunk_of_item: jnp.ndarray  # (C·W,) global input block per item
    tile_of_item: jnp.ndarray   # (C·W,) global tile per item (guard = C·T)
    k_of_item: jnp.ndarray      # (C·W,)
    n_items: jnp.ndarray        # () int32 traced: the DYNAMIC grid bound
    sorted_rank: jnp.ndarray    # (C, NP) per-camera depth ranks
    rank: jnp.ndarray           # (C, N)
    n_valid: jnp.ndarray        # (C,)
    n_clipped: jnp.ndarray      # (C,)


def composite_tiles_flat(flat: FlatPairs, *, tiles_x: int, tiles_y: int,
                         n_cams: int, interpret: bool = False,
                         mxu_bf16: bool = False) -> jnp.ndarray:
    """Forward kernel over the flattened item list with a grid of EXACTLY
    ``flat.n_items`` steps (dynamic grid). Returns (C·T+1, 8, 256)
    channel-major with empty
    tiles masked to zero (their blocks are never visited)."""
    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(jnp.maximum(flat.n_items, 1),),
        in_specs=[pl.BlockSpec((FDIM, CHUNK), lambda i, ch, tl, kk, st, cn, tx: (0, ch[i]),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PIX), lambda i, ch, tl, kk, st, cn, tx: (tl[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PIX, 1), jnp.float32)],
    )
    # NOTE an io-aliased zeros input (so unvisited blocks stay zero without a
    # mask) was tried and measured SLOWER: the extra aliased input block adds
    # ~+4.4 ms to the kernel at s2 scale (breaks block pipelining). The
    # where() mask is the cheaper way to zero empty tiles.
    out = pl.pallas_call(
        functools.partial(_composite_kernel, mxu_bf16=mxu_bf16,
                          feats_packed=flat.feats_t.dtype == jnp.bfloat16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_cams * num_tiles + 1, 8, PIX), jnp.float32),
        interpret=interpret,
    )(flat.chunk_of_item, flat.tile_of_item, flat.k_of_item,
      flat.starts, flat.counts, jnp.array([tiles_x, num_tiles], jnp.int32),
      flat.feats_t)
    return jnp.where((flat.counts > 0)[:, None, None], out, 0.0)


def backward_tiles_flat(flat: FlatPairs, cot_tiles: jnp.ndarray,
                        live_k: jnp.ndarray, *,
                        tiles_x: int, tiles_y: int, n_cams: int,
                        interpret: bool = False,
                        mxu_bf16: bool = False):
    """Backward kernel over the REVERSED, LIVE-FILTERED item list.

    The forward early-exits a tile once every pixel saturates; all later
    pairs have gate=0 — exactly zero gradient — so the backward's grid keeps
    only the ``live_k[tile]`` items the forward actually composited (the
    CUDA backward's per-pixel n_contrib walk-back, at item granularity).
    A tile's live items are a prefix of its items because log T only
    decreases. ``cot_tiles``: (C·T+1, 8, 256) channel-major, rows 0-2
    ĝcolor, 3 ĝdepth, 4 ĝalpha', 5 log T at the live boundary (the forward's
    row 5). Returns (pair gradients (16, C·NB·CHUNK), visited (C·NB,) bool) —
    grad blocks no live item visited are UNINITIALIZED; the reduction must
    drop pairs in unvisited blocks."""
    num_tiles = tiles_x * tiles_y
    cw = flat.chunk_of_item.shape[0]
    pos = jnp.arange(cw, dtype=jnp.int32)
    live = (flat.k_of_item < live_k[flat.tile_of_item]) & (pos < flat.n_items)
    n_live = jnp.sum(live.astype(jnp.int32))
    # compact live items to the front, preserving forward order (stable), so
    # items that share a boundary chunk stay ADJACENT (the output-block
    # revisit invariant); then index reversed about the dynamic total
    order = jnp.argsort(jnp.logical_not(live), stable=True).astype(jnp.int32)
    ridx = order[jnp.clip(n_live - 1 - pos, 0, cw - 1)]
    rchunk = flat.chunk_of_item[ridx]
    rtile = flat.tile_of_item[ridx]
    # reverse-local index among the tile's LIVE items (prefix of its items)
    rk = live_k[rtile] - 1 - flat.k_of_item[ridx]
    first_visit = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (rchunk[1:] != rchunk[:-1]).astype(jnp.int32)])
    nb = flat.feats_t.shape[1] // CHUNK
    visited = jnp.zeros((nb,), jnp.int32).at[flat.chunk_of_item].max(
        live.astype(jnp.int32)).astype(jnp.bool_)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(jnp.maximum(n_live, 1),),
        in_specs=[
            pl.BlockSpec((FDIM, CHUNK), lambda i, rc, rt, rkk, fv, st, cn, tx: (0, rc[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, PIX), lambda i, rc, rt, rkk, fv, st, cn, tx: (rt[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FDIM, CHUNK), lambda i, rc, rt, rkk, fv, st, cn, tx: (0, rc[i]),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PIX, 1), jnp.float32),
                        pltpu.VMEM((PIX, 1), jnp.float32)],
    )
    grads = pl.pallas_call(
        functools.partial(_backward_kernel, mxu_bf16=mxu_bf16,
                          feats_packed=flat.feats_t.dtype == jnp.bfloat16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(flat.feats_t.shape, jnp.float32),
        interpret=interpret,
    )(rchunk, rtile, rk, first_visit,
      flat.starts, flat.counts,
      jnp.array([tiles_x, num_tiles], jnp.int32), flat.feats_t, cot_tiles)
    return grads, visited


def _pack_and_flatten(projs, *, tiles_x, tiles_y, max_tiles_side, pair_budget,
                      feats_packed=None):
    # UNROLLED camera loop — never vmap pack_pairs (see flatten_packed doc)
    n_cams = projs.means2d.shape[0]
    pks = [pack_pairs(
        jax.tree_util.tree_map(lambda x: x[c], projs),
        tiles_x=tiles_x, tiles_y=tiles_y, max_tiles_side=max_tiles_side,
        pair_budget=pair_budget, feats_packed=feats_packed) for c in range(n_cams)]
    return flatten_packed(pks, num_tiles=tiles_x * tiles_y)


def _flat_images(out, bg, *, tiles_x, tiles_y, n_cams, image_height,
                 image_width):
    per_cam = out[:n_cams * tiles_x * tiles_y].reshape(
        n_cams, tiles_x * tiles_y, 8, PIX)
    img5 = jax.vmap(lambda o: _untile(
        o[:, 0:5, :], tiles_x, tiles_y, image_height, image_width))(per_cam)
    color, depth, alpha = img5[:, 0:3], img5[:, 3:4], img5[:, 4:5]
    image = color + (1.0 - alpha) * bg[None, :, None, None]
    return image, depth, alpha


def _forward_flat(projs, bg, *, image_height, image_width, max_tiles_side,
                  pair_budget, interpret, mxu_bf16=False, feats_packed=None):
    tiles_x = -(-image_width // TILE_W)
    tiles_y = -(-image_height // TILE_H)
    n_cams = projs.means2d.shape[0]
    flat = _pack_and_flatten(projs, tiles_x=tiles_x, tiles_y=tiles_y,
                             max_tiles_side=max_tiles_side,
                             pair_budget=pair_budget,
                             feats_packed=feats_packed)
    out = composite_tiles_flat(flat, tiles_x=tiles_x, tiles_y=tiles_y,
                               n_cams=n_cams, interpret=interpret,
                               mxu_bf16=mxu_bf16)
    image, depth, alpha = _flat_images(
        out, bg, tiles_x=tiles_x, tiles_y=tiles_y, n_cams=n_cams,
        image_height=image_height, image_width=image_width)
    return flat, out, image, depth, alpha


def _forward(proj: ProjectedGaussians, bg, *, image_height, image_width,
             max_tiles_side, pair_budget, interpret, mxu_bf16=False,
             feats_packed=None):
    """Single-camera forward (test oracle entry) — C=1 flat path."""
    projs = jax.tree_util.tree_map(lambda x: x[None], proj)
    flat, _, image, depth, alpha = _forward_flat(
        projs, bg, image_height=image_height, image_width=image_width,
        max_tiles_side=max_tiles_side, pair_budget=pair_budget,
        interpret=interpret, mxu_bf16=mxu_bf16, feats_packed=feats_packed)
    aux = {
        "n_clipped": flat.n_clipped[0],
        "n_overflow": jnp.maximum(flat.n_valid[0] - pair_budget, 0),
    }
    return image[0], depth[0], alpha[0], aux


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _rasterize_flat_core(projs, bg, image_height, image_width,
                         max_tiles_side, pair_budget, interpret,
                         mxu_bf16=False, feats_packed=None):
    flat, _, image, depth, alpha = _forward_flat(
        projs, bg, image_height=image_height, image_width=image_width,
        max_tiles_side=max_tiles_side, pair_budget=pair_budget,
        interpret=interpret, mxu_bf16=mxu_bf16, feats_packed=feats_packed)
    return (image, depth, alpha, flat.n_clipped,
            jnp.maximum(flat.n_valid - pair_budget, 0))


def _flat_fwd(projs, bg, image_height, image_width, max_tiles_side,
              pair_budget, interpret, mxu_bf16=False, feats_packed=None):
    flat, out, image, depth, alpha = _forward_flat(
        projs, bg, image_height=image_height, image_width=image_width,
        max_tiles_side=max_tiles_side, pair_budget=pair_budget,
        interpret=interpret, mxu_bf16=mxu_bf16, feats_packed=feats_packed)
    t_bnd = out[:, 5:6, :]      # (C·T+1,1,256) boundary log T (bwd residual)
    live_k = out[:, 7, 0].astype(jnp.int32)     # (C·T+1,) live items per tile
    n_clipped = flat.n_clipped
    n_overflow = jnp.maximum(flat.n_valid - pair_budget, 0)
    # keep the flattened pairs as residuals: the backward reuses them instead
    # of re-running the sort/binning (~45 ms at 150K splats)
    return ((image, depth, alpha, n_clipped, n_overflow),
            (flat, bg, t_bnd, live_k, alpha, projs.means2d.shape[1]))


def _flat_bwd(image_height, image_width, max_tiles_side, pair_budget,
              interpret, mxu_bf16, feats_packed, res, g):
    """Dedicated Pallas backward over the flattened reversed item list."""
    flat, bg, t_bnd, live_k, alpha_img, n = res
    g_img, g_depth, g_alpha, _, _ = g   # int diagnostics carry float0 cotangents

    tiles_x = -(-image_width // TILE_W)
    tiles_y = -(-image_height // TILE_H)
    num_tiles = tiles_x * tiles_y
    n_cams = g_img.shape[0]

    # image = premult_color + (1−alpha)·bg  ⇒  ĝcolor = ĝimg,
    # ĝalpha' = ĝalpha − Σ_c ĝimg_c bg_c,  ĝbg = Σ_cam Σ_pix ĝimg (1−alpha)
    g_alpha_eff = g_alpha[:, 0] - jnp.einsum("c,bchw->bhw", bg, g_img)
    d_bg = jnp.einsum("bchw,bhw->c", g_img, 1.0 - alpha_img[:, 0])

    cot_img = jnp.concatenate([g_img, g_depth, g_alpha_eff[:, None]], axis=1)
    cot5 = jax.vmap(lambda ci: _tile_img(ci, tiles_x, tiles_y))(cot_img)
    cot5 = cot5.reshape(n_cams * num_tiles, 5, PIX)
    # assembled with dynamic_update_slice (big concats lower as
    # pad+select+maximum chains over the whole output on TPU)
    cot_tiles = jnp.zeros((n_cams * num_tiles + 1, 8, PIX), jnp.float32)
    cot_tiles = jax.lax.dynamic_update_slice(cot_tiles, cot5, (0, 0, 0))
    cot_tiles = jax.lax.dynamic_update_slice(cot_tiles, t_bnd, (0, 5, 0))

    pair_grads, visited = backward_tiles_flat(
        flat, cot_tiles, live_k, tiles_x=tiles_x, tiles_y=tiles_y,
        n_cams=n_cams, interpret=interpret, mxu_bf16=mxu_bf16)

    nbw = flat.feats_t.shape[1] // n_cams
    np_real = flat.sorted_rank.shape[1]
    pg = pair_grads.reshape(FDIM, n_cams, nbw)
    counts_cam = flat.counts[:-1].reshape(n_cams, num_tiles)
    # per-pair visited flag = its CHUNK block's flag, broadcast (free reshape)
    vis_pair = jnp.repeat(visited, CHUNK).reshape(n_cams, nbw)

    def reduce_cam(pg_c, sorted_rank_c, rank_c, counts_c, vis_c):
        data = pg_c[0:10, :np_real].T              # (NP,10)
        total_pairs = jnp.sum(counts_c)
        # junk pair slots and pairs in blocks no live backward item visited
        # (uninitialized grad memory) → discard segment. Accumulation happens
        # in depth-rank space; one cheap N-row gather converts back to splat
        # order (MEASUREMENTS.md "backward reduction variants": the pair-space
        # segment_sum is the practical floor on TPU).
        ids = jnp.where(vis_c[:np_real] & (jnp.arange(np_real) < total_pairs),
                        sorted_rank_c, n)
        seg_rank = jax.ops.segment_sum(data, ids, num_segments=n + 1)[:n]
        return jnp.take(seg_rank, rank_c, axis=0)

    # unrolled camera loop — like pack_pairs, vmapping the scatter/gather ops
    # here lowers far slower than the unbatched forms
    seg = jnp.stack([
        reduce_cam(pg[:, c], flat.sorted_rank[c], flat.rank[c], counts_cam[c],
                   vis_pair[c])
        for c in range(n_cams)])
    return _pack_ct_batch(seg, n, n_cams), d_bg


def _pack_ct_batch(seg, n, n_cams):
    """(C,N,10) gradient rows → batched ProjectedGaussians cotangent."""
    return ProjectedGaussians(
        means2d=seg[:, :, 0:2],
        conic=seg[:, :, 2:5],
        depth=seg[:, :, 9],
        radii=np.zeros((n_cams, n), jax.dtypes.float0),
        rgb=seg[:, :, 6:9],
        opacity=seg[:, :, 5],
    )


_rasterize_flat_core.defvjp(_flat_fwd, _flat_bwd)


def rasterize_pallas_batch(
    projs: ProjectedGaussians,
    *,
    image_height: int,
    image_width: int,
    bg: jnp.ndarray,
    max_tiles_side: int = 6,
    pair_budget: int = 2_097_152,
    interpret: bool = False,
    mxu_bf16: bool = False,
    feats_packed: "bool | None" = None,
):
    """Camera-batched rasterize over ONE flattened kernel launch (leading
    axis C on every ``projs`` field). Returns batched (image, depth, alpha,
    aux) — the production path for multi-camera training steps."""
    img, depth, alpha, n_clipped, n_overflow = _rasterize_flat_core(
        projs, bg, image_height, image_width, max_tiles_side, pair_budget,
        interpret, mxu_bf16, feats_packed)
    aux = {"n_clipped": n_clipped, "n_overflow": n_overflow}
    return img, depth, alpha, aux


def rasterize_pallas(
    proj: ProjectedGaussians,
    *,
    image_height: int,
    image_width: int,
    bg: jnp.ndarray,
    max_tiles_side: int = 6,
    pair_budget: int = 2_097_152,
    interpret: bool = False,
    mxu_bf16: bool = False,
    feats_packed: "bool | None" = None,
):
    """Drop-in for ``ops.tiled.rasterize_tiled`` (same return signature) —
    the C=1 case of the flattened batch path."""
    projs = jax.tree_util.tree_map(lambda x: x[None], proj)
    img, depth, alpha, aux = rasterize_pallas_batch(
        projs, image_height=image_height, image_width=image_width, bg=bg,
        max_tiles_side=max_tiles_side, pair_budget=pair_budget,
        interpret=interpret, mxu_bf16=mxu_bf16, feats_packed=feats_packed)
    return img[0], depth[0], alpha[0], {
        "n_clipped": aux["n_clipped"][0], "n_overflow": aux["n_overflow"][0]}
