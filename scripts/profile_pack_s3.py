"""Cumulative-prefix ladder over pack_pairs internals at the s3 shape
(N=262K texel splats, 940x1280, budget 2^21): which sub-op owns the ~51 ms
(vs 17 ms at the 150K/1080p bench with MORE pairs)?

Stage cost = difference between consecutive prefix timings (all prefixes
share the same ~20MB proj args; small-arg dispatches are not
transfer-inflated through the tunnel, unlike passing the packed arrays).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_garments_tpu.data import synthetic as syn
    from gaussian_garments_tpu.models import avatar_gaussian as AG
    from gaussian_garments_tpu.models import gaussian as G
    from gaussian_garments_tpu.models import mesh_gaussian as MG
    from gaussian_garments_tpu.ops import pallas_tiles as PT
    from gaussian_garments_tpu.ops.projection import project_gaussians

    res = 512
    W, H = 940, 1280
    BUDGET = 1 << 21
    SIDE = 6
    rng = np.random.RandomState(0)
    cams, verts, faces, uvs, colors = syn.make_scene(
        n_cams=2, nx=48, ny=48, width=W, height=H)
    bind, _ = AG.build_binding(uvs, faces, res)
    n = bind.binding.shape[0]
    print(f"texels: {n}", flush=True)
    splats = G.GaussianParams(
        xyz=jnp.zeros((n, 3)),
        features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.1),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 3), -6.5),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        opacity=jnp.full((n, 1), 2.0),
    )
    c = cams[0]
    v = jnp.asarray(verts)
    f = jnp.asarray(faces.astype(np.int32))
    frames = MG.compute_face_frames(v, f)
    rows = MG.gather_frame_rows(frames, bind.binding, v, f)
    anchor = AG.barycentric_3d(bind, v, f, rows=rows)
    means3d = AG.avatar_world_xyz(splats.xyz, bind, frames, anchor, rows=rows)
    scales = MG.world_scaling(splats, bind.binding, frames, rows=rows)
    rots = MG.world_rotation(splats, bind.binding, frames, rows=rows)
    opac = G.get_opacity(splats).reshape(-1)
    shs = G.get_features(splats)
    proj = jax.jit(lambda: project_gaussians(
        means3d, c.world_view_transform, c.full_proj_transform, c.camera_center,
        image_width=W, image_height=H, tanfovx=c.tanfovx, tanfovy=c.tanfovy,
        scales=scales, rotations=rots, shs=shs, opacities=opac, sh_degree=3))()

    tiles_x = -(-W // PT.TILE_W)
    tiles_y = -(-H // PT.TILE_H)
    num_tiles = tiles_x * tiles_y
    side = SIDE
    RANK_BITS, RANK_MASK, CHUNK = PT.RANK_BITS, PT.RANK_MASK, PT.CHUNK

    def ladder(stage):
        def fn(means2d, radii, depth, conic, opacity, rgb):
            p = proj.replace(means2d=means2d, radii=radii, depth=depth,
                             conic=conic, opacity=opacity, rgb=rgb)
            x0, y0, x1, y1, alive = PT._tile_rects(p, tiles_x=tiles_x, tiles_y=tiles_y)
            if stage == 0:
                return x0.sum() + y1.sum()
            order = jnp.argsort(depth)
            if stage == 1:
                return order[::4096].sum()
            rank = jnp.zeros((n,), jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))
            if stage == 2:
                return rank[::4096].sum()
            w = jnp.minimum(jnp.maximum(x1 - x0, 0), side)
            h = jnp.minimum(jnp.maximum(y1 - y0, 0), side)
            area = jnp.where(alive, w * h, 0)
            area_r = area[order]
            meta_r = (((y0 * tiles_x + x0) << 6) | (w << 3))[order]
            base_r = (jnp.cumsum(area_r) - area_r).astype(jnp.int32)
            n_valid = base_r[-1] + area_r[-1]
            if stage == 3:
                return n_valid + meta_r[::4096].sum()
            np_slots = min(BUDGET, n * side * side)
            vals = jnp.stack(
                [meta_r, base_r, jnp.arange(n, dtype=jnp.int32)], axis=1)
            delta = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]], axis=0)
            grid = jnp.zeros((np_slots, 3), jnp.int32).at[base_r].add(
                delta, mode="drop", indices_are_sorted=True)
            g = jnp.cumsum(grid, axis=0)
            ms, bs, rk = g[:, 0], g[:, 1], g[:, 2]
            if stage == 4:
                return ms[::4096].sum()
            p_iota = jnp.arange(np_slots, dtype=jnp.int32)
            j = p_iota - bs
            ws = (ms >> 3) & 0x7
            jy = jnp.zeros_like(j)
            for k in range(1, side):
                jy += (j >= k * ws).astype(jnp.int32)
            jx = j - jy * ws
            tile = (ms >> 6) + jy * tiles_x + jx
            p_valid = p_iota < n_valid
            key = jnp.where(p_valid, (tile << RANK_BITS) | rk,
                            (num_tiles << RANK_BITS) | RANK_MASK)
            if stage == 5:
                return key[::4096].sum()
            sorted_key = jax.lax.sort(key)
            if stage == 6:
                return sorted_key[::4096].sum()
            sorted_rank = sorted_key & RANK_MASK
            bound_q = (jnp.arange(num_tiles + 1, dtype=jnp.int32) << RANK_BITS)
            bounds = PT._lower_bound(sorted_key, bound_q)
            counts = bounds[1:] - bounds[:-1]
            starts = bounds[:-1]
            if stage == 7:
                return counts.sum()
            zrow = jnp.zeros((n,))
            feats_rows = jnp.stack([
                p.means2d[:, 0], p.means2d[:, 1],
                p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
                p.opacity, p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2], p.depth,
                zrow, zrow, zrow, zrow, zrow, zrow], axis=1)[order]
            if stage == 8:
                return feats_rows[::4096, 3].sum()
            gat = jnp.take(feats_rows, sorted_rank, axis=0, mode="clip")
            if stage == 9:
                return gat[::4096, 3].sum()
            n_blocks = -(-np_slots // CHUNK) + 1
            feats_t = jnp.pad(gat.T, ((0, 0), (0, n_blocks * CHUNK - np_slots)))
            return feats_t[3, ::4096].sum()
        return fn

    names = ["tile_rects", "argsort_depth_N", "rank_scatter_N", "meta_rank_N",
             "delta_scatter+cumsum", "jy_ladder+key", "sort_2.1M",
             "lower_bound", "feat_stack+permute_N", "feat_gather_2.1M",
             "transpose+pad"]
    prev = 0.0
    for s, name in enumerate(names):
        ms = _timeit(jax.jit(ladder(s)), proj.means2d, proj.radii, proj.depth,
                     proj.conic, proj.opacity, proj.rgb)
        print(f"s{s:02d} {name:22s} cum {ms:8.2f} ms   delta {ms - prev:7.2f}",
              flush=True)
        prev = ms
    print("PROFILE_DONE", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    main()
