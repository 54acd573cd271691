"""Decompose the s3-scale rasterizer (262K texel splats, 940x1280, 2^21
budget) via CUMULATIVE jitted prefixes (projection happens inside each jit
from small inputs; stage cost = difference of consecutive prefix timings).
Passing the big packed arrays as jit args is transfer-inflated through the
TPU tunnel and measures garbage.
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
    tiles_x = -(-W // PT.TILE_W)
    tiles_y = -(-H // PT.TILE_H)
    nt = tiles_x * tiles_y

    def make_projs(fdc):
        frames = MG.compute_face_frames(v, f)
        rows = MG.gather_frame_rows(frames, bind.binding, v, f)
        anchor = AG.barycentric_3d(bind, v, f, rows=rows)
        means3d = AG.avatar_world_xyz(splats.xyz, bind, frames, anchor, rows=rows)
        scales = MG.world_scaling(splats, bind.binding, frames, rows=rows)
        rots = MG.world_rotation(splats, bind.binding, frames, rows=rows)
        opac = G.get_opacity(splats).reshape(-1)
        shs = G.get_features(splats.replace(features_dc=fdc))
        proj = project_gaussians(
            means3d, c.world_view_transform, c.full_proj_transform,
            c.camera_center, image_width=W, image_height=H,
            tanfovx=c.tanfovx, tanfovy=c.tanfovy,
            scales=scales, rotations=rots, shs=shs, opacities=opac, sh_degree=3)
        return jax.tree_util.tree_map(lambda x: x[None], proj)

    def pack(fdc):
        return PT._pack_and_flatten(make_projs(fdc), tiles_x=tiles_x,
                                    tiles_y=tiles_y, max_tiles_side=6,
                                    pair_budget=BUDGET)

    def kernel(fdc):
        flat = pack(fdc)
        return flat, PT.composite_tiles_flat(flat, tiles_x=tiles_x,
                                             tiles_y=tiles_y, n_cams=1)

    def assemble(fdc):
        flat, out = kernel(fdc)
        img, d, a = PT._flat_images(out, jnp.zeros(3), tiles_x=tiles_x,
                                    tiles_y=tiles_y, n_cams=1,
                                    image_height=H, image_width=W)
        return flat, out, img

    def bwd_kernel(fdc):
        flat, out, img = assemble(fdc)
        cot_tiles = jnp.zeros((nt + 1, 8, PT.PIX), jnp.float32)
        cot_tiles = jax.lax.dynamic_update_slice(cot_tiles, out[:, 0:5, :], (0, 0, 0))
        cot_tiles = jax.lax.dynamic_update_slice(cot_tiles, out[:, 5:6, :], (0, 5, 0))
        live_k = out[:, 7, 0].astype(jnp.int32)
        pg, vis = PT.backward_tiles_flat(flat, cot_tiles, live_k,
                                         tiles_x=tiles_x, tiles_y=tiles_y,
                                         n_cams=1)
        return flat, pg, vis

    def reduce_(fdc):
        flat, pg, vis = bwd_kernel(fdc)
        np_real = flat.sorted_rank.shape[1]
        data = pg.reshape(PT.FDIM, 1, -1)[0:10, 0, :np_real].T
        counts_c = flat.counts[:-1].reshape(1, nt)[0]
        total = jnp.sum(counts_c)
        vis_pair = jnp.repeat(vis, PT.CHUNK)[:np_real]
        ids = jnp.where(vis_pair & (jnp.arange(np_real) < total),
                        flat.sorted_rank[0], n)
        seg = jax.ops.segment_sum(data, ids, num_segments=n + 1)[:n]
        return jnp.take(seg, flat.rank[0], axis=0)

    fdc = splats.features_dc
    t = lambda name, fn: print(f"{name:26s} {_timeit(jax.jit(fn), fdc):8.2f} ms",
                               flush=True)
    t("proj_only", lambda x: jax.tree_util.tree_leaves(
        make_projs(x).means2d)[0].sum())
    t("+pack", lambda x: pack(x).feats_t[0, ::4096].sum())
    t("+kernel", lambda x: kernel(x)[1][:, 0, ::64].sum())
    t("+assembly", lambda x: assemble(x)[2].sum())
    t("+bwd_kernel", lambda x: bwd_kernel(x)[1][0, ::4096].sum())
    t("+pairgrad_reduce", lambda x: reduce_(x).sum())
    print("PROFILE_DONE", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    main()
