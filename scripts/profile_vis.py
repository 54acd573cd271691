"""Decompose get_visible_mask_depth's 18.5 ms (262K texels, 256^2 buffer):
mesh raster vs anchor projection vs the depth-buffer sample gather, and
A/B the 2D advanced-indexing gather vs a flattened 1D gather.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=20):
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
    from gaussian_garments_tpu.ops.mesh_raster import project_mesh, rasterize_mesh

    res = 512
    W, H = 940, 1280
    cams, verts, faces, uvs, colors = syn.make_scene(
        n_cams=2, nx=48, ny=48, width=W, height=H)
    bind, _ = AG.build_binding(uvs, faces, res)
    c = cams[0]
    v = jnp.asarray(verts)
    f = jnp.asarray(faces.astype(np.int32))
    n = bind.binding.shape[0]
    print(f"texels: {n}  faces: {faces.shape[0]}", flush=True)

    t = lambda name, fn, *a: print(
        f"{name:32s} {_timeit(jax.jit(fn), *a):7.2f} ms", flush=True)

    t("rasterize_mesh_256", lambda vv: rasterize_mesh(
        vv, f, c.world_view_transform, c.full_proj_transform,
        image_width=256, image_height=256)[1], v)

    t("barycentric_3d", lambda vv: AG.barycentric_3d(bind, vv, f), v)

    anchors = jax.jit(lambda vv: AG.barycentric_3d(bind, vv, f))(v)
    t("project_anchors", lambda a: project_mesh(
        a, c.world_view_transform, c.full_proj_transform, 256, 256), anchors)

    depth_buf = jax.jit(lambda vv: rasterize_mesh(
        vv, f, c.world_view_transform, c.full_proj_transform,
        image_width=256, image_height=256)[1])(v)
    xy, z = jax.jit(lambda a: project_mesh(
        a, c.world_view_transform, c.full_proj_transform, 256, 256))(anchors)
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, 255)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, 255)

    t("sample_2d_index", lambda d, y, x: d[y, x].sum(), depth_buf, yi, xi)
    t("sample_flat_index", lambda d, y, x: d.reshape(-1)[y * 256 + x].sum(),
      depth_buf, yi, xi)

    t("full_vis_depth_current", lambda vv: AG.get_visible_mask_depth(
        bind, vv, f, c.world_view_transform, c.full_proj_transform,
        image_width=256, image_height=256).astype(jnp.float32), v)
    print("PROFILE_DONE", flush=True)


def chunks_ab():
    import jax
    import jax.numpy as jnp
    from gaussian_garments_tpu.data import synthetic as syn
    from gaussian_garments_tpu.models import avatar_gaussian as AG
    from gaussian_garments_tpu.ops.mesh_raster import rasterize_mesh

    res = 512
    W, H = 940, 1280
    cams, verts, faces, uvs, colors = syn.make_scene(
        n_cams=2, nx=48, ny=48, width=W, height=H)
    bind, _ = AG.build_binding(uvs, faces, res)
    c = cams[0]
    v = jnp.asarray(verts)
    f = jnp.asarray(faces.astype(np.int32))
    for ct in (32, 64, 128, 256):
        fn = jax.jit(lambda vv, ct=ct: rasterize_mesh(
            vv, f, c.world_view_transform, c.full_proj_transform,
            image_width=256, image_height=256, chunk_tiles=ct)[1].sum())
        print(f"  rasterize_mesh_256 chunk_tiles={ct:3d}  {_timeit(fn, v):7.2f} ms",
              flush=True)
    for tc in (32, 64):
        fn = jax.jit(lambda vv, tc=tc: rasterize_mesh(
            vv, f, c.world_view_transform, c.full_proj_transform,
            image_width=256, image_height=256, tile_capacity=tc,
            chunk_tiles=256)[1].sum())
        print(f"  rasterize_mesh_256 cap={tc} ct=256    {_timeit(fn, v):7.2f} ms",
              flush=True)
    print("PROFILE_DONE2", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if "--chunks" in sys.argv:
        chunks_ab()
    else:
        main()
