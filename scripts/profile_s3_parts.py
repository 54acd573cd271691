"""Fine-grained s3 forward decomposition on TPU: which sub-stage owns the
~60 ms the coarse probes don't account for (bench_s3_step.py --profile:
full-loss fwd 114.9 ms but net 13.3 + pack ~17 + kernel ~12 + SSIM ~5 +
proj ~2 leaves more than half unexplained).

Times each sub-path fwd (and fwd+bwd where it is differentiated in
training) at production scale: 512^2 texels (262K), 940x1280, deg-3 SH.
"""
import os
import subprocess
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


def _measure():
    import jax
    import jax.numpy as jnp

    from gaussian_garments_tpu.data import synthetic as syn
    from gaussian_garments_tpu.data.baker import bake_textures
    from gaussian_garments_tpu.models import avatar_gaussian as AG
    from gaussian_garments_tpu.models import gaussian as G
    from gaussian_garments_tpu.models import mesh_gaussian as MG
    from gaussian_garments_tpu.models.avatar_net import AvatarNet, apply_shadow
    from gaussian_garments_tpu.ops.projection import project_gaussians
    from gaussian_garments_tpu.ops.pallas_tiles import rasterize_pallas_batch

    res = 512
    W, H = 940, 1280
    rng = np.random.RandomState(0)
    cams, verts, faces, uvs, colors = syn.make_scene(
        n_cams=2, nx=48, ny=48, width=W, height=H)
    bind, _ = AG.build_binding(uvs, faces, res)
    n = bind.binding.shape[0]
    print(f"texels bound: {n}", flush=True)
    splats = G.GaussianParams(
        xyz=jnp.zeros((n, 3)),
        features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.1),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 3), -6.5),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        opacity=jnp.full((n, 1), 2.0),
    )
    amb, nrm = bake_textures(bind, verts, faces, n_samples=8)
    net = AvatarNet(texture_size=res, sh_degree=3)
    c = cams[0]
    v = jnp.asarray(verts)
    f = jnp.asarray(faces.astype(np.int32))
    frames0 = MG.compute_face_frames(v, f)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(amb),
                         jnp.asarray(nrm), c.world_view_transform,
                         c.camera_center, bind, v, f, frames0)
    shadow_tex = net.apply(variables, jnp.asarray(amb), jnp.asarray(nrm),
                           c.world_view_transform, c.camera_center,
                           bind, v, f, frames0)

    def t(name, fn, *args, grad_of=None):
        """time fn fwd; if grad_of is an argnum, also fwd+bwd wrt it."""
        jfn = jax.jit(lambda *a: jax.tree_util.tree_leaves(fn(*a))[0].sum())
        ms = _timeit(jfn, *args)
        line = f"{name:28s} fwd {ms:7.2f} ms"
        if grad_of is not None:
            gfn = jax.jit(lambda *a: jax.tree_util.tree_leaves(
                jax.grad(lambda *b: jnp.sum(sum(jnp.sum(x) for x in
                         jax.tree_util.tree_leaves(fn(*b)))),
                         argnums=grad_of)(*a))[0].sum())
            gms = _timeit(gfn, *args)
            line += f"   fwd+bwd {gms:7.2f} ms"
        print(line, flush=True)

    # 1. per-texel visibility (256^2 mesh depth raster + anchor projection)
    t("vis_depth_256", lambda vv: AG.get_visible_mask_depth(
        bind, vv, f, c.world_view_transform, c.full_proj_transform,
        image_width=256, image_height=256).astype(jnp.float32), v)

    # 2. geometry chain: frames -> anchor -> world xyz/scales/rots
    # (shared frame-row gather, exactly as _s3_project composes it)
    def geom(sp_xyz, vv):
        frames = MG.compute_face_frames(vv, f)
        rows = MG.gather_frame_rows(frames, bind.binding, vv, f)
        anchor = AG.barycentric_3d(bind, vv, f, rows=rows)
        means3d = AG.avatar_world_xyz(sp_xyz, bind, frames, anchor, rows=rows)
        scales = MG.world_scaling(splats, bind.binding, frames, rows=rows)
        rots = MG.world_rotation(splats, bind.binding, frames, rows=rows)
        return means3d, scales, rots
    t("geom_chain", geom, splats.xyz, v, grad_of=0)

    # 3. apply_shadow (texture gather + SH combine)
    t("apply_shadow", lambda st: apply_shadow(bind, splats, st, 3), shadow_tex,
      grad_of=0)

    # 4. projection at 262K, deg-3 SH
    means3d, scales, rots = jax.jit(geom)(splats.xyz, v)
    shs = G.get_features(splats)
    opac = G.get_opacity(splats).reshape(-1)

    def proj_fn(m3, sh):
        return project_gaussians(
            m3, c.world_view_transform, c.full_proj_transform, c.camera_center,
            image_width=W, image_height=H, tanfovx=c.tanfovx, tanfovy=c.tanfovy,
            scales=scales, rotations=rots, shs=sh, opacities=opac, sh_degree=3)
    t("project_262k_sh3", proj_fn, means3d, shs, grad_of=(0, 1))

    # 5. rasterize fwd / fwd+bwd at this scale (1 cam), autosized-ish budget
    projs = jax.tree_util.tree_map(lambda x: x[None], jax.jit(proj_fn)(means3d, shs))
    radii_const = projs.radii  # int field must stay out of grad argnums

    def rast(m2, conic, depthv, rgb, opac):
        p = projs.replace(means2d=m2, conic=conic, depth=depthv,
                          rgb=rgb, opacity=opac)
        img, d, a, _ = rasterize_pallas_batch(
            p, image_height=H, image_width=W, bg=jnp.zeros(3),
            pair_budget=1 << 21)
        return img
    t("rasterize_1cam_2^21", rast, projs.means2d, projs.conic, projs.depth,
      projs.rgb, projs.opacity, grad_of=(0, 1, 2, 3, 4))

    print("PROFILE_DONE", flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(4):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"] + sys.argv[1:],
                capture_output=True, text=True, timeout=900)
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {attempt} wedged (timeout)", file=sys.stderr)
            continue
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-3000:])


if __name__ == "__main__":
    main()
