"""Stage-3 jitted training-step latency at production scale on TPU (ROADMAP 3).

Production shape: 512² texture AvatarNet (StyleUNet shadow net + viewdir SH
net) + per-texel splats rendered at 940×1280 through the Pallas rasterizer,
full fwd+bwd + Adam — the per-item cost of the s3 epoch loop. Reports bs=1
and bs=2 per chip (items_per_step batching headroom).

Run: python scripts/bench_s3_step.py [--texture 512]
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
    import jax.numpy as jnp
    from argparse import ArgumentParser

    from gaussian_garments_tpu.config import OptimizationParams
    from gaussian_garments_tpu.data import synthetic as syn
    from gaussian_garments_tpu.data.baker import bake_textures
    from gaussian_garments_tpu.models import avatar_gaussian as AG
    from gaussian_garments_tpu.models import gaussian as G
    from gaussian_garments_tpu.models.avatar_net import AvatarNet
    from gaussian_garments_tpu.renderer import RasterConfig
    from gaussian_garments_tpu.training import s3 as S3

    res = 512
    if "--texture" in sys.argv:
        res = int(sys.argv[sys.argv.index("--texture") + 1])
    occupancy = 1.0
    if "--occupancy" in sys.argv:
        # realistic garment atlases cover ~half the texture; shrink the UV
        # chart into a sqrt(f)-scaled corner so f of the texels bind
        # (ROADMAP "dense-texel decision at realistic occupancy")
        occupancy = float(sys.argv[sys.argv.index("--occupancy") + 1])
    W, H = 940, 1280

    parser = ArgumentParser()
    opt = OptimizationParams(parser).extract(parser.parse_args([]))
    from argparse import Namespace
    args = Namespace(**{**vars(opt), "lr_init": 5e-4})
    rng = np.random.RandomState(0)
    cams, verts, faces, uvs, colors = syn.make_scene(
        n_cams=2, nx=48, ny=48, width=W, height=H)
    if occupancy < 1.0:
        uvs = 0.005 + uvs * (np.sqrt(occupancy) * 0.99)
    bind, _ = AG.build_binding(uvs, faces, res, dense="--dense" in sys.argv)
    n = bind.binding.shape[0]
    print(f"texels bound: {n} ({res}² texture, dense={bind.dense})", flush=True)
    splats = G.GaussianParams(
        xyz=jnp.zeros((n, 3)),
        features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.1),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 3), -6.5),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        opacity=jnp.full((n, 1), 2.0),
    )
    amb, nrm = bake_textures(bind, verts, faces, n_samples=8)
    mesh_f = jnp.asarray(faces.astype(np.int32))

    import jax as _jax
    from gaussian_garments_tpu.models import avatar_gaussian as _AG
    vis_fn = _jax.jit(lambda mv, wv, fp: _AG.get_visible_mask_depth(
        bind, mv, mesh_f, wv, fp, image_width=256, image_height=256))

    def make_item(B):
        # cached per-item visibility, like the production driver
        vis = jnp.stack([vis_fn(jnp.asarray(verts), c.world_view_transform,
                                c.full_proj_transform).astype(jnp.float32)
                         for c in cams[:B]])
        return S3.S3Item(
            vis=vis,
            image=jnp.stack([c.original_image for c in cams[:B]]),
            mask=jnp.stack([c.gt_alpha_mask for c in cams[:B]]),
            bg=jnp.zeros((B, 3)),
            mesh_v=jnp.tile(jnp.asarray(verts)[None], (B, 1, 1)),
            ambient=jnp.tile(jnp.asarray(amb)[None], (B, 1, 1, 1)),
            normal=jnp.tile(jnp.asarray(nrm)[None], (B, 1, 1, 1)),
            world_view=jnp.stack([c.world_view_transform for c in cams[:B]]),
            full_proj=jnp.stack([c.full_proj_transform for c in cams[:B]]),
            campos=jnp.stack([c.camera_center for c in cams[:B]]),
            tanfovx=jnp.asarray([c.tanfovx for c in cams[:B]]),
            tanfovy=jnp.asarray([c.tanfovy for c in cams[:B]]),
            width=W, height=H,
        )

    import jax.numpy as _jnp
    act = _jnp.bfloat16 if "--bf16" in sys.argv else _jnp.float32
    net = AvatarNet(texture_size=res, sh_degree=3, act_dtype=act)
    item1 = make_item(1)
    state = S3.init_state(net, bind, splats, verts, faces, item1)
    n_params = sum(int(np.prod(x.shape)) for x in
                   __import__("jax").tree_util.tree_leaves(state.net_params))
    print(f"net params: {n_params/1e6:.1f}M", flush=True)

    # autosized pair budget (same policy as the s3 driver: probe, 2× headroom,
    # pow2 bucket)
    cfg0 = RasterConfig(backend="pallas")
    counts = np.asarray(S3.make_s3_pair_counter(raster_cfg=cfg0)(
        state, bind, mesh_f, item1))
    from gaussian_garments_tpu.ops.pallas_tiles import budget_bucket
    budget = budget_bucket(int(counts.max()), headroom=2.0,
                           cap=cfg0.pair_budget)
    print(f"pair counts/item {counts} -> pair_budget {budget}", flush=True)
    cfg = RasterConfig(backend="pallas", pair_budget=budget)

    for B in (1, 2):
        item = make_item(B)
        step = S3.make_s3_step(net, args, sh_degree=3,
                               raster_cfg=cfg,
                               train_gaussians=True)

        def run(st):
            st2, ld = step(st, bind, mesh_f, item)
            return st2

        ms = _timeit(run, state)
        print(f"s3_step bs={B}  {ms:8.2f} ms  ({ms/B:.1f} ms/item -> "
              f"{1000.0*B/ms:.1f} items/s at {res}²/{W}x{H})", flush=True)

    if "--profile" in sys.argv:
        # decomposition probes at bs=1 (each is fwd+bwd of a sub-path; the
        # full step ≈ net_bwd + render_bwd + shared fwd + Adam)
        import jax

        net_vars = {"params": state.net_params, "buffers": state.net_buffers}
        c = cams[0]
        frames_args = (jnp.asarray(amb), jnp.asarray(nrm),
                       c.world_view_transform, c.camera_center, bind,
                       jnp.asarray(verts), mesh_f)
        from gaussian_garments_tpu.models import mesh_gaussian as MG
        frames = MG.compute_face_frames(jnp.asarray(verts), mesh_f)

        def net_fwd(p):
            tex = net.apply({"params": p, "buffers": state.net_buffers},
                            *frames_args, frames)
            return sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(tex))

        print(f"net_fwd         {_timeit(jax.jit(net_fwd), state.net_params):8.2f} ms",
              flush=True)
        print(f"net_fwd+bwd     {_timeit(jax.jit(lambda p: jax.tree_util.tree_leaves(jax.grad(net_fwd)(p))[0].sum()), state.net_params):8.2f} ms",
              flush=True)

        # full loss, differentiate ONLY the splats: the UNet backward drops
        # out (its output is constant wrt splats) but fwd + render bwd stay
        def loss_of(sp):
            l, _ = S3._s3_losses(net, net_vars["params"], net_vars["buffers"],
                                 sp, bind, mesh_f, item1, args, sh_degree=3,
                                 raster_cfg=cfg, vis_raster_hw=(256, 256))
            return l

        print(f"fwd+render_bwd  {_timeit(jax.jit(lambda sp: jax.tree_util.tree_leaves(jax.grad(loss_of)(sp))[0].sum()), state.splats):8.2f} ms "
              "(loss grad wrt splats only — no UNet bwd)", flush=True)
        print(f"fwd_only        {_timeit(jax.jit(loss_of), state.splats):8.2f} ms",
              flush=True)
    print("PROFILE_DONE", flush=True)


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
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
