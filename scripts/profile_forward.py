"""Stage-by-stage decomposition of the production pallas forward at bench
scale (1080p / 150K splats): dispatch no-op, projection, +rects, +pack,
+kernel, full render. Loop-averaged (20 iters, end sync) like bench.py so
the numbers decompose the same 47 ms headline."""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def _measure():
    import jax
    import jax.numpy as jnp
    from bench import build_garment_splats, N_SPLATS, WIDTH, HEIGHT
    from gaussian_garments_tpu.renderer import RasterConfig, SplatBundle, render
    from gaussian_garments_tpu.utils.camera import make_camera
    from gaussian_garments_tpu.ops import pallas_tiles as PT
    from gaussian_garments_tpu.ops.projection import project_gaussians

    rng = np.random.RandomState(0)
    means, scales, rots, opac, shs = build_garment_splats(N_SPLATS, rng)
    cam = make_camera(
        np.eye(3), np.array([0.0, 0.0, 2.2]), fx=2200.0, fy=2200.0,
        cx=WIDTH / 2, cy=HEIGHT / 2, width=WIDTH, height=HEIGHT,
    )
    bundle = SplatBundle(
        means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        shs=jnp.asarray(shs), active_sh_degree=0,
    )
    tiles_x, tiles_y = -(-WIDTH // PT.TILE_W), -(-HEIGHT // PT.TILE_H)
    budget = 2_097_152

    def _proj(b):
        return project_gaussians(
            b.means3d, cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, image_width=WIDTH, image_height=HEIGHT,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            scales=b.scales, rotations=b.rotations, shs=b.shs,
            opacities=b.opacity.reshape(-1), sh_degree=0)

    @jax.jit
    def noop(b):
        return b.means3d[0, 0] + 1.0

    @jax.jit
    def proj_only(b):
        p = _proj(b)
        return p.means2d[0, 0] + p.conic[0, 0] + p.depth[0] + p.rgb[0, 0]

    @jax.jit
    def pack_only(b):
        pk = PT.pack_pairs(_proj(b), tiles_x=tiles_x, tiles_y=tiles_y,
                           max_tiles_side=6, pair_budget=budget)
        return pk.feats_t[0, 0], pk.n_valid

    @jax.jit
    def kernel_too(b):
        projs = jax.tree_util.tree_map(lambda x: x[None], _proj(b))
        flat = PT._pack_and_flatten(projs, tiles_x=tiles_x, tiles_y=tiles_y,
                                    max_tiles_side=6, pair_budget=budget)
        out = PT.composite_tiles_flat(flat, tiles_x=tiles_x, tiles_y=tiles_y,
                                      n_cams=1)
        return out[0, 0, 0]

    cfg = RasterConfig(backend="pallas")

    @jax.jit
    def full(b):
        out = render(cam, b, jnp.zeros(3), config=cfg)
        return out["render"], out["alpha"]

    for name, f in [("noop dispatch", noop), ("projection", proj_only),
                    ("proj+pack", pack_only), ("proj+pack+kernel", kernel_too),
                    ("full render", full)]:
        print(f"{name:18s} {_timeit(f, bundle):8.2f} ms", flush=True)
    print("PROFILE_DONE", flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(3):
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "--child"],
                           capture_output=True, text=True, timeout=600)
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-3000:])


if __name__ == "__main__":
    main()
