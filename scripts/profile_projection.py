"""Sub-decompose project_gaussians at 150K splats on TPU: full vs
cov3d_precomp (skips build_cov3d's (N,3,3) batched tiny matmuls) vs
colors_precomp (skips SH) vs both. Identifies which stage eats the ~7 ms."""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=50):
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
    from gaussian_garments_tpu.utils.camera import make_camera
    from gaussian_garments_tpu.ops.projection import project_gaussians, build_cov3d

    rng = np.random.RandomState(0)
    means, scales, rots, opac, shs = build_garment_splats(N_SPLATS, rng)
    cam = make_camera(
        np.eye(3), np.array([0.0, 0.0, 2.2]), fx=2200.0, fy=2200.0,
        cx=WIDTH / 2, cy=HEIGHT / 2, width=WIDTH, height=HEIGHT,
    )
    means, scales, rots = jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots)
    opacv, shs = jnp.asarray(opac).reshape(-1), jnp.asarray(shs)
    cov_pre = jnp.zeros((N_SPLATS, 6)) + jnp.asarray([1e-5, 0, 0, 1e-5, 0, 1e-5])
    col_pre = jnp.zeros((N_SPLATS, 3)) + 0.5

    kw = dict(image_width=WIDTH, image_height=HEIGHT,
              tanfovx=cam.tanfovx, tanfovy=cam.tanfovy)

    def out_of(p):
        return p.means2d[0, 0] + p.conic[0, 0] + p.depth[0] + p.rgb[0, 0] + p.opacity[0]

    @jax.jit
    def full(m, s, r, o, sh):
        return out_of(project_gaussians(
            m, cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, scales=s, rotations=r, shs=sh, opacities=o,
            sh_degree=0, **kw))

    @jax.jit
    def no_cov(m, o, sh):
        return out_of(project_gaussians(
            m, cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, cov3d_precomp=cov_pre, shs=sh, opacities=o,
            sh_degree=0, **kw))

    @jax.jit
    def no_sh(m, s, r, o):
        return out_of(project_gaussians(
            m, cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, scales=s, rotations=r, colors_precomp=col_pre,
            opacities=o, sh_degree=0, **kw))

    @jax.jit
    def neither(m, o):
        return out_of(project_gaussians(
            m, cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, cov3d_precomp=cov_pre, colors_precomp=col_pre,
            opacities=o, sh_degree=0, **kw))

    @jax.jit
    def cov_only(s, r):
        return build_cov3d(s, r)[0, 0]

    print(f"full           {_timeit(full, means, scales, rots, opacv, shs):8.2f} ms", flush=True)
    print(f"no build_cov3d {_timeit(no_cov, means, opacv, shs):8.2f} ms", flush=True)
    print(f"no SH          {_timeit(no_sh, means, scales, rots, opacv):8.2f} ms", flush=True)
    print(f"neither        {_timeit(neither, means, opacv):8.2f} ms", flush=True)
    print(f"build_cov3d    {_timeit(cov_only, scales, rots):8.2f} ms", flush=True)
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
