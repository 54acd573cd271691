"""Compiled-gradient agreement at TRAINING SCALE on TPU (VERDICT r1 weak #6).

The CPU oracle can't run at 150K splats (O(N·pixels)), so this checks the
production Pallas backward against the mathematically-identical XLA tiled
backend — two independent implementations of the same masked compositing
math — both jit-compiled on the TPU at the full 1080p/150K bench scene.
Reports per-leaf max relative error (element max-norm denominator).

Run: python scripts/check_grad_scale.py   (TPU child w/ timeout+retry)
"""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure():
    import jax
    import jax.numpy as jnp

    from bench import build_garment_splats
    from gaussian_garments_tpu.renderer import RasterConfig, SplatBundle, render
    from gaussian_garments_tpu.utils.camera import make_camera

    W, H = 1920, 1080
    rng = np.random.RandomState(0)
    means, scales, rots, opac, shs = build_garment_splats(150_000, rng)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 2.2]), fx=2200.0, fy=2200.0,
                      cx=W / 2, cy=H / 2, width=W, height=H)
    bundle = SplatBundle(
        means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        shs=jnp.asarray(shs), active_sh_degree=0)

    # the tiled backend truncates tiles at tile_capacity — size it so nothing
    # is dropped (asserted below), else the comparison is invalid
    cfgs = {"pallas": RasterConfig(backend="pallas"),
            "tiled": RasterConfig(backend="tiled", tile_capacity=2048,
                                  chunk_tiles=8)}

    def loss(b, backend):
        out = render(cam, b, jnp.zeros(3), config=cfgs[backend])
        # non-trivial pixel weighting so gradients aren't uniform
        wgt = jnp.linspace(0.5, 1.5, H)[None, :, None]
        return (out["render"] * wgt).mean() + out["alpha"].mean() * 0.25 \
            + out["depth"].mean() * 0.05

    import jax as _jax
    til_out = _jax.jit(lambda b: render(cam, b, jnp.zeros(3),
                                        config=cfgs["tiled"])["raster_aux"])(bundle)
    n_over = int(til_out["n_overflow"])
    print(f"tiled n_overflow tiles: {n_over}", flush=True)
    assert n_over == 0, "raise tile_capacity — comparison invalid"

    g_pal = jax.jit(jax.grad(lambda b: loss(b, "pallas")))(bundle)
    g_til = jax.jit(jax.grad(lambda b: loss(b, "tiled")))(bundle)
    worst = 0.0
    for name in ("means3d", "opacity", "scales", "rotations", "shs"):
        a = np.asarray(getattr(g_pal, name), np.float64)
        b = np.asarray(getattr(g_til, name), np.float64)
        denom = max(np.abs(b).max(), 1e-12)
        rel = np.abs(a - b).max() / denom
        worst = max(worst, rel)
        print(f"{name:10s} max|Δ|/max|g| = {rel:.3e}", flush=True)
    print(f"WORST {worst:.3e}", flush=True)
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
            r = subprocess.run([sys.executable, os.path.abspath(__file__), "--child"],
                               capture_output=True, text=True, timeout=420)
        except subprocess.TimeoutExpired:
            print(f"[check] attempt {attempt} wedged (timeout)", file=sys.stderr)
            continue
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-3000:])


if __name__ == "__main__":
    main()
