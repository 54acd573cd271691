"""Headline benchmark: 1080p forward render latency at 150K splats.

BASELINE.md north star: "1080p render ms/frame at 150K splats" on TPU,
tracked against the reference's CUDA rasterizer
(diff_gaussian_rasterization_depth_alpha). The reference repo publishes no
numbers (BASELINE.md); we assume a nominal 10 ms/frame CUDA forward at this
size for the ``vs_baseline`` ratio (>1.0 = faster than the assumed baseline).

The measurement runs in a child process with a timeout and retries: the
TPU-tunnel transport in this environment occasionally wedges a process
(observed on trivial kernels too), and a wedged attempt must not hang the
whole bench. Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

ASSUMED_BASELINE_MS = 10.0
N_SPLATS = 150_000
WIDTH, HEIGHT = 1920, 1080


def build_garment_splats(n, rng):
    """Splats distributed over a draped-sheet surface covering ~1/3 of the
    frame — the stage-2/3 workload shape (SURVEY.md §6)."""
    from gaussian_garments_tpu.data.synthetic import make_cloth_template

    verts, faces, _ = make_cloth_template(64, 64, size=1.2, ripple=0.08)
    tri = verts[faces]
    fid = rng.randint(0, len(faces), n)
    w = rng.dirichlet((1, 1, 1), n).astype(np.float32)
    means = np.einsum("nk,nkc->nc", w, tri[fid]).astype(np.float32)
    scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.3 + np.log(0.004))
    rots = rng.randn(n, 4).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.randn(n, 1)))).astype(np.float32)
    shs = rng.randn(n, 1, 3).astype(np.float32) * 0.3
    return means, scales, rots, opac, shs


def _measure(backend: str) -> "tuple[float, float]":
    """Runs in the child process: returns (fwd ms/frame, fwd+bwd ms)."""
    import jax
    import jax.numpy as jnp

    from gaussian_garments_tpu.renderer import RasterConfig, SplatBundle, render
    from gaussian_garments_tpu.utils.camera import make_camera

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
    cfg = RasterConfig(backend=backend)
    if backend == "pallas":
        # autosize the pair budget exactly like the production drivers do
        # (count_pairs probe + half-octave bucket; MEASUREMENTS.md
        # "pair_budget autosizing"). A static render bench needs no
        # densification headroom — 1.1× absorbs probe/rect rounding only.
        from gaussian_garments_tpu.ops.pallas_tiles import (
            TILE_H, TILE_W, budget_bucket, count_pairs)
        from gaussian_garments_tpu.ops.projection import project_gaussians

        proj = project_gaussians(
            bundle.means3d, cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, image_width=WIDTH, image_height=HEIGHT,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, scales=bundle.scales,
            rotations=bundle.rotations, shs=bundle.shs,
            opacities=bundle.opacity[:, 0], sh_degree=0)
        npairs = int(count_pairs(proj, tiles_x=-(-WIDTH // TILE_W),
                                 tiles_y=-(-HEIGHT // TILE_H),
                                 max_tiles_side=cfg.max_tiles_side))
        cfg = RasterConfig(backend=backend,
                           pair_budget=budget_bucket(npairs, headroom=1.1))
        print(f"[bench] {npairs} pairs -> budget {cfg.pair_budget}",
              file=sys.stderr)

    @jax.jit
    def forward(b):
        # probe hygiene (CLAUDE.md): the jitted probe returns a SCALAR, read
        # back inside the timed window — `block_until_ready` on a ~8 MB image
        # under-reports through the tunnel, and megabyte per-call outputs can
        # show phantom ~2 ms/MB costs in a degraded tunnel process
        out = render(cam, b, jnp.zeros(3), config=cfg)
        return out["render"].sum() + out["alpha"].sum()

    @jax.jit
    def fwd_bwd(b):
        def loss(bb):
            out = render(cam, bb, jnp.zeros(3), config=cfg)
            return out["render"].sum() + out["alpha"].sum()
        return jax.grad(lambda bb: loss(bb))(b).means3d.sum()

    s = forward(bundle)
    jax.block_until_ready(s)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        s = forward(bundle)
    float(np.asarray(s))
    fwd_ms = (time.perf_counter() - t0) / iters * 1000.0

    g = fwd_bwd(bundle)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(10):
        g = fwd_bwd(bundle)
    jax.block_until_ready(g)
    float(np.asarray(g))
    bwd_ms = (time.perf_counter() - t0) / 10 * 1000.0
    return fwd_ms, bwd_ms


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        ms, fb_ms = _measure(sys.argv[2])
        print(f"GG_BENCH_RESULT {ms} {fb_ms}")
        return

    ms = fb_ms = None
    for backend in ("pallas", "pallas", "pallas", "tiled"):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", backend],
                capture_output=True, text=True, timeout=560,
            )
            for line in r.stdout.splitlines():
                if line.startswith("GG_BENCH_RESULT"):
                    parts = line.split()
                    ms = float(parts[1])
                    fb_ms = float(parts[2]) if len(parts) > 2 else None
                    break
        except subprocess.TimeoutExpired:
            print(f"[bench] {backend} attempt timed out (tunnel wedge); retrying",
                  file=sys.stderr)
            # a killed child leaves its chip CLAIM outstanding; an immediate
            # retry blocks on it (zero-CPU silence) and times out too —
            # let the claim expire first (~90 s measured)
            time.sleep(150)
        if ms is not None:
            break
    if ms is None:
        print(json.dumps({"metric": "1080p_render_ms_at_150k_splats",
                          "value": -1.0, "unit": "ms/frame", "vs_baseline": 0.0}))
        return

    print(json.dumps({
        "metric": "1080p_render_ms_at_150k_splats",
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(ASSUMED_BASELINE_MS / ms, 4),
        "fwd_bwd_ms": round(fb_ms, 3) if fb_ms is not None else None,
        "baseline_note": f"denominator is an ASSUMED {ASSUMED_BASELINE_MS:g} ms "
                         "CUDA forward (the reference publishes no numbers; "
                         "BASELINE.md) — read `value` as the ground truth",
    }))


if __name__ == "__main__":
    main()
