"""Headline benchmark: 1080p forward render latency at 150K splats.

BASELINE.md north star: "1080p render ms/frame at 150K splats" on TPU,
tracked against the reference's CUDA rasterizer
(diff_gaussian_rasterization_depth_alpha). The reference repo publishes no
numbers (BASELINE.md); we assume a nominal 10 ms/frame CUDA forward at this
size for the ``vs_baseline`` ratio (>1.0 = faster than the assumed baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
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
    # ~surface-resolution splat size
    scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.3 + np.log(0.004))
    rots = rng.randn(n, 4).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.randn(n, 1)))).astype(np.float32)
    shs = rng.randn(n, 1, 3).astype(np.float32) * 0.3
    return means, scales, rots, opac, shs


def main():
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
    cfg = RasterConfig(tile_capacity=256, chunk_tiles=256, max_tiles_side=6)

    @jax.jit
    def forward(b):
        out = render(cam, b, jnp.zeros(3), config=cfg)
        return out["render"], out["alpha"]

    img, alpha = forward(bundle)
    jax.block_until_ready(img)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        img, alpha = forward(bundle)
    jax.block_until_ready(img)
    ms = (time.perf_counter() - t0) / iters * 1000.0

    print(json.dumps({
        "metric": "1080p_render_ms_at_150k_splats",
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(ASSUMED_BASELINE_MS / ms, 4),
    }))


if __name__ == "__main__":
    main()
