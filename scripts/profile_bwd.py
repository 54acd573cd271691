"""Decompose fwd+bwd at bench scale (1080p, 150K splats) via CUMULATIVE
jitted prefixes (small args in, scalar out — big-arg jits are re-staged
through the TPU tunnel and time garbage; CLAUDE.md probe hygiene).

Ladder: proj | +pack | +fwd kernel | +assembly | +cot prep | +bwd kernel |
+segsum+take | full production VJP (grad wrt 3D params).
Stage cost = difference of consecutive prefix timings.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import N_SPLATS, WIDTH, HEIGHT, build_garment_splats  # noqa: E402


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
    import functools

    import jax
    import jax.numpy as jnp

    from gaussian_garments_tpu.ops import pallas_tiles as PT
    from gaussian_garments_tpu.ops.projection import project_gaussians
    from gaussian_garments_tpu.utils.camera import make_camera

    packed = "--packed" in sys.argv

    rng = np.random.RandomState(0)
    means, scales, rots, opac, shs = build_garment_splats(N_SPLATS, rng)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 2.2]), fx=2200.0,
                      fy=2200.0, cx=WIDTH / 2, cy=HEIGHT / 2,
                      width=WIDTH, height=HEIGHT)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(opac), jnp.asarray(shs))
    tiles_x, tiles_y = -(-WIDTH // PT.TILE_W), -(-HEIGHT // PT.TILE_H)
    num_tiles = tiles_x * tiles_y

    def proj_of(means3d, scales, rots, opac, shs):
        p = project_gaussians(
            means3d, cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, image_width=WIDTH, image_height=HEIGHT,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, scales=scales,
            rotations=rots, shs=shs, opacities=opac[:, 0], sh_degree=0)
        return jax.tree_util.tree_map(lambda x: x[None], p)

    # autosized like bench.py / the drivers (pair-space op costs are budget-
    # static; a hardcoded 2M budget hid every real-pair-count change)
    npairs = int(PT.count_pairs(
        jax.tree_util.tree_map(lambda x: x[0], proj_of(*args)),
        tiles_x=tiles_x, tiles_y=tiles_y, max_tiles_side=6))
    BUDGET = PT.budget_bucket(npairs, headroom=1.1)
    print(f"[profile_bwd] {npairs} pairs -> budget {BUDGET}", flush=True)

    def pack_of(*a):
        projs = proj_of(*a)
        return PT._pack_and_flatten(
            projs, tiles_x=tiles_x, tiles_y=tiles_y, max_tiles_side=6,
            pair_budget=BUDGET, feats_packed=packed)

    def fwdk_of(*a):
        flat = pack_of(*a)
        out = PT.composite_tiles_flat(flat, tiles_x=tiles_x, tiles_y=tiles_y,
                                      n_cams=1)
        return flat, out

    def asm_of(*a):
        flat, out = fwdk_of(*a)
        img, depth, alpha = PT._flat_images(
            out, jnp.zeros(3), tiles_x=tiles_x, tiles_y=tiles_y, n_cams=1,
            image_height=HEIGHT, image_width=WIDTH)
        return flat, out, img, alpha

    def cot_of(*a):
        flat, out, img, alpha = asm_of(*a)
        g_img = jnp.ones_like(img)
        g_alpha_eff = -jnp.einsum("c,bchw->bhw", jnp.zeros(3), g_img)
        cot_img = jnp.concatenate(
            [g_img, jnp.zeros_like(alpha), g_alpha_eff[:, None]], axis=1)
        cot5 = jax.vmap(lambda ci: PT._tile_img(ci, tiles_x, tiles_y))(cot_img)
        cot5 = cot5.reshape(num_tiles, 5, PT.PIX)
        cot_tiles = jnp.zeros((num_tiles + 1, 8, PT.PIX), jnp.float32)
        cot_tiles = jax.lax.dynamic_update_slice(cot_tiles, cot5, (0, 0, 0))
        cot_tiles = jax.lax.dynamic_update_slice(
            cot_tiles, out[:, 5:6, :], (0, 5, 0))
        live_k = out[:, 7, 0].astype(jnp.int32)
        return flat, cot_tiles, live_k

    def bwdk_of(*a):
        flat, cot_tiles, live_k = cot_of(*a)
        pg, vis = PT.backward_tiles_flat(flat, cot_tiles, live_k,
                                         tiles_x=tiles_x, tiles_y=tiles_y,
                                         n_cams=1)
        return flat, pg, vis

    def segsum_of(*a):
        flat, pg, vis = bwdk_of(*a)
        np_real = flat.sorted_rank.shape[1]
        n = N_SPLATS
        data = pg[0:10, :np_real].T
        total_pairs = jnp.sum(flat.counts[:-1])
        vis_pair = jnp.repeat(vis, PT.CHUNK)[:np_real]
        ids = jnp.where(vis_pair & (jnp.arange(np_real) < total_pairs),
                        flat.sorted_rank[0], n)
        seg = jax.ops.segment_sum(data, ids, num_segments=n + 1)[:n]
        return jnp.take(seg, flat.rank[0], axis=0)

    def full_vjp(*a):
        def loss(a5):
            projs = proj_of(*a5)
            img, depth, alpha, _, _ = PT._rasterize_flat_core(
                projs, jnp.zeros(3), HEIGHT, WIDTH, 6, BUDGET, False, False,
                packed)
            return img.sum() + alpha.sum()
        return jax.grad(loss)(a)

    ladder = [
        ("proj", jax.jit(lambda *a: sum(x.sum() for x in
                                        jax.tree_util.tree_leaves(proj_of(*a))))),
        ("pack", jax.jit(lambda *a: pack_of(*a).feats_t.astype(jnp.float32).sum())),
        ("fwdk", jax.jit(lambda *a: fwdk_of(*a)[1].sum())),
        ("asm", jax.jit(lambda *a: asm_of(*a)[2].sum())),
        ("cot", jax.jit(lambda *a: cot_of(*a)[1].sum())),
        ("bwdk", jax.jit(lambda *a: bwdk_of(*a)[1].sum())),
        ("segsum", jax.jit(lambda *a: segsum_of(*a).sum())),
        ("fullvjp", jax.jit(lambda *a: sum(x.sum() for x in full_vjp(*a)))),
    ]
    prev = 0.0
    for name, fn in ladder:
        ms = _timeit(fn, *args)
        print(f"{name:8s} cum {ms:7.2f} ms   delta {ms - prev:7.2f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    main()
