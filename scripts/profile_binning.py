"""Decompose the 1080p/150K forward-render latency into stages on the TPU.

Times (separately jitted, scalar-readback-forced, loop-averaged):
  proj        EWA projection
  cand        candidate-pair generation (rects, tile ids, depth ranks)
  sort        the (tile,depth) pair sort
  tables      counts scatter + cumsum + work-item tables
  gather      pair-space feature gather
  kernel      Pallas composite kernel
  full        whole forward (render)

Run: python scripts/profile_binning.py          (spawns a TPU child w/ timeout)
     python scripts/profile_binning.py --child  (the measurement itself)
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SPLATS = 150_000
WIDTH, HEIGHT = 1920, 1080
PAIR_BUDGET = 2_097_152
SIDE = 6
ITERS = 20


def _timeit(fn, *args, iters=ITERS):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # force a scalar readback (tunnel makes block_until_ready under-report)
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(leaves[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(leaves[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def _measure():
    import jax
    import jax.numpy as jnp

    from bench import build_garment_splats
    from gaussian_garments_tpu.ops import pallas_tiles as PT
    from gaussian_garments_tpu.ops.projection import project_gaussians
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
    tiles_x, tiles_y = -(-WIDTH // PT.TILE_W), -(-HEIGHT // PT.TILE_H)

    def proj_fn(b):
        return project_gaussians(
            b.means3d, cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, image_width=WIDTH, image_height=HEIGHT,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            scales=b.scales, rotations=b.rotations, shs=b.shs,
            opacities=b.opacity.reshape(-1), sh_degree=0)

    proj = jax.jit(proj_fn)(bundle)
    print(f"proj    {_timeit(jax.jit(proj_fn), bundle):8.2f} ms", flush=True)

    pack = jax.jit(lambda p: PT.pack_pairs(
        p, tiles_x=tiles_x, tiles_y=tiles_y, max_tiles_side=SIDE,
        pair_budget=PAIR_BUDGET))
    pairs = pack(proj)
    nv = int(pairs.n_valid)
    print(f"pack    {_timeit(pack, proj):8.2f} ms   (n_valid={nv})", flush=True)

    # --- sub-stages of pack_pairs (mirrors its internals) ---
    num_tiles = tiles_x * tiles_y

    def cand_fn(p):
        r = p.radii.astype(jnp.float32)
        m = p.means2d
        x0 = jnp.clip(jnp.floor((m[:, 0] - r) / PT.TILE_W), 0, tiles_x).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((m[:, 1] - r) / PT.TILE_H), 0, tiles_y).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((m[:, 0] + r + PT.TILE_W - 1) / PT.TILE_W) + 1, 0, tiles_x).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((m[:, 1] + r + PT.TILE_H - 1) / PT.TILE_H) + 1, 0, tiles_y).astype(jnp.int32)
        alive = p.radii > 0
        off = jnp.arange(SIDE * SIDE, dtype=jnp.int32)
        tx = x0[:, None] + (off % SIDE)[None, :]
        ty = y0[:, None] + (off // SIDE)[None, :]
        pair_valid = alive[:, None] & (tx < x1[:, None]) & (ty < y1[:, None])
        tile_id = jnp.where(pair_valid, ty * tiles_x + tx, num_tiles)
        order = jnp.argsort(p.depth)
        rank = jnp.zeros((N_SPLATS,), jnp.int32).at[order].set(
            jnp.arange(N_SPLATS, dtype=jnp.int32))
        key = (tile_id << 18) | rank[:, None]
        return key

    key = jax.jit(cand_fn)(proj)
    print(f"cand    {_timeit(jax.jit(cand_fn), proj):8.2f} ms", flush=True)

    def sort_fn(k):
        splat_id = jnp.broadcast_to(
            jnp.arange(N_SPLATS, dtype=jnp.int32)[:, None], k.shape)
        sk, ss = jax.lax.sort((k.reshape(-1), splat_id.reshape(-1)), num_keys=1)
        return sk, ss

    sorted_key, sorted_splat = jax.jit(sort_fn)(key)
    print(f"sort    {_timeit(jax.jit(sort_fn), key):8.2f} ms   "
          f"(5.4M key+payload)", flush=True)

    def sort1_fn(k):
        return jax.lax.sort(k.reshape(-1))

    print(f"sort1   {_timeit(jax.jit(sort1_fn), key):8.2f} ms   "
          f"(5.4M key only)", flush=True)

    kc = jax.jit(lambda k: jax.lax.sort(k.reshape(-1)[:PAIR_BUDGET]))
    print(f"sort1c  {_timeit(kc, key):8.2f} ms   (2.1M key only)", flush=True)

    def tables_fn(st):
        counts = jnp.zeros((num_tiles + 1,), jnp.int32).at[st].add(1)[:num_tiles]
        starts = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        ends = starts + counts
        n_items = jnp.where(counts > 0, (ends - 1) // PT.CHUNK - starts // PT.CHUNK + 1, 1)
        item_starts = (jnp.cumsum(n_items) - n_items).astype(jnp.int32)
        np_real = PAIR_BUDGET
        w_cap = np_real // PT.CHUNK + num_tiles
        boundary = jnp.zeros((w_cap,), jnp.int32).at[item_starts].add(1)
        tile_of_item = jnp.clip(jnp.cumsum(boundary).astype(jnp.int32) - 1, 0, num_tiles - 1)
        k_of_item = jnp.arange(w_cap, dtype=jnp.int32) - item_starts[tile_of_item]
        chunk_of_item = starts[tile_of_item] // PT.CHUNK + k_of_item
        return counts, starts, tile_of_item, k_of_item, chunk_of_item

    sorted_tile = (sorted_key[:PAIR_BUDGET] >> 18).astype(jnp.int32)
    print(f"tables  {_timeit(jax.jit(tables_fn), sorted_tile):8.2f} ms", flush=True)

    def gather_fn(p, ss):
        zrow = jnp.zeros((N_SPLATS,))
        feats_cols = jnp.stack([
            p.means2d[:, 0], p.means2d[:, 1],
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.opacity, p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2], p.depth,
            zrow, zrow, zrow, zrow, zrow, zrow], axis=0)
        return jnp.take(feats_cols, ss[:PAIR_BUDGET], axis=1)

    print(f"gather  {_timeit(jax.jit(gather_fn), proj, sorted_splat):8.2f} ms  "
          f"(axis=1 of (16,N))", flush=True)

    def gather_rows_fn(p, ss):
        feats_rows = jnp.stack([
            p.means2d[:, 0], p.means2d[:, 1],
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.opacity, p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2], p.depth,
        ], axis=1)                                    # (N, 10)
        g = jnp.take(feats_rows, ss[:PAIR_BUDGET], axis=0)  # (NP, 10)
        return g.T

    print(f"gatherT {_timeit(jax.jit(gather_rows_fn), proj, sorted_splat):8.2f} ms  "
          f"(axis=0 of (N,10) + transpose)", flush=True)

    kern = jax.jit(lambda pr: PT.composite_tiles_pallas(
        pr, tiles_x=tiles_x, tiles_y=tiles_y))
    print(f"kernel  {_timeit(kern, pairs):8.2f} ms", flush=True)

    cfg = RasterConfig(backend="pallas")
    full = jax.jit(lambda b: render(cam, b, jnp.zeros(3), config=cfg)["render"])
    print(f"full    {_timeit(full, bundle):8.2f} ms", flush=True)

    def loss(b):
        out = render(cam, b, jnp.zeros(3), config=cfg)
        return out["render"].mean() + out["alpha"].mean()

    fwdbwd = jax.jit(jax.grad(lambda b: loss(b)))
    print(f"fwd+bwd {_timeit(fwdbwd, bundle):8.2f} ms", flush=True)

    bwd_pairs = jax.jit(lambda pr, ct: PT._backward_tiles_pallas_profile(
        pr, ct, tiles_x=tiles_x, tiles_y=tiles_y))
    cot = jnp.zeros((tiles_x * tiles_y + 1, 8, 256))
    print(f"bwdkern {_timeit(bwd_pairs, pairs, cot):8.2f} ms", flush=True)

    pg = bwd_pairs(pairs, cot)

    def segsum(pgr, prs):
        npr = prs.sorted_rank.shape[0]
        data = pgr[0:10, :npr].T
        total_pairs = jnp.sum(prs.counts)
        ids = jnp.where(jnp.arange(npr) < total_pairs, prs.sorted_rank, N_SPLATS)
        seg = jax.ops.segment_sum(data, ids, num_segments=N_SPLATS + 1)[:N_SPLATS]
        return jnp.take(seg, prs.rank, axis=0)

    print(f"segsum  {_timeit(jax.jit(segsum), pg, pairs):8.2f} ms  "
          f"(2.1M x 10 rows -> 150K)", flush=True)

    def tileimg(g):
        return PT._tile_img(g, tiles_x, tiles_y)

    g5 = jnp.zeros((5, HEIGHT, WIDTH))
    print(f"tileimg {_timeit(jax.jit(tileimg), g5):8.2f} ms", flush=True)
    print("PROFILE_DONE", flush=True)


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(3):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=420,
            )
        except subprocess.TimeoutExpired:
            print(f"[profile] attempt {attempt} wedged (timeout)", file=sys.stderr)
            continue
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-2000:])
        print(f"[profile] attempt {attempt} incomplete; retrying", file=sys.stderr)


if __name__ == "__main__":
    main()
