"""What is the ~0.8 us/step Pallas grid overhead made of, and does grouping
two chunks per grid step actually halve it?

A/B ladder over the REAL bench work-item list (null bodies — measures grid
mechanics only, no compute):
  a. production shape: 6 prefetch refs, 1 input block, 1 output block
  b. prefetch refs merged into 2 tables (does operand count matter?)
  c. no input block (is it DMA issue cost?)
  d. no output block switching (single fixed output block)
  e. grouped: grid w/2, TWO input blocks per step (the 2-chunks-per-step
     candidate) — overhead per PAIR is what matters

Run: python scripts/profile_grid_overhead.py
"""
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
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def _measure():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_garment_splats
    from gaussian_garments_tpu.ops import pallas_tiles as PT
    from gaussian_garments_tpu.ops.projection import project_gaussians
    from gaussian_garments_tpu.utils.camera import make_camera

    W, H = 1920, 1080
    rng = np.random.RandomState(0)
    means, scales, rots, opac, shs = build_garment_splats(150_000, rng)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 2.2]), fx=2200.0, fy=2200.0,
                      cx=W / 2, cy=H / 2, width=W, height=H)
    proj = project_gaussians(
        jnp.asarray(means), cam.world_view_transform, cam.full_proj_transform,
        cam.camera_center, image_width=W, image_height=H,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, scales=jnp.asarray(scales),
        rotations=jnp.asarray(rots), shs=jnp.asarray(shs),
        opacities=jnp.asarray(opac).reshape(-1), sh_degree=0)
    tiles_x, tiles_y = -(-W // PT.TILE_W), -(-H // PT.TILE_H)
    pairs = jax.jit(lambda p: PT.pack_pairs(
        p, tiles_x=tiles_x, tiles_y=tiles_y, max_tiles_side=6,
        pair_budget=2_097_152))(proj)
    num_tiles = tiles_x * tiles_y
    w = pairs.chunk_of_item.shape[0]
    nb = pairs.feats_t.shape[1] // PT.CHUNK
    print(f"work items: {w}   blocks: {nb}", flush=True)

    out_sh = jax.ShapeDtypeStruct((num_tiles + 1, 8, PT.PIX), jnp.float32)

    # --- a. production shape ---
    def kern_a(ch, tl, kk, st, cn, tx, chunk_in, out_ref, t_ref):
        i = pl.program_id(0)

        @pl.when(kk[i] == 0)
        def _():
            out_ref[0] = jnp.zeros((8, PT.PIX), jnp.float32)
            t_ref[:] = jnp.zeros((PT.PIX, 1), jnp.float32)

    gs_a = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6, grid=(w,),
        in_specs=[pl.BlockSpec((PT.FDIM, PT.CHUNK),
                               lambda i, ch, tl, kk, st, cn, tx: (0, ch[i]),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PT.PIX),
                               lambda i, ch, tl, kk, st, cn, tx: (tl[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PT.PIX, 1), jnp.float32)])
    fa = pl.pallas_call(kern_a, grid_spec=gs_a, out_shape=out_sh)
    ja = jax.jit(lambda pr: fa(pr.chunk_of_item, pr.tile_of_item, pr.k_of_item,
                               pr.starts, pr.counts,
                               jnp.array([tiles_x], jnp.int32), pr.feats_t))
    ms = _timeit(ja, pairs)
    print(f"a. production null      {ms:8.2f} ms  ({ms*1e3/w:6.3f} us/step)", flush=True)

    # --- b. merged prefetch: one (3,W) item table + one (2,T+1) seg table ---
    item_tab = jnp.stack([pairs.chunk_of_item, pairs.tile_of_item,
                          pairs.k_of_item])
    seg_tab = jnp.stack([pairs.starts, pairs.counts])

    def kern_b(it, sg, chunk_in, out_ref, t_ref):
        i = pl.program_id(0)

        @pl.when(it[2, i] == 0)
        def _():
            out_ref[0] = jnp.zeros((8, PT.PIX), jnp.float32)
            t_ref[:] = jnp.zeros((PT.PIX, 1), jnp.float32)

    gs_b = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(w,),
        in_specs=[pl.BlockSpec((PT.FDIM, PT.CHUNK),
                               lambda i, it, sg: (0, it[0, i]),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PT.PIX),
                               lambda i, it, sg: (it[1, i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PT.PIX, 1), jnp.float32)])
    fb = pl.pallas_call(kern_b, grid_spec=gs_b, out_shape=out_sh)
    jb = jax.jit(lambda pr, it, sg: fb(it, sg, pr.feats_t))
    ms = _timeit(jb, pairs, item_tab, seg_tab)
    print(f"b. merged prefetch      {ms:8.2f} ms  ({ms*1e3/w:6.3f} us/step)", flush=True)

    # --- c. no input block ---
    def kern_c(ch, tl, kk, st, cn, tx, out_ref, t_ref):
        i = pl.program_id(0)

        @pl.when(kk[i] == 0)
        def _():
            out_ref[0] = jnp.zeros((8, PT.PIX), jnp.float32)
            t_ref[:] = jnp.zeros((PT.PIX, 1), jnp.float32)

    gs_c = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6, grid=(w,),
        in_specs=[],
        out_specs=pl.BlockSpec((1, 8, PT.PIX),
                               lambda i, ch, tl, kk, st, cn, tx: (tl[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PT.PIX, 1), jnp.float32)])
    fc = pl.pallas_call(kern_c, grid_spec=gs_c, out_shape=out_sh)
    jc = jax.jit(lambda pr: fc(pr.chunk_of_item, pr.tile_of_item, pr.k_of_item,
                               pr.starts, pr.counts,
                               jnp.array([tiles_x], jnp.int32)))
    ms = _timeit(jc, pairs)
    print(f"c. no input block       {ms:8.2f} ms  ({ms*1e3/w:6.3f} us/step)", flush=True)

    # --- d. fixed output block (no switching) ---
    def kern_d(ch, tl, kk, st, cn, tx, chunk_in, out_ref, t_ref):
        i = pl.program_id(0)

        @pl.when(kk[i] == 0)
        def _():
            out_ref[0] = jnp.zeros((8, PT.PIX), jnp.float32)
            t_ref[:] = jnp.zeros((PT.PIX, 1), jnp.float32)

    gs_d = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6, grid=(w,),
        in_specs=[pl.BlockSpec((PT.FDIM, PT.CHUNK),
                               lambda i, ch, tl, kk, st, cn, tx: (0, ch[i]),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PT.PIX),
                               lambda i, ch, tl, kk, st, cn, tx: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PT.PIX, 1), jnp.float32)])
    fd = pl.pallas_call(kern_d, grid_spec=gs_d, out_shape=out_sh)
    jd = jax.jit(lambda pr: fd(pr.chunk_of_item, pr.tile_of_item, pr.k_of_item,
                               pr.starts, pr.counts,
                               jnp.array([tiles_x], jnp.int32), pr.feats_t))
    ms = _timeit(jd, pairs)
    print(f"d. fixed output block   {ms:8.2f} ms  ({ms*1e3/w:6.3f} us/step)", flush=True)

    # --- e. grouped: w/2 steps, two input blocks per step ---
    w2 = w // 2
    cha = pairs.chunk_of_item[0::2][:w2]
    chb = pairs.chunk_of_item[1::2][:w2]
    tl2 = pairs.tile_of_item[0::2][:w2]
    kk2 = pairs.k_of_item[0::2][:w2]

    def kern_e(ca, cb, tl, kk, st, cn, tx, blk_a, blk_b, out_ref, t_ref):
        i = pl.program_id(0)

        @pl.when(kk[i] == 0)
        def _():
            out_ref[0] = jnp.zeros((8, PT.PIX), jnp.float32)
            t_ref[:] = jnp.zeros((PT.PIX, 1), jnp.float32)

    gs_e = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7, grid=(w2,),
        in_specs=[pl.BlockSpec((PT.FDIM, PT.CHUNK),
                               lambda i, ca, cb, tl, kk, st, cn, tx: (0, ca[i]),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((PT.FDIM, PT.CHUNK),
                               lambda i, ca, cb, tl, kk, st, cn, tx: (0, cb[i]),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PT.PIX),
                               lambda i, ca, cb, tl, kk, st, cn, tx: (tl[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PT.PIX, 1), jnp.float32)])
    fe = pl.pallas_call(kern_e, grid_spec=gs_e, out_shape=out_sh)
    je = jax.jit(lambda pr, a, b, t2, k2: fe(a, b, t2, k2, pr.starts, pr.counts,
                                             jnp.array([tiles_x], jnp.int32),
                                             pr.feats_t, pr.feats_t))
    ms = _timeit(je, pairs, cha, chb, tl2, kk2)
    print(f"e. grouped 2-chunk null {ms:8.2f} ms  ({ms*1e3/w2:6.3f} us/step, "
          f"{ms*1e3/w:6.3f} us/chunk)", flush=True)

    print("PROFILE_DONE", flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(4):
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__), "--child"],
                               capture_output=True, text=True, timeout=600)
        except subprocess.TimeoutExpired:
            print(f"[profile] attempt {attempt} wedged (timeout)", file=sys.stderr)
            continue
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-2000:])


if __name__ == "__main__":
    main()
