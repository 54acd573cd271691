"""Isolate sub-ops of the compact-generation binning path on TPU."""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 150_000
BUDGET = 2_097_152
TILES_X, TILES_Y = 120, 68
SIDE = 6


def _timeit(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
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

    rng = np.random.RandomState(0)
    area_np = rng.randint(0, 37, N).astype(np.int32)
    scale = BUDGET / max(area_np.sum(), 1) * 0.95
    area_np = (area_np * scale).astype(np.int32)
    area = jnp.asarray(area_np)
    meta = jnp.asarray(rng.randint(0, 1 << 19, N).astype(np.int32))
    rank = jnp.asarray(rng.permutation(N).astype(np.int32))
    key_rand = jnp.asarray(rng.randint(0, 1 << 31, BUDGET, dtype=np.int64).astype(np.int32))

    def f_base(a):
        return jnp.cumsum(a) - a
    base = jax.jit(f_base)(area).astype(jnp.int32)
    print(f"cumsumN  {_timeit(jax.jit(f_base), area):8.2f} ms", flush=True)

    def f_heads(b):
        return jnp.zeros((BUDGET,), jnp.int32).at[b].add(1, mode="drop", indices_are_sorted=True)
    heads = jax.jit(f_heads)(base)
    print(f"heads    {_timeit(jax.jit(f_heads), base):8.2f} ms", flush=True)

    def f_heads_unsorted(b):
        return jnp.zeros((BUDGET,), jnp.int32).at[b].add(1, mode="drop")
    print(f"heads_u  {_timeit(jax.jit(f_heads_unsorted), base):8.2f} ms", flush=True)

    def f_seg(h):
        return jnp.cumsum(h) - 1
    seg = jax.jit(f_seg)(heads)
    print(f"cumsumB  {_timeit(jax.jit(f_seg), heads):8.2f} ms", flush=True)

    def f_gather1(s, m):
        return m[s]
    print(f"gath1    {_timeit(jax.jit(f_gather1), seg, meta):8.2f} ms  (2.1M from 150K)", flush=True)

    def f_gather3(s, m, r, b):
        return m[s], r[s], b[s]
    print(f"gath3    {_timeit(jax.jit(f_gather3), seg, meta, rank, base):8.2f} ms", flush=True)

    def f_gather_rows(s, m, r, b):
        tab = jnp.stack([m, r, b], axis=1)   # (N,3)
        g = jnp.take(tab, s, axis=0)
        return g[:, 0], g[:, 1], g[:, 2]
    print(f"gathrow  {_timeit(jax.jit(f_gather_rows), seg, meta, rank, base):8.2f} ms", flush=True)

    def f_ladder(s, m, b):
        ms = m[s]
        p = jnp.arange(BUDGET, dtype=jnp.int32)
        j = p - b[s]
        ws = (ms >> 3) & 0x7
        jy = jnp.zeros_like(j)
        for k in range(1, SIDE):
            jy += (j >= k * ws).astype(jnp.int32)
        jx = j - jy * ws
        tile = (ms >> 6) + jy * TILES_X + jx
        return tile
    print(f"ladder   {_timeit(jax.jit(f_ladder), seg, meta, base):8.2f} ms  (incl 2 gathers)", flush=True)

    def f_sort(k):
        return jax.lax.sort(k)
    skey = jax.jit(f_sort)(key_rand)
    print(f"sortB    {_timeit(jax.jit(f_sort), key_rand):8.2f} ms  (2.1M key-only)", flush=True)

    from gaussian_garments_tpu.ops.pallas_tiles import _lower_bound
    q = jnp.arange(TILES_X * TILES_Y + 1, dtype=jnp.int32) << 18
    print(f"lowerb   {_timeit(jax.jit(lambda s: _lower_bound(s, q)), skey):8.2f} ms", flush=True)

    print("PROFILE_DONE", flush=True)


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(3):
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "--child"],
                           capture_output=True, text=True, timeout=900)
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-2000:])


if __name__ == "__main__":
    main()
