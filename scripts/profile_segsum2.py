"""Second round of pair-grad reduction probes at the s3 shape (2^21 slots,
N=262144 segments): does segment_sum cost scale with data WIDTH or dtype?
Also: cumsum dtype/width (the delta-broadcast in pack costs ~12 ms at 2^21x3
int32).
"""
import os
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


def main():
    import jax
    import jax.numpy as jnp

    NP = 1 << 21
    N = 262144
    rng = np.random.RandomState(0)
    ids_np = np.sort(rng.randint(0, N, (4720, 445)), axis=1).reshape(-1)[:NP]
    ids = jnp.asarray(ids_np.astype(np.int32))

    for w in (4, 8, 10, 16):
        data = jnp.asarray(rng.randn(NP, w).astype(np.float32))

        def f(d, i):
            return jax.ops.segment_sum(d, i, num_segments=N + 1)[:N].sum()
        print(f"  segsum f32 w={w:2d}   {_timeit(jax.jit(f), data, ids):7.2f} ms",
              flush=True)

    data10 = jnp.asarray(rng.randn(NP, 10).astype(np.float32))

    def f_bf(d, i):
        return jax.ops.segment_sum(
            d.astype(jnp.bfloat16), i, num_segments=N + 1)[:N].sum()
    print(f"  segsum bf16 w=10  {_timeit(jax.jit(f_bf), data10, ids):7.2f} ms",
          flush=True)

    def f_fewseg(d, i):
        return jax.ops.segment_sum(d, i >> 4, num_segments=N // 16 + 1).sum()
    print(f"  segsum f32 w=10 N/16 segs {_timeit(jax.jit(f_fewseg), data10, ids):7.2f} ms",
          flush=True)

    # transposed layout: data (10, NP), reduce per row via one-column segsum?
    def f_cols(d, i):
        outs = [jax.ops.segment_sum(d[:, k], i, num_segments=N + 1)[:N].sum()
                for k in range(10)]
        return sum(outs)
    print(f"  segsum f32 10x(col) {_timeit(jax.jit(f_cols), data10, ids):7.2f} ms",
          flush=True)

    # cumsum shapes (pack delta-broadcast)
    for w, dt in ((3, np.int32), (2, np.int32), (3, np.float32)):
        c = jnp.asarray(rng.randint(0, 100, (NP, w)).astype(dt))

        def g(x):
            return jnp.cumsum(x, axis=0)[::4096].sum()
        print(f"  cumsum {np.dtype(dt).name} w={w}  {_timeit(jax.jit(g), c):7.2f} ms",
              flush=True)

    # 1-D cumsums (separate columns)
    c1 = jnp.asarray(rng.randint(0, 100, (NP,)).astype(np.int32))

    def g1(x):
        return jnp.cumsum(x)[::4096].sum()
    print(f"  cumsum int32 1-D   {_timeit(jax.jit(g1), c1):7.2f} ms", flush=True)
    print("PROFILE_DONE", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    main()
