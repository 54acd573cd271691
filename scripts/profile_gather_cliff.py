"""The 2.1M-row feature gather costs 11.4 ms from a 150K-row f32 (N,16)
table (9.6MB) but 45 ms from a 262K-row one (16.8MB) — a working-set cliff.
A/B: full f32 16-wide | two 8-wide halves | bf16 16-wide | f32 8-wide +
f32 (N,8) second half fused | varying N.
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
    rng = np.random.RandomState(0)

    for N in (131072, 262144, 524288):
        idx = jnp.asarray(rng.randint(0, N, NP).astype(np.int32))
        tab = jnp.asarray(rng.randn(N, 16).astype(np.float32))
        tab_bf = tab.astype(jnp.bfloat16)

        def g_full(t, i):
            return jnp.take(t, i, axis=0, mode="clip")[::4096, 3].sum()

        def g_halves(t, i):
            a = jnp.take(t[:, :8], i, axis=0, mode="clip")
            b = jnp.take(t[:, 8:], i, axis=0, mode="clip")
            return a[::4096, 3].sum() + b[::4096, 3].sum()

        def g_quarters(t, i):
            parts = [jnp.take(t[:, 4 * k:4 * k + 4], i, axis=0, mode="clip")
                     for k in range(4)]
            return sum(p[::4096, 3].sum() for p in parts)

        def g_bf16(t, i):
            return jnp.take(t, i, axis=0, mode="clip").astype(
                jnp.float32)[::4096, 3].sum()

        mb = N * 16 * 4 / 1e6
        print(f"N={N}  table {mb:.1f} MB", flush=True)
        print(f"  f32 16-wide   {_timeit(jax.jit(g_full), tab, idx):7.2f} ms", flush=True)
        print(f"  f32 2x8-wide  {_timeit(jax.jit(g_halves), tab, idx):7.2f} ms", flush=True)
        print(f"  f32 4x4-wide  {_timeit(jax.jit(g_quarters), tab, idx):7.2f} ms", flush=True)
        print(f"  bf16 16-wide  {_timeit(jax.jit(g_bf16), tab_bf, idx):7.2f} ms", flush=True)
    print("PROFILE_DONE", flush=True)


def narrow():
    import jax
    import jax.numpy as jnp
    NP = 1 << 21
    rng = np.random.RandomState(0)
    N = 262144
    idx = jnp.asarray(rng.randint(0, N, NP).astype(np.int32))
    for w in (10, 12, 14, 16):
        tab = jnp.asarray(rng.randn(N, w).astype(np.float32))

        def g_pad(t, i):
            g = jnp.take(t, i, axis=0, mode="clip")
            g16 = jnp.pad(g, ((0, 0), (0, 16 - w)))
            return g16[::4096, 3].sum()
        print(f"  f32 {w:2d}-wide+pad16 (tab {N*w*4/1e6:.1f}MB) "
              f"{_timeit(jax.jit(g_pad), tab, idx):7.2f} ms", flush=True)
    print("PROFILE_DONE2", flush=True)


def rowpad():
    import jax
    import jax.numpy as jnp
    NP = 1 << 21
    rng = np.random.RandomState(0)
    for N in (262144, 262152, 263168, 270336, 294912, 131072, 132096):
        idx = jnp.asarray(rng.randint(0, min(N, 262144), NP).astype(np.int32))
        tab = jnp.asarray(rng.randn(N, 16).astype(np.float32))

        def g(t, i):
            return jnp.take(t, i, axis=0, mode="clip")[::4096, 3].sum()
        print(f"  f32 16-wide N={N:7d} ({N*64/1e6:.1f}MB) "
              f"{_timeit(jax.jit(g), tab, idx):7.2f} ms", flush=True)
    print("PROFILE_DONE3", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if "--rowpad" in sys.argv:
        rowpad()
    elif "--narrow" in sys.argv:
        narrow()
    else:
        main()
