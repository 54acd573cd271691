"""Which 2D gather shapes does Mosaic support, and how fast?

A: take_along_axis(table (R,128), idx (E,128), axis=0)   sublane gather
B: take_along_axis(table (8,L),  idx (8,K),  axis=1)     lane gather
C: two-step general gather: sublane row fetch + onehot-matmul lane select
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 151_552
NP = 2_097_152


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

    rng = np.random.RandomState(0)

    # --- A: sublane gather, table (R,128), idx (E,128) ---
    R, E = N // 128, 512
    tabA = jnp.asarray(rng.randn(R, 128).astype(np.float32))
    idxA = jnp.asarray(rng.randint(0, R, (E, 128)).astype(np.int32))

    def kernA(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    def runA(idx, tab):
        return pl.pallas_call(
            kernA,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
        )(idx, tab)

    try:
        f = jax.jit(runA)
        out = np.asarray(f(idxA, tabA))
        ref = np.take_along_axis(np.asarray(tabA), np.asarray(idxA), axis=0)
        print(f"A sublane(R={R}) ok={np.allclose(out, ref)}  "
              f"{_timeit(f, idxA, tabA):8.3f} ms /{E*128} elems", flush=True)
    except Exception as e:
        print(f"A sublane FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- B: lane gather, table (8,L), idx (8,K) ---
    L, K = N // 8, 1024
    tabB = jnp.asarray(rng.randn(8, L).astype(np.float32))
    idxB = jnp.asarray(rng.randint(0, L, (8, K)).astype(np.int32))

    def kernB(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    def runB(idx, tab):
        return pl.pallas_call(
            kernB,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
        )(idxB, tabB)

    try:
        f = jax.jit(runB)
        out = np.asarray(f(idxB, tabB))
        ref = np.take_along_axis(np.asarray(tabB), np.asarray(idxB), axis=1)
        print(f"B lane(L={L}) ok={np.allclose(out, ref)}  "
              f"{_timeit(f, idxB, tabB):8.3f} ms /{8*K} elems", flush=True)
    except Exception as e:
        print(f"B lane FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- C: full general gather of NP elems via A + onehot lane select ---
    BLK = 2048  # elements per grid step
    tab = jnp.asarray(rng.randn(R, 128).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, NP).astype(np.int32))

    def kernC(idx_ref, tab_ref, out_ref):
        ii = idx_ref[:]                        # (16, 128) int32 block
        hi = ii >> 7                           # row
        lo = ii & 127                          # lane
        rows = jnp.take_along_axis(tab_ref[:], hi.reshape(BLK, 1) * jnp.ones((1, 128), jnp.int32), axis=0)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1) ==
                  lo.reshape(BLK, 1)).astype(jnp.float32)
        vals = jax.lax.dot_general(rows * onehot, jnp.ones((128, 1), jnp.float32),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        out_ref[:] = vals.reshape(BLK // 128, 128)

    def runC(idx, tab):
        grid = NP // BLK
        return pl.pallas_call(
            kernC,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NP // 128, 128), jnp.float32),
        )(idx.reshape(NP // 128, 128), tab)

    try:
        f = jax.jit(runC)
        out = np.asarray(f(idx, tab)).reshape(-1)
        ref = np.asarray(tab).reshape(-1)[np.asarray(idx)]
        print(f"C general ok={np.allclose(out, ref)}  "
              f"{_timeit(f, idx, tab):8.3f} ms /2.1M elems", flush=True)
    except Exception as e:
        print(f"C general FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

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
                           capture_output=True, text=True, timeout=600)
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-3000:])


if __name__ == "__main__":
    main()
