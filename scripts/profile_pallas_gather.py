"""Can a Pallas kernel beat XLA's gather? Table resident in VMEM, indices
streamed, one output block per grid step."""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 151_552          # table rows (150K rounded to 128·1184)
NP = 2_097_152       # gathered elements
BLK = 8192           # indices per grid step


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(N).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, NP).astype(np.int32))

    # --- 1-column gather: out[p] = table[idx[p]] ---
    def kern(idx_ref, tab_ref, out_ref):
        t = tab_ref[:].reshape(-1)
        out_ref[:] = t[idx_ref[:]]

    def pallas_gather(idx, table):
        grid = NP // BLK
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((8, BLK // 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N // 128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BLK // 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NP // (BLK // 8), BLK // 8), jnp.float32),
        )(idx.reshape(-1, BLK // 8), table.reshape(N // 128, 128))

    try:
        f = jax.jit(lambda i, t: pallas_gather(i, t))
        out = f(idx, table)
        ref = table[idx]
        ok = np.allclose(np.asarray(out).reshape(-1), np.asarray(ref))
        print(f"pallas_gather1 ok={ok}  {_timeit(f, idx, table):8.2f} ms", flush=True)
    except Exception as e:
        print(f"pallas_gather1 FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

    def f_xla(i, t):
        return t[i]
    print(f"xla_gather1    {_timeit(jax.jit(f_xla), idx, table):8.2f} ms", flush=True)

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
