"""General 2.1M-element gather from a VMEM-resident table via two Mosaic
dynamic_gathers per step (row fetch along sublanes, then lane select).

Table (R,128) f32; per grid step processes R elements:
  A[i,j] = T[hi[i,j], j]      (sublane gather, hi broadcast across lanes)
  out[i,j] = A[i, lo[i,j]]    (lane gather, lo broadcast across lanes)
  column 0 of out = the gathered values (all lanes equal).
Writes a (R_pack, 128) block = R elements per step... output layout:
step s covers elements [s*R, (s+1)*R): out block (R//128? ...) we emit
(R, 128) and keep lane 0?? -> instead emit all 128 lanes and let the caller
slice; simpler: emit (8, R/8*?)... keep it simple: out block (R,128) where
every lane holds the value; caller takes [:, 0].
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 1280              # table sublanes (128·R slots = 163840 ≥ 150K)
NP = 2_097_152 + 1024 # padded to a multiple of R... adjusted below


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

    n_slots = R * 128
    npad = ((2_097_152 + R - 1) // R) * R
    grid = npad // R

    rng = np.random.RandomState(0)
    tab = jnp.asarray(rng.randn(R, 128).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n_slots, npad).astype(np.int32))

    def kern(idx_ref, tab_ref, out_ref):
        ii = idx_ref[:]                      # (R, 1) -> broadcast manually
        hi = jnp.broadcast_to(ii >> 7, (R, 128))
        lo = jnp.broadcast_to(ii & 127, (R, 128))
        a = jnp.take_along_axis(tab_ref[:], hi, axis=0)
        out_ref[:] = jnp.take_along_axis(a, lo, axis=1)[:, 0:1]

    def run(idx, tab):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * R, 1), jnp.float32),
        )(idx.reshape(grid * R, 1), tab)

    try:
        f = jax.jit(run)
        out = np.asarray(f(idx, tab)).reshape(-1)
        ref = np.asarray(tab).reshape(-1)[np.asarray(idx)]
        print(f"pallas 2-step ok={np.allclose(out, ref)}  "
              f"{_timeit(f, idx, tab):8.3f} ms /2.1M", flush=True)
    except Exception as e:
        import traceback
        print(f"pallas 2-step FAILED: {traceback.format_exc()[-1200:]}", flush=True)

    def f_xla(i, t):
        return t.reshape(-1)[i]
    print(f"xla gather     {_timeit(jax.jit(f_xla), idx, tab):8.3f} ms /2.1M", flush=True)

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
