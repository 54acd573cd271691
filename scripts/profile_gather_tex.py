"""A/B the apply_shadow texture gather (262K texels x 51ch from a 512^2
texture, 8.5 ms fwd standalone): current jnp.take vs lax.gather with
sorted/unique hints vs the dense-texel floor (pure reshape), and the
scatter VJP of each.
"""
import os
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
    o = None
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    res, C = 512, 51
    G = 220_000  # realistic partial UV coverage
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.randn(C, res, res).astype(np.float32))
    flat_idx = jnp.asarray(np.sort(rng.choice(res * res, G, replace=False)).astype(np.int32))

    t = lambda name, fn, *a: print(
        f"{name:28s} {_timeit(jax.jit(fn), *a):7.2f} ms", flush=True)

    def cur(tx):
        flat = tx.transpose(1, 2, 0).reshape(res * res, -1)
        return flat[flat_idx]
    t("take_cur_fwd", lambda tx: cur(tx).sum(), tex)
    t("take_cur_fwd+bwd", jax.grad(lambda tx: cur(tx).sum()), tex)

    def hinted(tx):
        flat = tx.transpose(1, 2, 0).reshape(res * res, C)
        out = jax.lax.gather(
            flat, flat_idx[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, C), indices_are_sorted=True, unique_indices=True,
            mode=jax.lax.GatherScatterMode.CLIP)
        return out
    t("gather_hinted_fwd", lambda tx: hinted(tx).sum(), tex)
    t("gather_hinted_fwd+bwd", jax.grad(lambda tx: hinted(tx).sum()), tex)

    # dense floor: all texels are splats; gather == reshape
    def dense(tx):
        return tx.transpose(1, 2, 0).reshape(res * res, C)
    t("dense_fwd", lambda tx: dense(tx).sum(), tex)
    t("dense_fwd+bwd", jax.grad(lambda tx: dense(tx).sum()), tex)

    # no-transpose variant: gather lanes-major (C, res*res) columns? cost of
    # the transpose alone:
    t("transpose_only", lambda tx: tx.transpose(1, 2, 0).reshape(res * res, C).sum(), tex)
    print("PROFILE_DONE", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    main()
