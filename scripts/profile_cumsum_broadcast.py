"""A/B the pair-space segment-constant broadcast (delta scatter + cumsum).

The production pack broadcasts k=3 int32 columns (meta, fused rank/base,
packA) from N splat segments to NP pair slots via one (N,k) row delta-scatter
+ one (NP,k) axis-0 cumsum (`pallas_tiles.py::pack_pairs`). Hypothesis: the
(NP,k) layout pads the minor dim to 128 lanes (k/128 utilization), so the
cumsum pays ~42x the bytes it needs; a single flat (k*NP,) cumsum over
column-concatenated grids with COMPENSATING first deltas (each column's
delta[0] subtracts the previous column's final value, so the running sum
flows across the column boundary with zero fixup) is dense in lanes.

Variants:
  A. production: (N,k) row scatter -> (NP,k) cumsum axis=0
  B. k separate 1-D scatters + k 1-D cumsums
  C. ONE 1-D scatter of the k*N concatenated (sorted) updates + ONE flat
     cumsum with compensating deltas
  D. row scatter (NP,k) -> transpose -> flat cumsum (transpose cost probe)

All variants must produce identical columns (checked on CPU by tests; here
asserted once on-device). Timing: jitted, scalar readback inside the window
(CLAUDE.md probe hygiene).

Run ON TPU: python scripts/profile_cumsum_broadcast.py [NP_slots] [N]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NP_SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 786_432
N = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
K = 3


def make_inputs(rng):
    area = rng.integers(0, 12, size=N).astype(np.int32)
    base = np.cumsum(area) - area
    scale = max(1.0, base[-1] / (NP_SLOTS * 0.8))
    base = (base / scale).astype(np.int32)          # keep inside the budget
    vals = rng.integers(0, 2**20, size=(N, K)).astype(np.int32)
    return jnp.asarray(base), jnp.asarray(vals)


def variant_a(base, vals):
    delta = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]], axis=0)
    grid = jnp.zeros((NP_SLOTS, K), jnp.int32).at[base].add(
        delta, mode="drop", indices_are_sorted=True)
    return jnp.cumsum(grid, axis=0)


def variant_b(base, vals):
    cols = []
    for c in range(K):
        v = vals[:, c]
        delta = jnp.concatenate([v[:1], v[1:] - v[:-1]])
        g = jnp.zeros((NP_SLOTS,), jnp.int32).at[base].add(
            delta, mode="drop", indices_are_sorted=True)
        cols.append(jnp.cumsum(g))
    return jnp.stack(cols, axis=1)


def variant_c(base, vals):
    deltas = []
    for c in range(K):
        v = vals[:, c]
        d = jnp.concatenate([v[:1], v[1:] - v[:-1]])
        if c > 0:
            # compensating first delta: cancel the previous column's final
            # value carried across the column boundary by the flat cumsum.
            # NOTE: overflow-UNSAFE — if any scatter index in column c-1
            # exceeds the budget, its delta is dropped (mode="drop") and the
            # carry this compensation assumes desyncs. This script's inputs
            # are scaled to stay inside the budget, so C is valid HERE, but
            # production pack_pairs (ops/pallas_tiles.py) uses the
            # carry-SUBTRACTION form for exactly that reason.
            d = d.at[0].add(-vals[-1, c - 1])
        deltas.append(d)
    idx = jnp.concatenate([base + c * NP_SLOTS for c in range(K)])
    flat = jnp.zeros((K * NP_SLOTS,), jnp.int32).at[idx].add(
        jnp.concatenate(deltas), mode="drop", indices_are_sorted=True)
    g = jnp.cumsum(flat)
    return jnp.stack([g[c * NP_SLOTS:(c + 1) * NP_SLOTS] for c in range(K)],
                     axis=1)


def variant_d(base, vals):
    delta = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]], axis=0)
    grid = jnp.zeros((NP_SLOTS, K), jnp.int32).at[base].add(
        delta, mode="drop", indices_are_sorted=True)
    flat = grid.T.reshape(-1)                     # (K*NP,) column-major
    # per-column independent cumsum via compensation is impossible here (the
    # deltas are already materialized as grid rows) — subtract the carry
    g = jnp.cumsum(flat)
    cols = [g[c * NP_SLOTS:(c + 1) * NP_SLOTS] for c in range(K)]
    fixed = [cols[0]] + [cols[c] - g[c * NP_SLOTS - 1] for c in range(1, K)]
    return jnp.stack(fixed, axis=1)


def bench(fn, base, vals, iters=30):
    f = jax.jit(lambda b, v: fn(b, v).sum())
    float(f(base, vals))                          # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(f(base, vals))                  # scalar readback each call
    return (time.perf_counter() - t0) / iters * 1e3, s


def main():
    rng = np.random.default_rng(0)
    base, vals = make_inputs(rng)
    ref = np.asarray(jax.jit(variant_a)(base, vals))
    for name, fn in [("A row-scatter + (NP,k) cumsum", variant_a),
                     ("B k 1-D scatters + k 1-D cumsums", variant_b),
                     ("C one flat scatter + one flat cumsum", variant_c),
                     ("D row-scatter + transpose + flat cumsum", variant_d)]:
        got = np.asarray(jax.jit(fn)(base, vals))
        assert (got == ref).all(), f"{name} mismatch"
        ms, _ = bench(fn, base, vals)
        print(f"{name:42s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
