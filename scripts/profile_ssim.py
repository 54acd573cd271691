"""A/B the SSIM blur implementation on TPU at the s2 production shape.

r5 extension: the SSIM root-cause work proved the TPU default matmul
precision rounds MXU inputs to bf16, which corrupts the blurred moments
(sigma^2 error ~2e-3 > C2 = 9e-4) and explodes the ratio on real
render-vs-GT pairs (MEASUREMENTS.md "SSIM precision"). So the A/B now has
TWO axes — structure x dot algorithm — and an ACCURACY column vs a float64
oracle on a sensitivity-tuned pair (flat bright base + 30 dB noise; near-
identical pairs hide the bug because correlated moment errors cancel):

  structure: dense banded-Toeplitz matmul  | 128-block-banded matmul
             (~85x minimal FLOPs)           (3 diag blocks: ~0.33x dense)
  algorithm: DEFAULT (1 bf16 pass, broken) | BF16_X3 (~1.5e-5 rel) |
             HIGHEST (f32-exact, 6 passes)

Variants (each = full ssim() fwd / fwd+bwd wrt img1 at 4x3x1280x940 f32):
  conv15      one stacked (N,15,H,W) pair of grouped depthwise convs
  mm_default  dense banded matmul, default precision (r1-r4 production)
  mm_x3       dense banded matmul, BF16_BF16_F32_X3
  mm_hi       dense banded matmul, Precision.HIGHEST
  bb_default / bb_x3 / bb_hi   block-banded variants

Run: python scripts/profile_ssim.py   (TPU child w/ timeout+retry)
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WS = 11
N, C, H, W = 4, 3, 1280, 940
BLK = 128


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


def _band_np(size):
    from gaussian_garments_tpu.utils.losses import _band_matrix_np
    return _band_matrix_np(size, WS, 1.5)


def _ssim_f64(img1, img2):
    bh = _band_np(img1.shape[2]).astype(np.float64)
    bw = _band_np(img1.shape[3]).astype(np.float64)

    def blur(x):
        # BLAS matmuls — np.einsum without optimize loops at ~0.1 GFLOP/s
        n, c, h, w = x.shape
        y = (x.astype(np.float64).reshape(-1, w) @ bw).reshape(n, c, h, w)
        yt = y.transpose(0, 1, 3, 2).reshape(-1, h) @ bh
        return yt.reshape(n, c, w, h).transpose(0, 1, 3, 2)

    mu1, mu2 = blur(img1), blur(img2)
    e11, e22, e12 = blur(img1 * img1), blur(img2 * img2), blur(img1 * img2)
    s1, s2, s12 = e11 - mu1 * mu1, e22 - mu2 * mu2, e12 - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    return float((((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
                  ((mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2))).mean())


def _measure():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gaussian_garments_tpu.utils.losses import _gaussian_window_np

    w_np = _gaussian_window_np(WS, 1.5)
    pad = WS // 2

    def blur_conv(img):
        c = img.shape[1]
        win = jnp.asarray(w_np)
        kh = jnp.tile(win.reshape(1, 1, WS, 1), (c, 1, 1, 1))
        kw = jnp.tile(win.reshape(1, 1, 1, WS), (c, 1, 1, 1))
        dn = lax.conv_dimension_numbers(img.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
        out = lax.conv_general_dilated(img, kh, (1, 1), [(pad, pad), (0, 0)],
                                       dimension_numbers=dn, feature_group_count=c)
        return lax.conv_general_dilated(out, kw, (1, 1), [(0, 0), (pad, pad)],
                                        dimension_numbers=dn, feature_group_count=c)

    def make_dense(prec):
        bh = jnp.asarray(_band_np(H))
        bw = jnp.asarray(_band_np(W))

        def blur(img):
            out = jnp.einsum("nchw,wv->nchv", img, bw,
                             preferred_element_type=jnp.float32, precision=prec)
            return jnp.einsum("nchw,hg->ncgw", out, bh,
                              preferred_element_type=jnp.float32, precision=prec)
        return blur

    def _blocks(size):
        """(nc,BLK,BLK) diag/up/down block stacks of the BLK-padded band."""
        nc = -(-size // BLK)
        sp = nc * BLK
        b = np.zeros((sp, sp), np.float32)
        b[:size, :size] = _band_np(size)
        D = np.stack([b[c * BLK:(c + 1) * BLK, c * BLK:(c + 1) * BLK]
                      for c in range(nc)])
        U = np.stack([b[(c - 1) * BLK:c * BLK, c * BLK:(c + 1) * BLK]
                      if c > 0 else np.zeros((BLK, BLK), np.float32)
                      for c in range(nc)])
        L = np.stack([b[(c + 1) * BLK:(c + 2) * BLK, c * BLK:(c + 1) * BLK]
                      if c + 1 < nc else np.zeros((BLK, BLK), np.float32)
                      for c in range(nc)])
        return jnp.asarray(D), jnp.asarray(U), jnp.asarray(L), nc, sp

    def make_block(prec):
        DW, UW, LW, ncw, spw = _blocks(W)
        DH, UH, LH, nch, sph = _blocks(H)

        def blur_axis(x, D, U, L, nc, sp, size):
            # x (..., size) -> pad, chunk, 3 batched matmuls, unpad
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, sp - size)])
            xc = x.reshape(*x.shape[:-1], nc, BLK)
            zeros = jnp.zeros_like(xc[..., :1, :])
            xprev = jnp.concatenate([zeros, xc[..., :-1, :]], axis=-2)
            xnext = jnp.concatenate([xc[..., 1:, :], zeros], axis=-2)
            y = (jnp.einsum("...ck,ckv->...cv", xc, D,
                            preferred_element_type=jnp.float32, precision=prec)
                 + jnp.einsum("...ck,ckv->...cv", xprev, U,
                              preferred_element_type=jnp.float32, precision=prec)
                 + jnp.einsum("...ck,ckv->...cv", xnext, L,
                              preferred_element_type=jnp.float32, precision=prec))
            return y.reshape(*x.shape[:-1], sp)[..., :size]

        def blur(img):
            out = blur_axis(img, DW, UW, LW, ncw, spw, W)           # W axis
            out = jnp.swapaxes(
                blur_axis(jnp.swapaxes(out, 2, 3), DH, UH, LH, nch, sph, H),
                2, 3)                                                # H axis
            return out
        return blur

    def make_ssim(blur):
        def ssim(img1, img2):
            c = img1.shape[1]
            stacked = jnp.concatenate(
                [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=1)
            b = blur(stacked)
            mu1, mu2 = b[:, 0:c], b[:, c:2 * c]
            mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
            s1 = b[:, 2 * c:3 * c] - mu1_sq
            s2 = b[:, 3 * c:4 * c] - mu2_sq
            s12 = b[:, 4 * c:5 * c] - mu1_mu2
            C1, C2 = 0.01**2, 0.03**2
            m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
                (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
            return m.mean()
        return ssim

    # sensitivity-tuned pair: flat bright base (moment error ~2e-3 competes
    # with C2) + 30 dB noise (decorrelates the errors so they can't cancel)
    rng = np.random.RandomState(0)
    base = 0.7 + 0.01 * np.linspace(0, 1, W)[None, :] * np.ones((H, 1))
    i1 = np.clip(base[None, None] + rng.randn(N, C, H, W) * 1e-3, 0, 1).astype(np.float32)
    i2 = np.clip(i1 + rng.randn(N, C, H, W) * 0.03, 0, 1).astype(np.float32)
    ref64 = _ssim_f64(i1[:1], i2[:1])
    print(f"f64 oracle (first item): {ref64:+.6f}", flush=True)
    img1, img2 = jnp.asarray(i1), jnp.asarray(i2)
    img1f, img2f = img1[:1], img2[:1]

    X3 = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    HI = jax.lax.Precision.HIGHEST
    variants = {
        "conv15": make_ssim(blur_conv),
        "mm_default": make_ssim(make_dense(None)),
        "mm_x3": make_ssim(make_dense(X3)),
        "mm_hi": make_ssim(make_dense(HI)),
        "bb_default": make_ssim(make_block(None)),
        "bb_x3": make_ssim(make_block(X3)),
        "bb_hi": make_ssim(make_block(HI)),
    }
    for name, fn in variants.items():
        try:
            fwd = jax.jit(fn)
            bwd = jax.jit(lambda a, b, f=fn: jax.grad(f)(a, b).sum())
            val = float(fwd(img1f, img2f))
            tf = _timeit(fwd, img1, img2)
            tb = _timeit(bwd, img1, img2)
            print(f"{name:11s} fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms   "
                  f"val {val:+.6f}   |d-f64| {abs(val - ref64):.2e}", flush=True)
        except Exception as e:  # e.g. an algorithm unsupported on a backend
            print(f"{name:11s} UNSUPPORTED: {type(e).__name__}: {e}", flush=True)
    print("PROFILE_DONE", flush=True)


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(4):
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__), "--child"],
                               capture_output=True, text=True, timeout=900)
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {attempt} wedged (timeout)", file=sys.stderr)
            time.sleep(150)
            continue
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-3000:])


if __name__ == "__main__":
    main()
