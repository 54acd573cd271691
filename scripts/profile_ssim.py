"""A/B the SSIM blur implementation on TPU at the s2 production shape.

Variants (each = full ssim() fwd+bwd wrt img1 at 4x3x1280x940 f32):
  conv3     two grouped depthwise convs per map, 5 maps (r1 implementation)
  conv15    one stacked (N,15,H,W) pair of grouped depthwise convs
  shift15   stacked shifted multiply-adds (constant weights)
  matmul    two banded-matrix matmuls on the MXU (blur = img @ B)

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

    def blur_shift(img):
        n, c, h, w = img.shape
        xh = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (0, 0)))
        out = float(w_np[0]) * xh[:, :, 0:h, :]
        for k in range(1, WS):
            out = out + float(w_np[k]) * xh[:, :, k:k + h, :]
        xw = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        out = float(w_np[0]) * xw[:, :, :, 0:w]
        for k in range(1, WS):
            out = out + float(w_np[k]) * xw[:, :, :, k:k + w]
        return out

    def _band(size):
        b = np.zeros((size, size), np.float32)
        for k in range(WS):
            off = k - pad
            d = np.arange(max(0, -off), min(size, size - off))
            b[d, d + off] = w_np[k]
        return jnp.asarray(b)  # rows: src, cols: dst (zero boundary like SAME pad)

    bh = _band(H)
    bw = _band(W)

    def blur_matmul(img):
        # (N,C,H,W): blur W: img @ bw ; blur H: bh^T applied on H axis
        out = jnp.einsum("nchw,wv->nchv", img, bw,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("nchw,hg->ncgw", out, bh,
                          preferred_element_type=jnp.float32)

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

    def ssim_unstacked(img1, img2):  # r1 form: 5 separate blurs
        mu1, mu2 = blur_conv(img1), blur_conv(img2)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = blur_conv(img1 * img1) - mu1_sq
        s2 = blur_conv(img2 * img2) - mu2_sq
        s12 = blur_conv(img1 * img2) - mu1_mu2
        C1, C2 = 0.01**2, 0.03**2
        m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean()

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(N, C, H, W).astype(np.float32))
    img2 = jnp.asarray(rng.rand(N, C, H, W).astype(np.float32))

    variants = {
        "conv3": ssim_unstacked,
        "conv15": make_ssim(blur_conv),
        "shift15": make_ssim(blur_shift),
        "matmul": make_ssim(blur_matmul),
    }
    vals = {}
    for name, fn in variants.items():
        fwd = jax.jit(fn)
        bwd = jax.jit(lambda a, b, f=fn: jax.grad(f)(a, b).sum())
        vals[name] = float(fwd(img1, img2))
        tf = _timeit(fwd, img1, img2)
        tb = _timeit(bwd, img1, img2)
        print(f"{name:8s} fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms   "
              f"val {vals[name]:.6f}", flush=True)
    ref = vals["conv3"]
    for k, v in vals.items():
        if abs(v - ref) >= 1e-4:
            # shift15 is known to MISCOMPILE on TPU (correct on CPU); that
            # finding is why losses.py uses the matmul form
            print(f"MISMATCH {k}: {v:.6f} vs conv3 {ref:.6f}", flush=True)
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
                               capture_output=True, text=True, timeout=600)
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {attempt} wedged (timeout)", file=sys.stderr)
            continue
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-3000:])


if __name__ == "__main__":
    main()
