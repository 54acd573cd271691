"""Probe: does default TPU matmul precision break the SSIM eval metric?

Hypothesis (from the prod-drive eval_ssim=-4.73 / +1.217 anomaly): `_blur`'s
einsums at DEFAULT precision round f32 INPUTS to bf16 on TPU
(`preferred_element_type` only sets the accumulator). mu/E[x^2] then carry
~2e-3 absolute error, bigger than C2=9e-4, so sigma1_sq+sigma2_sq can cross
-C2 and the SSIM ratio explodes on dim/flat pixels.

As of r5, ``losses._blur`` runs at ``Precision.HIGHEST`` (the fix). This
probe A/Bs the shipped HIGHEST path against a monkeypatched default-precision
variant (the r4 bug) and against two oracles: a CPU f32 run of the shipped
code and a numpy float64 separable-conv SSIM.

Run on TPU: python scripts/probe_ssim_precision.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _ssim_numpy_f64(img1: np.ndarray, img2: np.ndarray, window_size: int = 11,
                    sigma: float = 1.5) -> float:
    """float64 separable-gaussian SSIM oracle, SAME zero-padding like _blur."""
    from gaussian_garments_tpu.utils.losses import _band_matrix_np

    bh = _band_matrix_np(img1.shape[1], window_size, sigma).astype(np.float64)
    bw = _band_matrix_np(img1.shape[2], window_size, sigma).astype(np.float64)

    def blur(x):
        # two sequential matmuls; a single 3-operand einsum without
        # optimize=True would contract naively at O(H^2 W^2)
        y = np.einsum("chw,wv->chv", x.astype(np.float64), bw)
        return np.einsum("chw,hg->cgw", y, bh)

    mu1, mu2 = blur(img1), blur(img2)
    e11, e22, e12 = blur(img1 * img1), blur(img2 * img2), blur(img1 * img2)
    s11, s22, s12 = e11 - mu1 * mu1, e22 - mu2 * mu2, e12 - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 * mu1 + mu2 * mu2 + C1) * (s11 + s22 + C2))
    return float(m.mean())


def main():
    from gaussian_garments_tpu.utils import losses

    rng = np.random.default_rng(0)
    # BRIGHT flat pair with MATERIALLY different images (~30 dB apart) — the
    # real failure region. Two conditions must hold for default-precision
    # bf16 input rounding to blow up the ratio:
    # (1) pixel magnitude ~0.7 so the absolute moment error (~2e-3) competes
    #     with C2 = 9e-4 (a dim ~0.02 pair has ~1e-6 error and never fails);
    # (2) img1 != img2 at realistic eval distance — for NEAR-IDENTICAL pairs
    #     the sigma errors are correlated (2*sigma12+C2 tracks
    #     sigma1²+sigma2²+C2) and CANCEL in the ratio, which is why r4's
    #     probes read "no difference" while the production eval (render vs
    #     GT at PSNR 34.5) measured 0.0434 with the r4 code vs 0.9952 fixed.
    # (3) PRODUCTION-SIZED axes — measured on this chip, 512² einsums lower
    #     to an f32-exact path and the default row reads clean; only
    #     ~1024+-sized contractions take the bf16-input MXU path
    #     (profile_ssim.py's 1280×940 accuracy column is the demonstrator:
    #     default |Δ| = 1.75, HIGHEST 2.1e-6).
    h, w = 1280, 1024
    base = 0.7 + 0.01 * np.linspace(0, 1, w)[None, :] * np.ones((h, 1))
    img1 = np.repeat(base[None], 3, 0) + rng.normal(0, 1e-3, (3, h, w))
    img2 = img1 + rng.normal(0, 0.03, (3, h, w))
    img1 = np.clip(img1, 0, 1).astype(np.float32)
    img2 = np.clip(img2, 0, 1).astype(np.float32)
    j1, j2 = jnp.asarray(img1), jnp.asarray(img2)

    # shipped path (HIGHEST precision as of r5)
    v_shipped = float(jax.jit(losses.ssim)(j1, j2))

    # monkeypatch a DEFAULT-precision blur to reproduce the r4 bug
    orig = losses._blur

    def blur_default(img, window_size, sigma=1.5):
        bh = jnp.asarray(losses._band_matrix_np(img.shape[2], window_size, sigma))
        bw = jnp.asarray(losses._band_matrix_np(img.shape[3], window_size, sigma))
        out = jnp.einsum("nchw,wv->nchv", img, bw,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("nchw,hg->ncgw", out, bh,
                          preferred_element_type=jnp.float32)

    losses._blur = blur_default
    try:
        v_default = float(jax.jit(losses.ssim)(j1, j2))
    finally:
        losses._blur = orig

    # CPU f32 oracle: run the SHIPPED code pinned to a CPU device
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        v_cpu = float(jax.jit(losses.ssim)(
            jax.device_put(img1, cpu), jax.device_put(img2, cpu)))

    v_f64 = _ssim_numpy_f64(img1, img2)

    # the ACTUAL r4 production bug: bf16-dtype IMAGES entering ssim().
    # ssim() now casts to f32 internally; these rows must stay in [-1,1].
    v_bf = float(jax.jit(losses.ssim)(j1.astype(jnp.bfloat16),
                                      j2.astype(jnp.bfloat16)))
    v_mix = float(jax.jit(losses.ssim)(j1.astype(jnp.bfloat16), j2))

    print(f"backend={jax.default_backend()}")
    print(f"ssim bf16/bf16 inputs           : {v_bf:+.6f}")
    print(f"ssim bf16/f32 inputs            : {v_mix:+.6f}")
    print(f"ssim DEFAULT precision (r4 bug) : {v_default:+.6f}")
    print(f"ssim HIGHEST precision (shipped): {v_shipped:+.6f}")
    print(f"ssim CPU f32 oracle             : {v_cpu:+.6f}")
    print(f"ssim numpy f64 oracle           : {v_f64:+.6f}")
    print(f"|shipped - f64 oracle|          : {abs(v_shipped - v_f64):.2e}")
    print(f"|default - f64 oracle|          : {abs(v_default - v_f64):.2e}")
    ok = (abs(v_shipped - v_f64) < 1e-3 and -1.0 <= v_shipped <= 1.0
          and -1.0 <= v_bf <= 1.0 and -1.0 <= v_mix <= 1.0)
    print(f"shipped-path OK: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
