"""Probe: does default TPU matmul precision break the SSIM eval metric?

Hypothesis (from the prod-drive eval_ssim=-4.73 / +1.217 anomaly): `_blur`'s
einsums run at DEFAULT precision, which rounds f32 INPUTS to bf16 on TPU
(`preferred_element_type` only sets the accumulator). mu/E[x^2] then carry
~2e-3 absolute error, bigger than C2=9e-4, so sigma1_sq+sigma2_sq can cross
-C2 and the SSIM ratio explodes on dim/flat pixels.

Run on TPU: python scripts/probe_ssim_precision.py
"""
import functools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from gaussian_garments_tpu.utils import losses

    rng = np.random.default_rng(0)
    # dim, low-contrast pair (the failure region): values ~0.02 with tiny
    # texture + a smooth gradient, like a dark garment fold rendered twice
    h, w = 512, 512
    base = 0.02 + 0.01 * np.linspace(0, 1, w)[None, :] * np.ones((h, 1))
    img1 = np.repeat(base[None], 3, 0) + rng.normal(0, 1e-3, (3, h, w))
    img2 = img1 + rng.normal(0, 1e-3, (3, h, w))
    img1 = np.clip(img1, 0, 1).astype(np.float32)
    img2 = np.clip(img2, 0, 1).astype(np.float32)
    j1, j2 = jnp.asarray(img1), jnp.asarray(img2)

    f = jax.jit(losses.ssim)
    v_default = float(f(j1, j2))

    # monkeypatch precision to HIGHEST for the A/B
    orig = losses._blur

    def blur_hi(img, window_size, sigma=1.5):
        bh = jnp.asarray(losses._band_matrix_np(img.shape[2], window_size, sigma))
        bw = jnp.asarray(losses._band_matrix_np(img.shape[3], window_size, sigma))
        out = jnp.einsum("nchw,wv->nchv", img, bw,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("nchw,hg->ncgw", out, bh,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    losses._blur = blur_hi
    v_hi = float(jax.jit(losses.ssim)(j1, j2))
    losses._blur = orig

    # CPU f32 oracle
    with jax.default_device(jax.devices("cpu")[0]) if any(
            d.platform == "cpu" for d in jax.devices()) else _null():
        pass
    print(f"backend={jax.default_backend()}")
    print(f"ssim default precision : {v_default:.6f}")
    print(f"ssim HIGHEST precision : {v_hi:.6f}")
    print(f"delta                  : {abs(v_default - v_hi):.6f}")


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
