"""A/B the RasterConfig.mxu_bf16 kernel option at bench scale (1080p/150K).

Measures forward and fwd+bwd latency for f32 vs bf16 MXU matmuls, plus the
quality delta (PSNR of the bf16 forward vs the f32 forward, and max relative
gradient difference). Decides whether bf16 can be the TPU production default.

Run: python scripts/profile_bf16.py   (TPU child w/ timeout+retry)
"""
import os
import subprocess
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


def _measure():
    import jax
    import jax.numpy as jnp

    import bench
    from gaussian_garments_tpu.renderer import RasterConfig, SplatBundle, render
    from gaussian_garments_tpu.utils.camera import make_camera
    from gaussian_garments_tpu.utils.losses import psnr

    rng = np.random.RandomState(0)
    means, scales, rots, opac, shs = bench.build_garment_splats(
        bench.N_SPLATS, rng)
    cam = make_camera(
        np.eye(3), np.array([0.0, 0.0, 2.2]), fx=2200.0, fy=2200.0,
        cx=bench.WIDTH / 2, cy=bench.HEIGHT / 2,
        width=bench.WIDTH, height=bench.HEIGHT)
    bundle = SplatBundle(
        means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        shs=jnp.asarray(shs), active_sh_degree=0)
    bg = jnp.zeros(3)

    imgs, grads = {}, {}
    for name, bf16 in (("f32", False), ("bf16", True)):
        cfg = RasterConfig(backend="pallas", mxu_bf16=bf16)

        def fwd(b, cfg=cfg):
            out = render(cam, b, bg, config=cfg)
            return out["render"]

        def loss(b, cfg=cfg):
            out = render(cam, b, bg, config=cfg)
            return (out["render"].sum() + out["depth"].sum() * 1e-3
                    + out["alpha"].sum() * 1e-2)

        def bwd(b, cfg=cfg):
            g = jax.grad(lambda bb: loss(bb, cfg))(b)
            return g

        jf, jb = jax.jit(fwd), jax.jit(bwd)
        imgs[name] = np.asarray(jf(bundle))
        grads[name] = jax.tree_util.tree_map(np.asarray, jb(bundle))
        tf = _timeit(jf, bundle)
        tb = _timeit(jb, bundle)
        print(f"{name:5s} fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms", flush=True)

    d = float(psnr(jnp.asarray(imgs["bf16"]), jnp.asarray(imgs["f32"])))
    print(f"bf16-vs-f32 forward PSNR: {d:.2f} dB", flush=True)
    for leaf in ("means3d", "opacity", "scales"):
        a = getattr(grads["f32"], leaf, None)
        b = getattr(grads["bf16"], leaf, None)
        if a is None:
            continue
        denom = np.abs(a).max() + 1e-12
        rel = np.abs(a - b).max() / denom
        print(f"grad {leaf:8s} max rel diff {rel:.4%}", flush=True)
    print("PROFILE_DONE", flush=True)


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(4):
        out_path = f"/tmp/profile_bf16_child_{attempt}.log"
        with open(out_path, "w") as fo:
            try:
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child"],
                    stdout=fo, stderr=subprocess.STDOUT, text=True, timeout=900)
            except subprocess.TimeoutExpired:
                print(f"[bench] attempt {attempt} wedged (partial in {out_path})",
                      file=sys.stderr)
                continue
        txt = open(out_path).read()
        sys.stdout.write(txt)
        if "PROFILE_DONE" in txt:
            return


if __name__ == "__main__":
    main()
