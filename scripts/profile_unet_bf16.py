"""A/B: SWGANUnet 512² fwd and fwd+bwd in f32 vs bf16 params+activations.

ROADMAP 3: if the StyleUNet dominates the s3 step, bf16 conv inputs double
the MXU rate ceiling. This probes the *pure-cast* extreme (params + input
cast to bf16; the depthwise blur/upfirdn convs stay f32 via dtype promotion)
— a speed upper bound and a quality lower bound for a proper mixed-precision
pass. Reports latency and the output max-abs/rel deltas vs f32.

Run: python scripts/profile_unet_bf16.py [--size 512]
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=10):
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

    from gaussian_garments_tpu.models.styleunet import SWGANUnet

    size = 512
    if "--size" in sys.argv:
        size = int(sys.argv[sys.argv.index("--size") + 1])

    # AvatarNet's shadow-net instantiation shape (models/avatar_net.py:62-67)
    sh_degree = 3
    net = SWGANUnet(inp_size=size, inp_ch=4,
                    out_ch=(sh_degree + 1) ** 2 * 3 + 3, out_size=size,
                    style_dim=size, n_mlp=2)
    key = jax.random.PRNGKey(0)
    style = jnp.ones((1, size)) / np.sqrt(float(size))
    cond = jax.random.normal(key, (1, 4, size, size))
    variables = net.init(key, style, cond)
    params, buffers = variables["params"], variables["buffers"]
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"SWGANUnet {size}²: {n_params/1e6:.1f}M params", flush=True)

    def fwd(p, c):
        return net.apply({"params": p, "buffers": buffers}, style, c)

    def loss(p, c):
        return jnp.sum(fwd(p, c) ** 2)

    outs = {}
    for name, cast in (("f32", lambda t: t), ("bf16", lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t))):
        p, c = cast(params), cast(cond)
        f = jax.jit(lambda p, c: fwd(p, c).astype(jnp.float32))
        ms_f = _timeit(f, p, c)
        outs[name] = np.asarray(f(p, c))
        g = jax.jit(lambda p, c: jax.tree_util.tree_leaves(
            jax.grad(loss)(p, c))[0].astype(jnp.float32).sum())
        ms_b = _timeit(g, p, c)
        print(f"{name}: fwd {ms_f:7.2f} ms   fwd+bwd {ms_b:7.2f} ms", flush=True)

    d = np.abs(outs["f32"] - outs["bf16"])
    scale = np.abs(outs["f32"]).max() + 1e-8
    print(f"output max-abs delta {d.max():.3e} (rel {d.max()/scale:.3e}); "
          f"f32 out range [{outs['f32'].min():.3f},{outs['f32'].max():.3f}]",
          flush=True)
    print("PROFILE_DONE", flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(4):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"] + sys.argv[1:],
                capture_output=True, text=True, timeout=1500)
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {attempt} wedged (timeout)", file=sys.stderr)
            continue
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-3000:])


if __name__ == "__main__":
    main()
