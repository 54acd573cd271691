"""Stage-2 jitted training-step latency at production scale on TPU.

The real s2 workload (MEASUREMENTS.md "Stage-2 training step"): face frames →
k-camera batched Pallas render fwd+bwd → masked L1+SSIM+energies → Adam. Uses
the synthetic scene at 4 cams × 940×1280 with a 64×64 cloth grid (8192
splats), plus an opacity-reset variant (most splats at 0.01 opacity) showing
the opacity-aware tight-extent culling on the training regime.

Run: python scripts/bench_s2_step.py     (spawns a TPU child w/ timeout+retry)
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
    import jax.numpy as jnp
    from argparse import ArgumentParser

    from gaussian_garments_tpu.config import OptimizationParams
    from gaussian_garments_tpu.data import synthetic as syn
    from gaussian_garments_tpu.models import gaussian as G
    from gaussian_garments_tpu.models import mesh_gaussian as MG
    from gaussian_garments_tpu.models import mesh_model as MM
    from gaussian_garments_tpu.renderer import BatchedCameras, RasterConfig
    from gaussian_garments_tpu.training import s2 as S2

    parser = ArgumentParser()
    opt = OptimizationParams(parser).extract(parser.parse_args([]))
    cams, verts, faces, uvs, colors = syn.make_scene(
        n_cams=4, nx=64, ny=64, width=940, height=1280)
    params, aux, binding, _ = MG.create_from_template(
        verts, faces, colors, max_sh_degree=0)
    mesh = MM.create(verts, faces)
    state = S2.init_state(params, aux, binding, mesh)
    step = S2.make_s2_step(opt, mode="template_p1", use_body=False,
                           raster_cfg=RasterConfig(backend="pallas"))
    batch = BatchedCameras.from_cameras(cams)
    bg = jnp.zeros(3)

    def run(st):
        st2, ld, m = step(st, batch, bg, 1.6e-3, 1.6e-3)
        return st2

    n = int(np.asarray(state.aux.alive).sum())
    ms = _timeit(run, state)
    print(f"s2_step  {ms:8.2f} ms  ({n} splats, 4 cams @940x1280 "
          f"-> {1000.0/ms:.1f} steps/s)", flush=True)

    # opacity-reset regime: inverse_sigmoid(0.01) opacities like
    # reset_opacity_state — the tight extents should shrink the pair count
    lowop = state.replace(params=state.params.replace(
        opacity=jnp.full_like(state.params.opacity, float(np.log(0.01 / 0.99)))))
    ms2 = _timeit(run, lowop)
    print(f"s2_step_lowop {ms2:8.2f} ms  (same scene, opacity 0.01)", flush=True)

    if "--decompose" in sys.argv:
        import jax
        from gaussian_garments_tpu.models import gaussian as GM
        from gaussian_garments_tpu.renderer import SplatBundle, render_batch
        from gaussian_garments_tpu.utils.losses import l1_loss, ssim

        cfg = RasterConfig(backend="pallas")
        frames = MG.compute_face_frames(state.mesh.v, state.mesh.f)
        bundle = SplatBundle(
            means3d=MG.world_xyz(state.params, state.binding, frames),
            opacity=GM.get_opacity(state.params) * state.aux.alive[:, None],
            scales=MG.world_scaling(state.params, state.binding, frames),
            rotations=MG.world_rotation(state.params, state.binding, frames),
            shs=GM.get_features(state.params), active_sh_degree=0)

        def fwd_only(b):
            return render_batch(batch, b, bg, config=cfg)["render"]
        print(f"render_fwd      {_timeit(jax.jit(fwd_only), bundle):8.2f} ms "
              "(4-cam batched render)", flush=True)

        def fwd_bwd(b):
            return jax.grad(lambda bb: fwd_only(bb).mean())(b)
        print(f"render_fwd+bwd  {_timeit(jax.jit(fwd_bwd), bundle):8.2f} ms",
              flush=True)

        gt = batch.image
        mask = batch.mask

        def img_losses(b):
            img = render_batch(batch, b, bg, config=cfg)["render"]
            return l1_loss(img, gt, mask) + (1.0 - ssim(img, gt, mask))  # scalar
        print(f"imgloss_fwd+bwd {_timeit(jax.jit(jax.grad(img_losses)), bundle):8.2f} ms "
              "(render + L1 + SSIM)", flush=True)

        def ssim_only(img):
            return 1.0 - ssim(img, gt, mask)
        img0 = jax.jit(fwd_only)(bundle)
        print(f"ssim_fwd+bwd    {_timeit(jax.jit(jax.grad(ssim_only)), img0):8.2f} ms "
              "(loss side alone)", flush=True)

    print("PROFILE_DONE", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(4):
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__), "--child"] + sys.argv[1:],
                               capture_output=True, text=True, timeout=420)
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {attempt} wedged (timeout)", file=sys.stderr)
            continue
        sys.stdout.write(r.stdout)
        if "PROFILE_DONE" in r.stdout:
            return
        sys.stderr.write(r.stderr[-2000:])


if __name__ == "__main__":
    main()
