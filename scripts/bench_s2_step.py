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
    batch = BatchedCameras.from_cameras(cams)
    bg = jnp.zeros(3)

    # autosized pair budget, same policy as the s2 driver (probe → 1.5×
    # headroom → pow2 bucket)
    cfg0 = RasterConfig(backend="pallas")
    counts = np.asarray(S2.make_pair_counter(0, cfg0)(state, batch))
    budget = min(1 << max(15, int(np.ceil(np.log2(max(int(counts.max()) * 3 // 2, 1))))),
                 cfg0.pair_budget)
    cfg = RasterConfig(backend="pallas", pair_budget=budget)
    print(f"pair counts/cam {counts} -> pair_budget {budget}", flush=True)
    step = S2.make_s2_step(opt, mode="template_p1", use_body=False,
                           raster_cfg=cfg)

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

    if "--decompose" in sys.argv or "--render_profile" in sys.argv:
        import jax
        from gaussian_garments_tpu.models import gaussian as GM
        from gaussian_garments_tpu.renderer import SplatBundle, render_batch
        from gaussian_garments_tpu.utils.losses import l1_loss, ssim

        frames = MG.compute_face_frames(state.mesh.v, state.mesh.f)
        bundle = SplatBundle(
            means3d=MG.world_xyz(state.params, state.binding, frames),
            opacity=GM.get_opacity(state.params) * state.aux.alive[:, None],
            scales=MG.world_scaling(state.params, state.binding, frames),
            rotations=MG.world_rotation(state.params, state.binding, frames),
            shs=GM.get_features(state.params), active_sh_degree=0)

    if "--render_profile" in sys.argv:
        # stage decomposition of the batched render at TRAINING scale
        # (profile_binning.py does the same at the 1080p/150K bench scale)
        from gaussian_garments_tpu.ops import pallas_tiles as PT
        from gaussian_garments_tpu.ops.projection import project_gaussians

        W, H = batch.width, batch.height
        tiles_x, tiles_y = -(-W // PT.TILE_W), -(-H // PT.TILE_H)

        def proj_one(b, wv, fp, cc, tx, ty):
            return project_gaussians(
                b.means3d, wv, fp, cc, image_width=W, image_height=H,
                tanfovx=tx, tanfovy=ty, scales=b.scales, rotations=b.rotations,
                shs=b.shs, opacities=b.opacity[:, 0], sh_degree=0)

        def proj_batch(b):
            return jax.vmap(proj_one, in_axes=(None, 0, 0, 0, 0, 0))(
                b, batch.world_view, batch.full_proj, batch.campos,
                batch.tanfovx, batch.tanfovy)
        projd = jax.jit(proj_batch)(bundle)
        print(f"rp_proj         {_timeit(jax.jit(lambda b: proj_batch(b).means2d.sum()), bundle):8.2f} ms",
              flush=True)

        def pack_batch(p):
            return jax.vmap(lambda q: PT.pack_pairs(
                q, tiles_x=tiles_x, tiles_y=tiles_y,
                max_tiles_side=cfg.max_tiles_side,
                pair_budget=cfg.pair_budget))(p)
        packed = jax.jit(pack_batch)(projd)
        print(f"rp_pack         {_timeit(jax.jit(lambda p: pack_batch(p).feats_t.sum()), projd):8.2f} ms "
              f"(n_valid/cam {np.asarray(packed.n_valid)})", flush=True)

        def kernel_fwd(pk):
            out = jax.vmap(lambda q: PT.composite_tiles_pallas(
                q, tiles_x=tiles_x, tiles_y=tiles_y))(pk)
            return out.sum()
        print(f"rp_kernel_fwd   {_timeit(jax.jit(kernel_fwd), packed):8.2f} ms",
              flush=True)

        def fwd(b):
            return render_batch(batch, b, bg, config=cfg)["render"].mean()
        print(f"rp_full_fwd     {_timeit(jax.jit(fwd), bundle):8.2f} ms", flush=True)

        def fwd_bwd(b):
            g = jax.grad(fwd)(b)
            return g.means3d.sum() + g.opacity.sum() + g.scales.sum()
        print(f"rp_full_fwd+bwd {_timeit(jax.jit(fwd_bwd), bundle):8.2f} ms",
              flush=True)

        # every measured fn returns a SCALAR: the timing readback would drag
        # a full 4x3x1280x940 image (~19 MB) through the tunnel otherwise
        def fwd_only(b):
            return render_batch(batch, b, bg, config=cfg)["render"]

        def fwd_scalar(b):
            return fwd_only(b).mean()
        print(f"render_fwd      {_timeit(jax.jit(fwd_scalar), bundle):8.2f} ms "
              "(4-cam batched render)", flush=True)

        def fwd_bwd(b):
            g = jax.grad(lambda bb: fwd_only(bb).mean())(b)
            return g.means3d.sum() + g.opacity.sum() + g.scales.sum()
        print(f"render_fwd+bwd  {_timeit(jax.jit(fwd_bwd), bundle):8.2f} ms",
              flush=True)

        gt = batch.image
        mask = batch.mask

        def img_losses(b):
            img = render_batch(batch, b, bg, config=cfg)["render"]
            return l1_loss(img, gt, mask) + (1.0 - ssim(img, gt, mask))  # scalar
        def imgloss_bwd(b):
            g = jax.grad(img_losses)(b)
            return g.means3d.sum() + g.opacity.sum() + g.scales.sum()
        print(f"imgloss_fwd+bwd {_timeit(jax.jit(imgloss_bwd), bundle):8.2f} ms "
              "(render + L1 + SSIM)", flush=True)

        def ssim_only(img):
            return 1.0 - ssim(img, gt, mask)
        img0 = jax.jit(fwd_only)(bundle)
        def ssim_bwd(img):
            return jax.grad(ssim_only)(img).sum()
        print(f"ssim_fwd+bwd    {_timeit(jax.jit(ssim_bwd), img0):8.2f} ms "
              "(loss side alone)", flush=True)

        # both losses on a FIXED image: imgloss_fwd+bwd − render_fwd+bwd −
        # this = composition overhead (fusion/remat between loss and render)
        def losses_only(img):
            return l1_loss(img, gt, mask) + (1.0 - ssim(img, gt, mask))
        def losses_bwd(img):
            return jax.grad(losses_only)(img).sum()
        print(f"losses_fwd+bwd  {_timeit(jax.jit(losses_bwd), img0):8.2f} ms "
              "(L1+SSIM on fixed image)", flush=True)

    print("PROFILE_DONE", flush=True)


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    # --decompose jit-compiles 6 heavy programs (~30s each through the
    # tunnel): give it a longer leash; stream stdout to a file so a wedge is
    # distinguishable from a slow compile
    budget = 900 if ("--decompose" in sys.argv or "--render_profile" in sys.argv) else 420
    for attempt in range(4):
        out_path = f"/tmp/bench_s2_step_child_{attempt}.log"
        with open(out_path, "w") as fo:
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child"] + sys.argv[1:],
                    stdout=fo, stderr=subprocess.STDOUT, text=True, timeout=budget)
            except subprocess.TimeoutExpired:
                print(f"[bench] attempt {attempt} wedged (timeout; partial in "
                      f"{out_path})", file=sys.stderr)
                continue
        txt = open(out_path).read()
        sys.stdout.write(txt)
        if "PROFILE_DONE" in txt:
            return


if __name__ == "__main__":
    main()
