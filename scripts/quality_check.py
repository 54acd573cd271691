"""Render quality parity: PSNR of the production Pallas backend against the
mathematically-identical XLA ``tiled`` oracle at 1080p/150K (the tiled path
itself is verified against the exact per-pixel reference at test sizes in
tests/test_pallas.py / test_rasterizer.py), plus a direct pallas-vs-exact
check at 512²/20K where the per-pixel oracle is tractable.

BASELINE.md target: ≤0.1 dB PSNR delta vs the CUDA reference class.
Prints one JSON line: {"psnr_1080p_vs_tiled", "psnr_512_vs_exact",
"psnr_250k_packed_vs_f32", "psnr_unet_bf16_vs_f32"} — the last is the
production-scale image-level gate for `s3_appearance.py --unet_bf16`.
"""
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure():
    import jax
    import jax.numpy as jnp

    from bench import build_garment_splats
    from gaussian_garments_tpu.ops.rasterizer_ref import rasterize_reference
    from gaussian_garments_tpu.renderer import RasterConfig, SplatBundle, render
    from gaussian_garments_tpu.utils.camera import make_camera
    from gaussian_garments_tpu.utils.quality import image_metrics

    out = {}
    rng = np.random.RandomState(0)

    # --- 1080p / 150K: pallas vs tiled (identical math, different kernels) ---
    W, H = 1920, 1080
    means, scales, rots, opac, shs = build_garment_splats(150_000, rng)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 2.2]), fx=2200.0, fy=2200.0,
                      cx=W / 2, cy=H / 2, width=W, height=H)
    bundle = SplatBundle(
        means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        shs=jnp.asarray(shs), active_sh_degree=0)
    bg = jnp.zeros(3)

    img_p = jax.jit(lambda b: render(
        cam, b, bg, config=RasterConfig(backend="pallas"))["render"])(bundle)
    img_t = jax.jit(lambda b: render(
        cam, b, bg, config=RasterConfig(backend="tiled", tile_capacity=1024))["render"])(bundle)
    m = image_metrics(img_p, jnp.clip(img_t, 0, 1))
    out["psnr_1080p_vs_tiled"] = round(m["psnr"], 2)

    # --- 512² / 20K: pallas (compiled) vs exact per-pixel reference ---
    W2 = H2 = 512
    means, scales, rots, opac, shs = build_garment_splats(20_000, rng)
    cam2 = make_camera(np.eye(3), np.array([0.0, 0.0, 2.2]), fx=600.0, fy=600.0,
                       cx=W2 / 2, cy=H2 / 2, width=W2, height=H2)
    b2 = SplatBundle(
        means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        shs=jnp.asarray(shs), active_sh_degree=0)
    img_p2 = jax.jit(lambda b: render(
        cam2, b, bg, config=RasterConfig(backend="pallas"))["render"])(b2)
    img_r2 = jax.jit(lambda b: render(
        cam2, b, bg, config=RasterConfig(backend="reference",
                                         ref_pixel_chunk=4096))["render"])(b2)
    m2 = image_metrics(img_p2, jnp.clip(img_r2, 0, 1))
    out["psnr_512_vs_exact"] = round(m2["psnr"], 2)

    # --- 1080p / 250K: the bf16 hi/lo packed feature table auto-enables
    # beyond ~190K splats — image-level PSNR vs the same scene through the
    # f32 table (feats_packed forced off) ---
    from gaussian_garments_tpu.ops.projection import project_gaussians
    from gaussian_garments_tpu.ops.pallas_tiles import rasterize_pallas

    means, scales, rots, opac, shs = build_garment_splats(250_000, rng)
    proj = jax.jit(lambda: project_gaussians(
        jnp.asarray(means), cam.world_view_transform, cam.full_proj_transform,
        cam.camera_center, image_width=W, image_height=H,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, scales=jnp.asarray(scales),
        rotations=jnp.asarray(rots), shs=jnp.asarray(shs),
        opacities=jnp.asarray(opac).reshape(-1), sh_degree=0))()

    def rr(packed):
        img, _, _, _ = rasterize_pallas(
            proj, image_height=H, image_width=W, bg=bg,
            pair_budget=1 << 22, feats_packed=packed)
        return jnp.clip(img, 0, 1)
    m3 = image_metrics(jax.jit(lambda: rr(True))(), jax.jit(lambda: rr(False))())
    out["psnr_250k_packed_vs_f32"] = round(m3["psnr"], 2)

    # the first three metrics are the load-bearing gates; emit them before
    # the slower production-scale net comparison so a tunnel wedge there
    # doesn't lose them (the parent keeps the LAST GG_QUALITY line)
    print("GG_QUALITY " + json.dumps(out), flush=True)

    # --- production-scale s3 eval render: --unet_bf16 activations vs f32
    # (ROADMAP "quality gates for the precision paths"): the full
    # inference-path forward — 512² AvatarNet → shadow textures → 262K texel
    # splats → 940×1280 Pallas render — with identical (random-init f32)
    # params, differing ONLY in act_dtype. PSNR between the two images bounds
    # the image-level cost of `s3_appearance.py --unet_bf16`. ---
    from gaussian_garments_tpu.data import synthetic as syn
    from gaussian_garments_tpu.data.baker import bake_textures
    from gaussian_garments_tpu.models import avatar_gaussian as AG
    from gaussian_garments_tpu.models import gaussian as G
    from gaussian_garments_tpu.models.avatar_net import AvatarNet
    from gaussian_garments_tpu.training import s3 as S3

    res, W3, H3 = 512, 940, 1280
    cams3, verts, faces, uvs, _colors = syn.make_scene(
        n_cams=1, nx=48, ny=48, width=W3, height=H3)
    bind, _ = AG.build_binding(uvs, faces, res)
    n = bind.binding.shape[0]
    splats = G.GaussianParams(
        xyz=jnp.zeros((n, 3)),
        features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.1),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 3), -6.5),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        opacity=jnp.full((n, 1), 2.0),
    )
    amb, nrm = bake_textures(bind, verts, faces, n_samples=8)
    mesh_f = jnp.asarray(faces.astype(np.int32))
    c = cams3[0]
    vis = jax.jit(lambda mv: AG.get_visible_mask_depth(
        bind, mv, mesh_f, c.world_view_transform, c.full_proj_transform,
        image_width=256, image_height=256))(jnp.asarray(verts))
    item = S3.S3Item(
        vis=vis.astype(jnp.float32)[None],
        image=c.original_image[None], mask=c.gt_alpha_mask[None],
        bg=jnp.zeros((1, 3)), mesh_v=jnp.asarray(verts)[None],
        ambient=jnp.asarray(amb)[None], normal=jnp.asarray(nrm)[None],
        world_view=c.world_view_transform[None],
        full_proj=c.full_proj_transform[None],
        campos=c.camera_center[None],
        tanfovx=jnp.asarray([c.tanfovx]), tanfovy=jnp.asarray([c.tanfovy]),
        width=W3, height=H3,
    )
    net32 = AvatarNet(texture_size=res, sh_degree=3, act_dtype=jnp.float32)
    net16 = AvatarNet(texture_size=res, sh_degree=3, act_dtype=jnp.bfloat16)
    state = S3.init_state(net32, bind, splats, verts, faces, item)
    cfg3 = RasterConfig(backend="pallas")
    img32 = jnp.clip(S3.make_s3_eval(net32, sh_degree=3, raster_cfg=cfg3)(
        state, bind, mesh_f, item)[0], 0, 1)
    img16 = jnp.clip(S3.make_s3_eval(net16, sh_degree=3, raster_cfg=cfg3)(
        state, bind, mesh_f, item)[0], 0, 1)
    m4 = image_metrics(img16, img32)
    out["psnr_unet_bf16_vs_f32"] = round(m4["psnr"], 2)

    print("GG_QUALITY " + json.dumps(out), flush=True)


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
        return
    for attempt in range(3):
        # a wedged (hung) child raises TimeoutExpired — salvage any partial
        # GG_QUALITY lines it already printed (the early emits exist exactly
        # for this case) instead of crashing the parent
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__), "--child"],
                               capture_output=True, text=True, timeout=900)
            stdout, stderr = r.stdout, r.stderr
        except subprocess.TimeoutExpired as e:
            stdout = (e.stdout or b"").decode("utf-8", "replace") \
                if isinstance(e.stdout, bytes) else (e.stdout or "")
            stderr = (e.stderr or b"").decode("utf-8", "replace") \
                if isinstance(e.stderr, bytes) else (e.stderr or "")
            stderr += "\n[quality] child hung past 900s (tunnel wedge?)\n"
        hits = [l for l in stdout.splitlines() if l.startswith("GG_QUALITY")]
        if hits:
            print(hits[-1].split(" ", 1)[1])  # last line = most complete set
            return
        sys.stderr.write(stderr[-2000:])
        print(f"[quality] attempt {attempt} incomplete; retrying", file=sys.stderr)


if __name__ == "__main__":
    main()
