"""Stage-3 tests: UV bind map properties, baker sanity, AvatarNet forward,
one jitted training step + short convergence on the synthetic scene."""
from argparse import ArgumentParser, Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_garments_tpu.config import OptimizationParams
from gaussian_garments_tpu.data import synthetic as syn
from gaussian_garments_tpu.data.baker import bake_textures
from gaussian_garments_tpu.models import avatar_gaussian as AG
from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.models import mesh_gaussian as MG
from gaussian_garments_tpu.models.avatar_net import AvatarNet
from gaussian_garments_tpu.renderer import RasterConfig
from gaussian_garments_tpu.training import s3 as S3

RES = 64


@pytest.fixture(scope="module")
def scene():
    return syn.make_scene(n_cams=2, nx=8, ny=8, width=64, height=64)


@pytest.fixture(scope="module")
def binding(scene):
    cams, verts, faces, uvs, colors = scene
    bind, bind_map = AG.build_binding(uvs, faces, RES)
    return bind, bind_map


class TestBinding:
    def test_bind_map_coverage(self, scene, binding):
        cams, verts, faces, uvs, colors = scene
        bind, bind_map = binding
        # the synthetic sheet's UVs tile [0,1]² -> nearly every texel is bound
        assert (bind_map > -1).mean() > 0.95
        assert bind_map.max() < len(faces)

    def test_barycentric_anchor_inside_triangle(self, scene, binding):
        bind, _ = binding
        bc = np.asarray(bind.gs_bc)
        np.testing.assert_allclose(bc.sum(1), 1.0, atol=1e-4)
        # texel centers are inside their triangles -> all coords in [0,1]
        assert (bc > -1e-3).all() and (bc < 1 + 1e-3).all()

    def test_anchor_matches_uv(self, scene, binding):
        """The 3D anchor must correspond to the UV position: reproject through
        a flat (z=0) sheet where (x,y) is an affine map of (u,v)."""
        cams, verts, faces, uvs, colors = scene
        bind, _ = binding
        flat_v, flat_f, flat_uv = syn.make_cloth_template(8, 8, ripple=0.0)
        anchors = np.asarray(AG.barycentric_3d(
            bind, jnp.asarray(flat_v), jnp.asarray(flat_f.astype(np.int32))))
        u = (np.asarray(bind.gs_v) + 0.5) / RES
        v = (np.asarray(bind.gs_u) + 0.5) / RES
        np.testing.assert_allclose(anchors[:, 0], u - 0.5, atol=2e-2)
        np.testing.assert_allclose(anchors[:, 1], v - 0.5, atol=2e-2)

    def test_scatter_gather_roundtrip(self, binding, rng):
        bind, _ = binding
        vals = jnp.asarray(rng.randn(bind.binding.shape[0], 5).astype(np.float32))
        tex = AG.scatter_texture(bind, vals, 5)
        back = AG.gather_texture(bind, tex)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vals))

    def test_gaussian_maps_roundtrip(self, binding, rng):
        bind, _ = binding
        n = bind.binding.shape[0]
        params = G.GaussianParams(
            xyz=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
            features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32)),
            features_rest=jnp.asarray(rng.randn(n, 3, 3).astype(np.float32)),
            scaling=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
            rotation=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
            opacity=jnp.asarray(rng.randn(n, 1).astype(np.float32)),
        )
        maps = AG.gaussian_maps(bind, params)
        back = AG.load_gaussian_maps(maps)
        for k in G.PARAM_NAMES:
            np.testing.assert_allclose(np.asarray(getattr(back, k)),
                                       np.asarray(getattr(params, k)), err_msg=k)


class TestBaker:
    def test_normals_and_ao(self, scene, binding):
        cams, verts, faces, uvs, colors = scene
        bind, _ = binding
        amb, nrm = bake_textures(bind, verts, faces, n_samples=8)
        assert amb.shape == (1, RES, RES) and nrm.shape == (3, RES, RES)
        assert amb.min() >= 0 and amb.max() <= 1
        # bound texels have unit normals (packed to [0,1])
        gu, gv = np.asarray(bind.gs_u), np.asarray(bind.gs_v)
        n = nrm[:, gu, gv] * 2 - 1
        np.testing.assert_allclose(np.linalg.norm(n, axis=0), 1.0, atol=1e-4)
        # an open rippled sheet is mostly unoccluded
        assert amb[0, gu, gv].mean() > 0.8

    def test_occluder_darkens(self, scene, binding):
        cams, verts, faces, uvs, colors = scene
        bind, _ = binding
        amb0, _ = bake_textures(bind, verts, faces, n_samples=16)
        # a big plate right above the sheet
        pv = verts.copy(); pv[:, 2] += 0.05
        pv[:, :2] *= 3.0
        amb1, _ = bake_textures(bind, verts, faces, occluders=[(pv, faces)], n_samples=16)
        assert amb1.mean() < amb0.mean() - 0.2


def _build_state(scene, binding, rng):
    cams, verts, faces, uvs, colors = scene
    bind, _ = binding
    n = bind.binding.shape[0]
    splats = G.GaussianParams(
        xyz=jnp.zeros((n, 3)),
        features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.1),
        features_rest=jnp.zeros((n, 3, 3)),
        scaling=jnp.full((n, 3), -4.5),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        opacity=jnp.full((n, 1), 2.0),
    )
    amb, nrm = bake_textures(bind, verts, faces, n_samples=8)
    B = 2
    item = S3.S3Item(
        image=jnp.stack([c.original_image for c in cams[:B]]),
        mask=jnp.stack([c.gt_alpha_mask for c in cams[:B]]),
        bg=jnp.zeros((B, 3)),
        mesh_v=jnp.tile(jnp.asarray(verts)[None], (B, 1, 1)),
        ambient=jnp.tile(jnp.asarray(amb)[None], (B, 1, 1, 1)),
        normal=jnp.tile(jnp.asarray(nrm)[None], (B, 1, 1, 1)),
        world_view=jnp.stack([c.world_view_transform for c in cams[:B]]),
        full_proj=jnp.stack([c.full_proj_transform for c in cams[:B]]),
        campos=jnp.stack([c.camera_center for c in cams[:B]]),
        tanfovx=jnp.asarray([c.tanfovx for c in cams[:B]]),
        tanfovy=jnp.asarray([c.tanfovy for c in cams[:B]]),
        width=64, height=64,
    )
    net = AvatarNet(texture_size=RES, sh_degree=1)
    state = S3.init_state(net, bind, splats, verts, faces, item)
    return net, state, item, jnp.asarray(faces.astype(np.int32))


class TestVisibility:
    """Per-texel visibility: the depth-buffer test must agree with the exact
    ray cast (reference avatar_gaussian_model.py:227-263) and beat the old
    face-granular raster approximation under partial occlusion."""

    def _occluded_scene(self, scene, binding):
        cams, verts, faces, uvs, colors = scene
        bind, _ = binding
        cam = cams[0]
        # occluder: a copy of the sheet, pushed 30% of the way toward the
        # camera and shifted to cover roughly half the garment
        center = verts.mean(axis=0)
        toward = np.asarray(cam.camera_center) - center
        occ_v = verts + 0.3 * toward[None, :] + np.array([0.35, 0.0, 0.0], np.float32)
        all_v = jnp.asarray(np.concatenate([verts, occ_v]).astype(np.float32))
        all_f = jnp.concatenate([
            jnp.asarray(faces.astype(np.int32)),
            jnp.asarray(faces.astype(np.int32)) + len(verts)])
        return cam, all_v, all_f, bind

    def test_depth_matches_exact_raycast(self, scene, binding):
        cam, all_v, all_f, bind = self._occluded_scene(scene, binding)
        exact = np.asarray(AG.get_visible_mask_exact(
            bind, all_v, all_f, cam.camera_center))
        depth = np.asarray(AG.get_visible_mask_depth(
            bind, all_v, all_f, cam.world_view_transform, cam.full_proj_transform,
            image_width=256, image_height=256))
        raster = np.asarray(AG.get_visible_mask_raster(
            bind, all_v, all_f, cam.world_view_transform, cam.full_proj_transform,
            image_width=256, image_height=256))
        assert 0.05 < exact.mean() < 0.95          # real occlusion in the scene
        agree_depth = (depth == exact).mean()
        agree_raster = (raster == exact).mean()
        assert agree_depth > 0.93
        assert agree_depth >= agree_raster         # strictly better than the approx
        print(f"visibility agreement: depth={agree_depth:.4f} raster={agree_raster:.4f}")


class TestS3Step:
    def test_step_runs_and_converges(self, scene, binding, rng):
        net, state, item, f32 = _build_state(scene, binding, rng)
        parser = ArgumentParser()
        opt = OptimizationParams(parser).extract(parser.parse_args([]))
        args = Namespace(**{**vars(opt), "lr_init": 5e-4})
        cfg = RasterConfig(tile_capacity=128, chunk_tiles=16)
        bind, _ = binding
        step = S3.make_s3_step(net, args, sh_degree=1, raster_cfg=cfg, vis_raster_hw=(64, 64))
        state, ld0 = step(state, bind, f32, item)
        assert np.isfinite(float(sum(ld0.values())))
        img_hist = []
        for _ in range(20):
            state, ld = step(state, bind, f32, item)
            img_hist.append(float(ld["img"]))
        assert all(np.isfinite(img_hist))
        # optimization makes progress (early steps of a 40M-param net on 2
        # items oscillate; require the best-seen loss to beat the start)
        assert min(img_hist) < float(ld0["img"])

    def test_shard_map_matches_single_device(self, scene, binding, rng):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        net, state, item, f32 = _build_state(scene, binding, rng)
        parser = ArgumentParser()
        opt = OptimizationParams(parser).extract(parser.parse_args([]))
        args = Namespace(**{**vars(opt), "lr_init": 5e-4})
        cfg = RasterConfig(tile_capacity=128, chunk_tiles=16)
        bind, _ = binding

        step1 = S3.make_s3_step(net, args, sh_degree=1, raster_cfg=cfg, vis_raster_hw=(64, 64))
        s_ref, ld_ref = step1(state, bind, f32, item)

        mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("data",))
        stepn = S3.make_s3_step(net, args, sh_degree=1, raster_cfg=cfg,
                                vis_raster_hw=(64, 64), axis_name="data", jit=False)
        sharded = jax.jit(shard_map(
            stepn, mesh=mesh,
            in_specs=(P(), P(), P(), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        s_shard, ld_shard = sharded(state, bind, f32, item)
        np.testing.assert_allclose(float(sum(ld_shard.values())),
                                   float(sum(ld_ref.values())), rtol=1e-4)
        g_ref = jax.tree.leaves(s_ref.net_params)[0]
        g_sh = jax.tree.leaves(s_shard.net_params)[0]
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-5)

    def test_pretrain_freezes_splats(self, scene, binding, rng):
        net, state, item, f32 = _build_state(scene, binding, rng)
        parser = ArgumentParser()
        opt = OptimizationParams(parser).extract(parser.parse_args([]))
        args = Namespace(**{**vars(opt), "lr_init": 5e-4})
        cfg = RasterConfig(tile_capacity=128, chunk_tiles=16)
        bind, _ = binding
        step = S3.make_s3_step(net, args, sh_degree=1, raster_cfg=cfg,
                               vis_raster_hw=(64, 64), train_gaussians=False)
        p0 = state.splats
        state, _ = step(state, bind, f32, item)
        for k in G.PARAM_NAMES:
            np.testing.assert_array_equal(np.asarray(getattr(state.splats, k)),
                                          np.asarray(getattr(p0, k)))


class TestUNetBf16:
    def test_bf16_step_finite_and_close(self, scene, binding, rng):
        """bf16-activation mode (--unet_bf16): finite losses, close to the
        f32 step on the first iteration (activation rounding only — the
        apply-time cast keeps f32 master params in the optimizer)."""
        net32, state, item, f32 = _build_state(scene, binding, rng)
        netbf = AvatarNet(texture_size=RES, sh_degree=1,
                          act_dtype=jnp.bfloat16)
        parser = ArgumentParser()
        opt = OptimizationParams(parser).extract(parser.parse_args([]))
        args = Namespace(**{**vars(opt), "lr_init": 5e-4})
        cfg = RasterConfig(tile_capacity=128, chunk_tiles=16)
        s32 = S3.make_s3_step(net32, args, sh_degree=1, raster_cfg=cfg,
                              vis_raster_hw=(64, 64))
        sbf = S3.make_s3_step(netbf, args, sh_degree=1, raster_cfg=cfg,
                              vis_raster_hw=(64, 64))
        _, ld32 = s32(state, binding[0], f32, item)
        _, ldbf = sbf(state, binding[0], f32, item)
        for k in ld32:
            a, b = float(ld32[k]), float(ldbf[k])
            assert np.isfinite(b), k
            assert abs(a - b) <= 0.05 * max(abs(a), 0.02), (k, a, b)


class TestDenseLayout:
    """Dense res²-texel layout (``build_binding(dense=True)``): gathers/
    scatters become reshapes; dead texels are masked by ``alive``. Every
    observable (textures, losses, renders, checkpoints) must match the
    compact (reference-semantics) layout."""

    @pytest.fixture(scope="class")
    def dense_binding(self, scene, binding):
        cams, verts, faces, uvs, colors = scene
        _, bind_map = binding
        bind_d, _ = AG.build_binding(uvs, faces, RES, bind_map=bind_map, dense=True)
        return bind_d

    def test_structure(self, binding, dense_binding):
        bind_c, bind_map = binding
        bind_d = dense_binding
        assert bind_d.dense and bind_d.binding.shape[0] == RES * RES
        alive = np.asarray(bind_d.alive)
        assert alive.sum() == bind_c.binding.shape[0]
        # alive rows carry the compact binding/barycentrics in the same order
        np.testing.assert_array_equal(np.asarray(bind_d.binding)[alive],
                                      np.asarray(bind_c.binding))
        np.testing.assert_allclose(np.asarray(bind_d.gs_bc)[alive],
                                   np.asarray(bind_c.gs_bc), atol=1e-6)
        np.testing.assert_array_equal(np.where(alive)[0], np.asarray(bind_c.flat_idx))

    def test_gather_scatter_equivalence(self, binding, dense_binding, rng):
        bind_c, _ = binding
        bind_d = dense_binding
        tex = jnp.asarray(rng.randn(5, RES, RES).astype(np.float32))
        alive = np.asarray(bind_d.alive)
        got_d = np.asarray(AG.gather_texture(bind_d, tex))
        got_c = np.asarray(AG.gather_texture(bind_c, tex))
        np.testing.assert_allclose(got_d[alive], got_c)
        # scatter: dense rows (garbage at dead texels) -> same texture
        vals_d = jnp.asarray(rng.randn(RES * RES, 5).astype(np.float32))
        vals_c = vals_d[np.asarray(bind_c.flat_idx)]
        np.testing.assert_allclose(
            np.asarray(AG.scatter_texture(bind_d, vals_d, 5)),
            np.asarray(AG.scatter_texture(bind_c, vals_c, 5)))

    def test_baker_matches_compact(self, scene, binding, dense_binding):
        cams, verts, faces, uvs, colors = scene
        bind_c, _ = binding
        amb_c, nrm_c = bake_textures(bind_c, verts, faces, n_samples=8)
        amb_d, nrm_d = bake_textures(dense_binding, verts, faces, n_samples=8)
        np.testing.assert_allclose(amb_d, amb_c)
        np.testing.assert_allclose(nrm_d, nrm_c)

    def test_checkpoint_layout_roundtrip(self, binding, dense_binding, rng):
        bind_c, _ = binding
        bind_d = dense_binding
        n = bind_c.binding.shape[0]
        params_c = G.GaussianParams(
            xyz=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
            features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32)),
            features_rest=jnp.asarray(rng.randn(n, 3, 3).astype(np.float32)),
            scaling=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
            rotation=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
            opacity=jnp.asarray(rng.randn(n, 1).astype(np.float32)),
        )
        params_d = AG.densify_params(bind_d, params_c)
        # dense -> compact adapter inverts densify
        back = AG.adapt_params_layout(bind_c, params_d)
        for k in G.PARAM_NAMES:
            np.testing.assert_allclose(np.asarray(getattr(back, k)),
                                       np.asarray(getattr(params_c, k)), err_msg=k)
        # texture checkpoints are layout-independent
        maps_c = AG.gaussian_maps(bind_c, params_c)
        maps_d = AG.gaussian_maps(bind_d, params_d)
        for k in maps_c:
            np.testing.assert_allclose(maps_d[k], maps_c[k], err_msg=k)
        # dense load patches dead rotations to identity
        loaded = AG.load_gaussian_maps(maps_c, bind=bind_d)
        dead = ~np.asarray(bind_d.alive)
        np.testing.assert_array_equal(
            np.asarray(loaded.rotation)[dead],
            np.tile([1.0, 0, 0, 0], (dead.sum(), 1)))
        np.testing.assert_allclose(
            np.asarray(loaded.xyz)[np.asarray(bind_d.alive)],
            np.asarray(params_c.xyz))

    def test_step_matches_compact(self, scene, binding, dense_binding, rng):
        """One full jitted training step: loss dicts and the post-step eval
        render agree between layouts."""
        rng2 = np.random.RandomState(7)
        net, state_c, item, f32 = _build_state(scene, binding, rng2)
        bind_c, _ = binding
        bind_d = dense_binding
        state_d = state_c.replace(
            splats=AG.densify_params(bind_d, state_c.splats),
            splat_adam=None)
        from gaussian_garments_tpu.models.adam import tree_adam_init
        state_d = state_d.replace(splat_adam=tree_adam_init(state_d.splats))

        parser = ArgumentParser()
        opt = OptimizationParams(parser).extract(parser.parse_args([]))
        args = Namespace(**{**vars(opt), "lr_init": 5e-4})
        cfg = RasterConfig(tile_capacity=128, chunk_tiles=16)
        step = S3.make_s3_step(net, args, sh_degree=1, raster_cfg=cfg,
                               vis_raster_hw=(64, 64))
        state_c, ld_c = step(state_c, bind_c, f32, item)
        state_d, ld_d = step(state_d, bind_d, f32, item)
        for k in ld_c:
            a, b = float(ld_c[k]), float(ld_d[k])
            assert abs(a - b) <= 1e-4 * max(abs(a), 1e-3) + 1e-6, (k, a, b)

        ev = S3.make_s3_eval(net, sh_degree=1, raster_cfg=cfg, vis_raster_hw=(64, 64))
        img_c = np.asarray(ev(state_c, bind_c, f32, item))
        img_d = np.asarray(ev(state_d, bind_d, f32, item))
        np.testing.assert_allclose(img_d, img_c, atol=2e-4)
