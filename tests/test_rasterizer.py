"""Kernel tests (SURVEY.md §4): tiled rasterizer vs the exact per-pixel
oracle, autodiff vs finite differences, and output-contract checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_garments_tpu.ops.projection import build_cov3d, project_gaussians
from gaussian_garments_tpu.ops.rasterizer_ref import rasterize_reference
from gaussian_garments_tpu.ops.tiled import rasterize_tiled
from gaussian_garments_tpu.renderer import RasterConfig, SplatBundle, render
from gaussian_garments_tpu.utils.camera import make_camera


H = W = 64


def _random_scene(rng, n=120, sh_deg=1):
    means = rng.randn(n, 3).astype(np.float32) * 0.3
    scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.4 - 3.2)
    rots = rng.randn(n, 4).astype(np.float32)
    opac = 1 / (1 + np.exp(-rng.randn(n, 1).astype(np.float32)))
    k = (sh_deg + 1) ** 2
    shs = (rng.randn(n, k, 3).astype(np.float32) * 0.25)
    return means, scales, rots, opac, shs


def _camera():
    return make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), fx=150, fy=150,
                       cx=W / 2, cy=H / 2, width=W, height=H)


def _project(cam, means, scales, rots, opac, shs, deg=1, screen_offset=None):
    return project_gaussians(
        jnp.asarray(means), cam.world_view_transform, cam.full_proj_transform,
        cam.camera_center, image_width=W, image_height=H,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        shs=jnp.asarray(shs), opacities=jnp.asarray(opac), sh_degree=deg,
        screen_offset=screen_offset,
    )


class TestProjection:
    def test_visibility_and_radii(self, rng):
        cam = _camera()
        means, scales, rots, opac, shs = _random_scene(rng)
        # put one splat behind the camera
        means[0] = [0, 0, 10.0]  # camera at z=-3 looking at +z... view z = 13 (visible)
        means[1] = [0, 0, -10.0]  # behind
        proj = _project(cam, means, scales, rots, opac, shs)
        radii = np.asarray(proj.radii)
        assert radii[1] == 0, "behind-camera splat must be culled"
        assert (radii >= 0).all()
        assert radii.max() > 0

    def test_cov3d_psd(self, rng):
        scales = np.exp(rng.randn(10, 3).astype(np.float32))
        rots = rng.randn(10, 4).astype(np.float32)
        cov6 = np.asarray(build_cov3d(jnp.asarray(scales), jnp.asarray(rots)))
        for c in cov6:
            m = np.array([[c[0], c[1], c[2]], [c[1], c[3], c[4]], [c[2], c[4], c[5]]])
            ev = np.linalg.eigvalsh(m)
            assert (ev > -1e-5).all()


class TestTiledVsOracle:
    def test_forward_parity(self, rng):
        cam = _camera()
        proj = _project(cam, *_random_scene(rng))
        bg = jnp.asarray([0.1, 0.2, 0.3])
        img_r, d_r, a_r = rasterize_reference(proj, image_height=H, image_width=W, bg=bg)
        img_t, d_t, a_t, aux = rasterize_tiled(
            proj, image_height=H, image_width=W, bg=bg, tile_capacity=256
        )
        assert int(aux["n_overflow"]) == 0
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_r), atol=2e-4)
        np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_r), atol=2e-5)

    def test_gradients_match_oracle(self, rng):
        """Autodiff grads through the tiled path == grads through the oracle."""
        cam = _camera()
        means, scales, rots, opac, shs = _random_scene(rng, n=40)
        bg = jnp.zeros(3)
        target = jnp.asarray(rng.rand(3, H, W).astype(np.float32))

        def loss_tiled(m, o):
            proj = _project(cam, m, scales, rots, o, shs)
            img, _, _, _ = rasterize_tiled(proj, image_height=H, image_width=W, bg=bg)
            return jnp.abs(img - target).mean()

        def loss_ref(m, o):
            proj = _project(cam, m, scales, rots, o, shs)
            img, _, _ = rasterize_reference(proj, image_height=H, image_width=W, bg=bg)
            return jnp.abs(img - target).mean()

        gm_t, go_t = jax.jit(jax.grad(loss_tiled, argnums=(0, 1)))(jnp.asarray(means), jnp.asarray(opac))
        gm_r, go_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(jnp.asarray(means), jnp.asarray(opac))
        np.testing.assert_allclose(np.asarray(gm_t), np.asarray(gm_r), atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(go_t), np.asarray(go_r), atol=1e-4, rtol=1e-3)

    def test_grad_vs_finite_difference(self, rng):
        cam = _camera()
        means, scales, rots, opac, shs = _random_scene(rng, n=12)
        bg = jnp.zeros(3)

        def loss(o):
            proj = _project(cam, means, scales, rots, o, shs)
            img, _, _, _ = rasterize_tiled(proj, image_height=H, image_width=W, bg=bg)
            return img.sum()

        o0 = jnp.asarray(opac)
        g = np.asarray(jax.jit(jax.grad(loss))(o0))
        loss_j = jax.jit(loss)
        eps = 1e-3
        for i in [0, 5, 11]:
            op = np.array(opac); op[i, 0] += eps
            om = np.array(opac); om[i, 0] -= eps
            fd = (float(loss_j(jnp.asarray(op))) - float(loss_j(jnp.asarray(om)))) / (2 * eps)
            assert abs(fd - g[i, 0]) < 2e-2 * max(1.0, abs(fd)), (i, fd, g[i, 0])


class TestRenderAPI:
    def test_output_contract(self, rng):
        cam = _camera()
        means, scales, rots, opac, shs = _random_scene(rng)
        bundle = SplatBundle(
            means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            shs=jnp.asarray(shs), active_sh_degree=1,
        )
        out = render(cam, bundle, jnp.zeros(3))
        assert out["render"].shape == (3, H, W)
        assert out["depth"].shape == (1, H, W)
        assert out["alpha"].shape == (1, H, W)
        assert out["radii"].shape == (means.shape[0],)
        assert out["visibility_filter"].dtype == jnp.bool_
        a = np.asarray(out["alpha"])
        assert a.min() >= -1e-6 and a.max() <= 1.0 + 1e-5

    def test_screen_offset_grad(self, rng):
        """The densification grad channel: d loss / d screen_offset ≠ 0."""
        cam = _camera()
        means, scales, rots, opac, shs = _random_scene(rng, n=30)
        bundle = SplatBundle(
            means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            shs=jnp.asarray(shs), active_sh_degree=1,
        )

        def loss(off):
            out = render(cam, bundle, jnp.zeros(3), screen_offset=off)
            return (out["render"] ** 2).mean()

        g = jax.grad(loss)(jnp.zeros((30, 2)))
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0

    def test_vis_mask_zeroes_splats(self, rng):
        cam = _camera()
        means, scales, rots, opac, shs = _random_scene(rng, n=20)
        bundle = SplatBundle(
            means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            shs=jnp.asarray(shs), active_sh_degree=1,
        )
        out_none = render(cam, bundle, jnp.zeros(3), vis_mask=jnp.zeros(20, bool))
        assert float(jnp.abs(out_none["render"]).max()) == 0.0
        out_all = render(cam, bundle, jnp.zeros(3), vis_mask=jnp.ones(20, bool))
        out_plain = render(cam, bundle, jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(out_all["render"]), np.asarray(out_plain["render"]))

    def test_use_reference_path_matches(self, rng):
        cam = _camera()
        means, scales, rots, opac, shs = _random_scene(rng, n=50)
        bundle = SplatBundle(
            means3d=jnp.asarray(means), opacity=jnp.asarray(opac),
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            shs=jnp.asarray(shs), active_sh_degree=1,
        )
        a = render(cam, bundle, jnp.zeros(3))
        b = render(cam, bundle, jnp.zeros(3), config=RasterConfig(use_reference=True))
        np.testing.assert_allclose(np.asarray(a["render"]), np.asarray(b["render"]), atol=2e-5)
