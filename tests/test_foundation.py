"""Unit tests for the foundation layer: SH, quaternions, cameras, IO, losses.

These mirror SURVEY.md §4's CPU-runnable unit test list.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_garments_tpu.utils import sh as sh_utils
from gaussian_garments_tpu.utils import quaternion as quat
from gaussian_garments_tpu.utils.camera import (
    Camera, focal2fov, fov2focal, get_projection_matrix, get_world2view2, make_camera,
)
from gaussian_garments_tpu.utils.io import (
    fetch_ply, read_obj, read_ply, store_ply, write_obj, write_ply,
)
from gaussian_garments_tpu.utils.losses import l1_loss, ssim
from gaussian_garments_tpu.utils.general import get_expon_lr_func, knn_numpy


class TestSH:
    def test_degree0_is_constant(self):
        shc = np.zeros((5, 3, 1), np.float32)
        shc[:, :, 0] = 2.0
        dirs = np.random.RandomState(0).randn(5, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh_utils.eval_sh(0, jnp.asarray(shc), jnp.asarray(dirs))
        np.testing.assert_allclose(out, 2.0 * sh_utils.C0, rtol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_band_orthogonality_integral(self, deg):
        # Monte-Carlo integral of Y_l * Y_l over the sphere ~ 1/(4pi) normalization
        rng = np.random.RandomState(1)
        dirs = rng.randn(200000, 3)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        n = (deg + 1) ** 2
        shc = np.zeros((1, 1, n), np.float32)
        shc[0, 0, n - 1] = 1.0
        vals = np.asarray(sh_utils.eval_sh(deg, jnp.asarray(np.tile(shc, (len(dirs), 1, 1))), jnp.asarray(dirs)))
        integral = (vals[:, 0] ** 2).mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.05  # real SH are orthonormal

    def test_rgb_sh_roundtrip(self):
        rgb = np.random.RandomState(2).rand(10, 3)
        np.testing.assert_allclose(sh_utils.sh2rgb(sh_utils.rgb2sh(rgb)), rgb, rtol=1e-6)


class TestQuaternion:
    def test_quat_rotmat_roundtrip(self, rng):
        q = rng.randn(100, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q = np.where(q[:, :1] < 0, -q, q)  # canonical hemisphere
        R = quat.quat_to_rotmat(jnp.asarray(q))
        q2 = np.asarray(quat.rotmat_to_quat(R))
        q2 = np.where(q2[:, :1] < 0, -q2, q2)
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_rotmat_orthonormal(self, rng):
        q = rng.randn(50, 4).astype(np.float32)
        R = np.asarray(quat.quat_to_rotmat(jnp.asarray(q)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (50, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_normalize_zero_grad_finite(self):
        """normalize at q=0 must have a defined gradient (torch subgradient
        semantics): jnp.linalg.norm's NaN at 0 poisons face-frame gradients
        through 0·NaN when a dead-slot quaternion product is exactly zero."""
        import jax

        def f(q):
            return jnp.sum(quat.normalize(q) ** 2)

        g = np.asarray(jax.grad(f)(jnp.zeros((3, 4))))
        assert np.isfinite(g).all()
        # and unchanged on real quats
        q = jnp.asarray([[0.5, 0.5, 0.5, 0.5], [1.0, 0.0, 0.0, 0.0]])
        np.testing.assert_allclose(np.asarray(quat.normalize(q)),
                                   np.asarray(q), atol=1e-6)

    def test_quat_multiply_matches_matmul(self, rng):
        a = rng.randn(20, 4).astype(np.float32)
        b = rng.randn(20, 4).astype(np.float32)
        Rab = np.asarray(quat.quat_to_rotmat(quat.quat_multiply(
            quat.normalize(jnp.asarray(a)), quat.normalize(jnp.asarray(b)))))
        Ra = np.asarray(quat.quat_to_rotmat(jnp.asarray(a)))
        Rb = np.asarray(quat.quat_to_rotmat(jnp.asarray(b)))
        np.testing.assert_allclose(Rab, np.einsum("nij,njk->nik", Ra, Rb), atol=1e-5)

    def test_covariance_psd(self, rng):
        s = np.exp(rng.randn(10, 3).astype(np.float32) * 0.1)
        q = rng.randn(10, 4).astype(np.float32)
        cov6 = np.asarray(quat.covariance_from_scaling_rotation(jnp.asarray(s), 1.0, jnp.asarray(q)))
        # rebuild full symmetric matrix and check PSD
        C = np.zeros((10, 3, 3))
        C[:, 0, 0], C[:, 0, 1], C[:, 0, 2] = cov6[:, 0], cov6[:, 1], cov6[:, 2]
        C[:, 1, 1], C[:, 1, 2], C[:, 2, 2] = cov6[:, 3], cov6[:, 4], cov6[:, 5]
        C = C + np.triu(C, 1).transpose(0, 2, 1)
        assert (np.linalg.eigvalsh(C) > -1e-6).all()


class TestCamera:
    def _simple_cam(self, w=64, h=48):
        R = np.eye(3)
        T = np.array([0.0, 0.0, 2.0])
        fx = fy = 60.0
        return make_camera(R=R, T=T, fx=fx, fy=fy, cx=w / 2, cy=h / 2, width=w, height=h)

    def test_camera_center(self):
        cam = self._simple_cam()
        # world->view translation (0,0,2): camera sits at -2 on z in world
        np.testing.assert_allclose(np.asarray(cam.camera_center), [0, 0, -2], atol=1e-6)

    def test_projection_of_center_point(self):
        cam = self._simple_cam()
        p = np.array([0.0, 0.0, 1.0, 1.0])  # on optical axis, 3 in front of camera
        clip = p @ np.asarray(cam.full_proj_transform)
        ndc = clip[:3] / clip[3]
        # principal point at w/2 -> x ndc 0
        assert abs(ndc[0]) < 1e-5 and abs(ndc[1]) < 1e-5

    def test_view_depth_positive(self):
        cam = self._simple_cam()
        p = np.array([0.3, -0.2, 1.0, 1.0])
        view = p @ np.asarray(cam.world_view_transform)
        assert view[2] > 0  # reference convention: +z in front

    def test_fov_roundtrip(self):
        assert abs(focal2fov(fov2focal(0.9, 640), 640) - 0.9) < 1e-9

    def test_camera_is_pytree(self):
        import jax
        cam = self._simple_cam()
        leaves = jax.tree_util.tree_leaves(cam)
        assert len(leaves) >= 3
        cam2 = jax.tree_util.tree_map(lambda x: x, cam)
        assert cam2.image_width == cam.image_width


class TestIO:
    def test_obj_roundtrip(self, tmp_path):
        d = {
            "vertices": np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            "uvs": np.array([[0, 0], [1, 0], [0, 1]], np.float32),
            "faces": np.array([[0, 1, 2]]),
            "texture_faces": np.array([[0, 1, 2]]),
        }
        p = tmp_path / "mesh.obj"
        write_obj(d, p)
        d2 = read_obj(p)
        np.testing.assert_allclose(d2["vertices"], d["vertices"])
        np.testing.assert_array_equal(d2["faces"], d["faces"])
        np.testing.assert_array_equal(d2["texture_faces"], d["texture_faces"])
        np.testing.assert_allclose(d2["uvs"], d["uvs"])

    def test_ply_roundtrip(self, tmp_path, rng):
        xyz = rng.randn(17, 3).astype(np.float32)
        rgb = (rng.rand(17, 3) * 255).astype(np.uint8)
        p = tmp_path / "pc.ply"
        store_ply(p, xyz, rgb)
        pc = fetch_ply(p)
        np.testing.assert_allclose(pc.points, xyz, rtol=1e-6)
        np.testing.assert_allclose(pc.colors, rgb / 255.0, rtol=1e-6)

    def test_ply_generic_props(self, tmp_path, rng):
        arrays = {"x": rng.randn(5).astype(np.float32), "f_dc_0": rng.randn(5).astype(np.float32)}
        p = tmp_path / "g.ply"
        write_ply(p, arrays)
        out = read_ply(p)
        np.testing.assert_allclose(out["f_dc_0"], arrays["f_dc_0"])


class TestLosses:
    def test_l1_masked(self):
        a = jnp.ones((3, 8, 8))
        b = jnp.zeros((3, 8, 8))
        mask = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
        np.testing.assert_allclose(l1_loss(a, b, mask), 0.5, rtol=1e-6)

    def test_ssim_identical_is_one(self, rng):
        img = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
        assert float(ssim(img, img)) > 0.999

    def test_ssim_matches_torch_reference(self, rng):
        """Golden test against the original torch implementation semantics."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        img1 = rng.rand(3, 24, 24).astype(np.float32)
        img2 = rng.rand(3, 24, 24).astype(np.float32)

        # torch reference (from utils/loss_utils.py)
        def t_gaussian(window_size, sigma):
            g = torch.Tensor([math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)])
            return g / g.sum()

        w1d = t_gaussian(11, 1.5).unsqueeze(1)
        w2d = w1d.mm(w1d.t()).float().unsqueeze(0).unsqueeze(0)
        window = w2d.expand(3, 1, 11, 11).contiguous()
        t1, t2 = torch.tensor(img1)[None], torch.tensor(img2)[None]
        mu1 = F.conv2d(t1, window, padding=5, groups=3)
        mu2 = F.conv2d(t2, window, padding=5, groups=3)
        mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
        s1 = F.conv2d(t1 * t1, window, padding=5, groups=3) - mu1_sq
        s2 = F.conv2d(t2 * t2, window, padding=5, groups=3) - mu2_sq
        s12 = F.conv2d(t1 * t2, window, padding=5, groups=3) - mu12
        C1, C2 = 0.01**2, 0.03**2
        expected = (((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))).mean().item()

        ours = float(ssim(jnp.asarray(img1), jnp.asarray(img2)))
        # XLA's default conv precision differs slightly from torch's f32 conv
        assert abs(ours - expected) < 1e-2

    @staticmethod
    def _flat_bright_pair(rng, h=256, w=256):
        """The SSIM failure region for low-precision moments: bright, flat,
        tiny texture — sigma² ≈ 0 so any E[x²] rounding error competes
        directly with C2 = 9e-4."""
        base = 0.7 + 0.01 * np.linspace(0, 1, w)[None, :] * np.ones((h, 1))
        img1 = np.clip(np.repeat(base[None], 3, 0)
                       + rng.randn(3, h, w) * 1e-3, 0, 1).astype(np.float32)
        img2 = np.clip(img1 + rng.randn(3, h, w) * 1e-3, 0, 1).astype(np.float32)
        return img1, img2

    @staticmethod
    def _ssim_f64(img1, img2):
        """float64 oracle with the same banded-Toeplitz SAME padding."""
        from gaussian_garments_tpu.utils.losses import _band_matrix_np
        bh = _band_matrix_np(img1.shape[1], 11, 1.5).astype(np.float64)
        bw = _band_matrix_np(img1.shape[2], 11, 1.5).astype(np.float64)

        def blur(x):
            return np.einsum("chw,hg->cgw", np.einsum(
                "chw,wv->chv", x.astype(np.float64), bw), bh)

        mu1, mu2 = blur(img1), blur(img2)
        e11, e22, e12 = blur(img1 * img1), blur(img2 * img2), blur(img1 * img2)
        s11, s22, s12 = e11 - mu1 * mu1, e22 - mu2 * mu2, e12 - mu1 * mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        return float((((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
                      ((mu1 * mu1 + mu2 * mu2 + C1) * (s11 + s22 + C2))).mean())

    def test_ssim_flat_bright_matches_f64_oracle(self, rng):
        """Regression for the r4 prod-drive SSIM explosion: the flat-bright
        failure region must agree with a float64 oracle and stay in [-1,1]."""
        img1, img2 = self._flat_bright_pair(rng)
        ours = float(ssim(jnp.asarray(img1), jnp.asarray(img2)))
        assert -1.0 <= ours <= 1.0
        assert abs(ours - self._ssim_f64(img1, img2)) < 1e-3

    def test_ssim_bf16_inputs_safe(self, rng):
        """bf16 images must not explode SSIM (the r4 bug: eval renders
        reached ssim() as bf16 → img*img rounded in bf16 → sigma² < -C2 →
        eval_ssim = -4.73/+1.217). ssim() now casts to f32 first; the only
        remaining error is the bf16 quantization of the images themselves."""
        img1, img2 = self._flat_bright_pair(rng)
        v32 = float(ssim(jnp.asarray(img1), jnp.asarray(img2)))
        vbf = float(ssim(jnp.asarray(img1, jnp.bfloat16),
                         jnp.asarray(img2, jnp.bfloat16)))
        vmix = float(ssim(jnp.asarray(img1, jnp.bfloat16), jnp.asarray(img2)))
        for v in (vbf, vmix):
            assert -1.0 <= v <= 1.0
            # quantized-input SSIM differs from f32 SSIM, but boundedly
            assert abs(v - v32) < 0.05

    def test_image_metrics_masked_keys(self, rng):
        from gaussian_garments_tpu.utils.quality import image_metrics
        img1, img2 = self._flat_bright_pair(rng, 64, 64)
        mask = np.zeros((1, 64, 64), np.float32)
        mask[:, 16:48, 16:48] = 1.0
        m = image_metrics(jnp.asarray(img1), jnp.asarray(img2),
                          jnp.asarray(mask))
        assert set(m) == {"psnr", "ssim", "psnr_masked", "ssim_masked"}
        assert -1.0 <= m["ssim_masked"] <= 1.0

    def test_ssim_fast_close_to_exact(self, rng):
        """The X3 training-loss blur must stay within its documented
        worst-case (≤5e-3) of the exact path, on the adversarial
        flat-bright + strong-noise pair (profile_ssim.py's accuracy case).
        On CPU X3 is emulated near-exactly; on TPU this bounds the real
        3-pass split."""
        base = 0.7 + 0.01 * np.linspace(0, 1, 256)[None, :] * np.ones((256, 1))
        img1 = np.clip(np.repeat(base[None], 3, 0)
                       + rng.randn(3, 256, 256) * 1e-3, 0, 1).astype(np.float32)
        img2 = np.clip(img1 + rng.randn(3, 256, 256) * 0.03, 0, 1).astype(np.float32)
        v_exact = float(ssim(jnp.asarray(img1), jnp.asarray(img2)))
        v_fast = float(ssim(jnp.asarray(img1), jnp.asarray(img2), fast=True))
        assert -1.0 <= v_fast <= 1.0
        assert abs(v_fast - v_exact) < 5e-3


class TestGeneral:
    def test_expon_lr(self):
        f = get_expon_lr_func(1e-2, 1e-4, max_steps=100)
        # exp(log(x)) round-trips through float32 on device: ~1e-7 relative
        assert abs(float(f(0)) - 1e-2) < 1e-2 * 1e-4
        assert abs(float(f(100)) - 1e-4) < 1e-4 * 1e-4
        assert float(f(-1)) == 0.0

    def test_knn(self, rng):
        pts = rng.randn(50, 3)
        sq, idx = knn_numpy(pts, 3)
        assert sq.shape == (50, 3) and idx.shape == (50, 3)
        # brute force check for point 0
        d2 = ((pts - pts[0]) ** 2).sum(-1)
        d2[0] = np.inf
        np.testing.assert_allclose(sorted(sq[0]), sorted(np.sort(d2)[:3]), rtol=1e-9)


class TestConfig:
    def test_param_groups_flags(self):
        from argparse import ArgumentParser
        from gaussian_garments_tpu.config import ModelParams, OptimizationParams, PipelineParams

        parser = ArgumentParser()
        lp, op, pp = ModelParams(parser), OptimizationParams(parser), PipelineParams(parser)
        args = parser.parse_args(["-w", "--sh_degree", "2", "--lambda_dssim", "0.3"])
        d = lp.extract(args)
        o = op.extract(args)
        assert d.white_background is True
        assert d.sh_degree == 2
        assert abs(o.lambda_dssim - 0.3) < 1e-9
        assert o.lambda_collision == 1e3
