"""End-to-end driver tests: run the actual CLI entry points (s2 template +
sequence) against a synthetic dataset written in the reference's disk layout,
and check the output artifacts (PLYs, binding.pkl, meshes, cameras.json)."""
import json
import pickle
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from gaussian_garments_tpu.config import DEFAULTS
    from gaussian_garments_tpu.data.synthetic import write_reference_layout

    root = tmp_path_factory.mktemp("gg")
    data_root, output_root = root / "data", root / "out"
    meta = write_reference_layout(data_root, output_root, "subj", "seq1",
                                  n_cams=3, n_frames=2, nx=8, ny=8, res=64)
    # point the global DEFAULTS at the sandbox
    DEFAULTS.data_root = str(data_root)
    DEFAULTS.output_root = str(output_root)
    DEFAULTS.aux_root = str(root / "aux")
    return root, meta


def _run_s2(argv):
    import s2_registration

    old = sys.argv
    sys.argv = ["s2_registration.py"] + argv
    try:
        s2_registration.main()
    finally:
        sys.argv = old


def _uv_sphere(n_theta=24, n_phi=48, radius=0.5):
    """Closed UV sphere (good for screened Poisson)."""
    verts = [(0, 0, radius), (0, 0, -radius)]
    for i in range(1, n_theta):
        th = np.pi * i / n_theta
        for j in range(n_phi):
            ph = 2 * np.pi * j / n_phi
            verts.append((radius * np.sin(th) * np.cos(ph),
                          radius * np.sin(th) * np.sin(ph),
                          radius * np.cos(th)))
    verts = np.asarray(verts, np.float32)
    faces = []
    ring = lambda i, j: 2 + (i - 1) * n_phi + (j % n_phi)
    for j in range(n_phi):
        faces.append((0, ring(1, j), ring(1, j + 1)))
        faces.append((1, ring(n_theta - 1, j + 1), ring(n_theta - 1, j)))
    for i in range(1, n_theta - 1):
        for j in range(n_phi):
            a, b = ring(i, j), ring(i, j + 1)
            c, d = ring(i + 1, j), ring(i + 1, j + 1)
            faces.append((a, c, b))
            faces.append((b, c, d))
    return verts, np.asarray(faces, np.int64)


class TestS1Driver:
    def test_s1_segments_garment(self, tmp_path):
        """Drive the real s1 CLI (COLMAP skipped; fused.ply planted) on a
        sphere whose TOP half is the 'garment' per the masks: the emitted
        template must contain only top-half geometry — the reference always
        rasterize-and-votes the scan against the garment masks and cuts it
        (utils/initialisation_utils.py:152-156, utils/parse_scan.py:53-119)."""
        import jax.numpy as jnp
        import s1_initialisation
        from gaussian_garments_tpu.config import DEFAULTS
        from gaussian_garments_tpu.data.synthetic import make_camera_ring
        from gaussian_garments_tpu.ops.mesh_raster import rasterize_mesh
        from gaussian_garments_tpu.utils.io import save_image, store_ply

        data_root, out_root = tmp_path / "data", tmp_path / "out"
        DEFAULTS.data_root, DEFAULTS.output_root = str(data_root), str(out_root)
        DEFAULTS.aux_root = str(tmp_path / "aux")

        verts, faces = _uv_sphere()
        top_faces = verts[faces].mean(1)[:, 2] > 0.0
        cams = make_camera_ring(3, fx=100.0, width=64, height_px=64)
        seq = data_root / "subj" / "seq1"
        cam_json = {}
        for k, cam in enumerate(cams):
            name = f"Cam{k:03d}"
            intr = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
            extr = np.concatenate([cam.R.T, np.asarray(cam.T)[:, None]], axis=1)
            cam_json[name] = {"intrinsics": intr.tolist(),
                              "extrinsics": extr.tolist(), "ids": k}
            p2f, _ = rasterize_mesh(
                jnp.asarray(verts), jnp.asarray(faces.astype(np.int32)),
                cam.world_view_transform, cam.full_proj_transform,
                image_width=64, image_height=64)
            p2f = np.asarray(p2f)
            fg = (p2f >= 0).astype(np.float32)
            gm = np.zeros_like(fg)
            gm[p2f >= 0] = top_faces[p2f[p2f >= 0]].astype(np.float32)
            save_image(seq / name / "rgb_images" / "00000.png",
                       np.stack([fg * 0.5] * 3, -1))
            save_image(seq / name / "garment_masks" / "00000.png", gm)
            save_image(seq / name / "foreground_masks" / "00000.png", fg)
        with open(seq / "cameras.json", "w") as f:
            json.dump(cam_json, f)

        # plant the dense cloud COLMAP would have fused (sphere surface
        # samples, non-green colors)
        target = out_root / "subj" / DEFAULTS.stage1
        target.mkdir(parents=True)
        dense_v, dense_f = _uv_sphere(n_theta=48, n_phi=96)
        cloud = np.concatenate([dense_v, dense_v[dense_f].mean(1)])
        store_ply(target / "fused.ply", cloud,
                  np.full_like(cloud, 128.0))

        old = sys.argv
        sys.argv = ["s1_initialisation.py", "-s", "subj", "-q", "seq1",
                    "--skip_colmap", "--grid_res", "64",
                    "--remesh_faces", "500"]
        try:
            s1_initialisation.main()
        finally:
            sys.argv = old

        for name in ("poisson.obj", "segmented.obj", "parser.obj",
                     "template.obj", "point_cloud.ply"):
            assert (target / name).exists(), name
        from gaussian_garments_tpu.utils.io import read_obj
        tmpl = read_obj(target / "template.obj")
        # template = top hemisphere only (tolerance: one surface-nets cell)
        assert len(tmpl["faces"]) > 0
        assert tmpl["vertices"][:, 2].min() > -0.1
        assert tmpl["vertices"][:, 2].max() > 0.3
        # the unsegmented poisson scan spans the WHOLE sphere
        scan = read_obj(target / "poisson.obj")
        assert scan["vertices"][:, 2].min() < -0.3


class TestS2Driver:
    def test_template_mode_artifacts(self, dataset):
        root, meta = dataset
        _run_s2(["-s", "subj", "-q", "seq1", "-tf", "0",
                 "--first_frame_iterations", "6",
                 "--ff_collision_iteration", "2",
                 "--cameras_per_step", "2"])
        out = root / "out" / "subj" / "stage2"
        tmpl = out / "Template"
        assert (tmpl / "local_point_cloud.ply").exists()
        assert (tmpl / "point_cloud.ply").exists()
        with open(tmpl / "binding.pkl", "rb") as f:
            binding = pickle.load(f)
        assert len(binding) >= len(meta["faces"])
        assert (out / "seq1" / "meshes" / "frame_00000.obj").exists()
        assert (out / "seq1" / "cameras.json").exists()
        assert (out / "seq1" / "input.ply").exists()
        # reference template-mode artifact names (s2_registration.py:88-90,
        # 117-119) + the 5-column GT|mask|render|diff|mesh panel
        assert (tmpl / "template.obj").exists()
        from PIL import Image
        panel = np.array(Image.open(tmpl / "template_render.png"))
        assert panel.shape == (64, 64 * 5, 3)
        assert len(np.unique(panel)) > 2  # not saturated to {0,255}

    def test_sequence_mode_tracks_frames(self, dataset):
        root, meta = dataset
        # needs the Template from the previous test
        _run_s2(["-s", "subj", "-q", "seq1", "-t", "Template",
                 "--first_frame_iterations_cross", "6",
                 "--other_frame_iterations", "4",
                 "--collision_iteration", "2",
                 "--ff_collision_iteration", "2",
                 "--cameras_per_step", "2"])
        out = root / "out" / "subj" / "stage2" / "seq1"
        for t in range(2):
            assert (out / "meshes" / f"frame_{t:05d}.obj").exists()
            assert (out / "point_cloud" / f"frame_{t:05d}" / "point_cloud.ply").exists()
            from PIL import Image
            panel = np.array(Image.open(out / "renders" / f"{t:05d}.png"))
            assert panel.shape == (64, 64 * 5, 3)


class TestS3AndInferenceDrivers:
    def test_s3_then_inference(self, dataset, monkeypatch):
        root, meta = dataset
        import s3_appearance

        monkeypatch.setattr(sys, "argv", [
            "s3_appearance.py", "-s", "subj", "--texture_size", "32",
            "--sh_degree", "0", "--save_iterations", "100000",
            "--items_per_step", "2"])
        # shrink to 1 epoch for CI speed
        import gaussian_garments_tpu.config  # noqa: F401
        orig_main = s3_appearance.main

        # run one epoch by patching the hard-coded 5 via argv is not possible;
        # instead run main and rely on the tiny dataset (4 items x 5 epochs)
        orig_main()
        ckpt = root / "out" / "subj" / "stage3" / "ckpt"
        assert (ckpt / "net.pkl").exists() and (ckpt / "info.txt").exists()

        # --- inference on a synthetic trajectory ---
        import inference as inference_driver

        verts, faces = meta["verts"], meta["faces"]
        body = verts.copy()
        body[:, 2] -= 2.0
        traj = {
            "pred": np.stack([verts, verts + np.array([0.004, 0.002, 0], np.float32)]),
            "cloth_faces": faces,
            "obstacle": np.stack([body, body]),
            "obstacle_faces": faces,
            "garment_names": ["subj"],
        }
        traj_path = root / "traj.pkl"
        with open(traj_path, "wb") as f:
            pickle.dump(traj, f)
        out_path = root / "render_out"
        monkeypatch.setattr(sys, "argv", [
            "inference.py", "--traj_path", str(traj_path),
            "--output_path", str(out_path), "--sh_degree", "0",
            "--texture_size", "32", "--width", "64", "--height", "64"])
        inference_driver.main()
        renders = sorted((out_path / "renders").glob("*.png"))
        assert len(renders) == 2
        from PIL import Image
        img = np.array(Image.open(renders[0]))
        assert img.shape == (64, 64 * 3, 3)
        assert np.isfinite(img).all()
