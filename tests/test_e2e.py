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
