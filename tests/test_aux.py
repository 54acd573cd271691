"""Aux subsystem tests: ICP, COLMAP binary parsing, metric logging, debug
panels, network-GUI protocol framing, checkpoint round-trip."""
import json
import socket
import struct
import threading

import numpy as np
import pytest

from gaussian_garments_tpu.ops import icp as ICP
from gaussian_garments_tpu.utils import colmap as CM
from gaussian_garments_tpu.utils.logging import MetricLogger, StepTimer, debug_panel


class TestICP:
    def test_kabsch_exact(self, rng):
        src = rng.randn(100, 3)
        from scipy.spatial.transform import Rotation
        R = Rotation.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
        t = np.array([0.3, 1.0, -0.5])
        dst = src @ R.T + t
        T = ICP.kabsch(src, dst)
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-8)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-8)

    def test_icp_recovers_small_transform(self, rng):
        pts = rng.rand(500, 3) * 2
        from scipy.spatial.transform import Rotation
        R = Rotation.from_rotvec([0.05, 0.08, -0.04]).as_matrix()
        t = np.array([0.05, -0.02, 0.03])
        target = pts @ R.T + t
        T = ICP.registration_icp(pts, target, max_correspondence_distance=1.0)
        aligned = ICP.transform_points(pts, T)
        assert np.abs(aligned - target).max() < 2e-2

    def test_voxel_and_outliers(self, rng):
        pts = np.concatenate([rng.rand(1000, 3) * 0.1, np.array([[10.0, 10, 10]])])
        down = ICP.voxel_downsample(pts, 0.02)
        assert len(down) < len(pts)
        clean = ICP.remove_radius_outliers(down, nb_points=3, radius=0.05)
        assert not (clean > 5).any()


class TestColmap:
    def test_points3d_binary_roundtrip(self, tmp_path, rng):
        n = 17
        xyz = rng.randn(n, 3)
        rgb = rng.randint(0, 255, (n, 3))
        err = rng.rand(n)
        path = tmp_path / "points3D.bin"
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", n))
            for i in range(n):
                f.write(struct.pack("<QdddBBBd", i, *xyz[i], *rgb[i].astype(np.uint8), err[i]))
                track = [(0, 0), (1, 2)]
                f.write(struct.pack("<Q", len(track)))
                for im, p in track:
                    f.write(struct.pack("<ii", im, p))
        x, c, e = CM.read_points3D_binary(path)
        np.testing.assert_allclose(x, xyz)
        np.testing.assert_allclose(c, rgb)
        np.testing.assert_allclose(e[:, 0], err)

    def test_qvec2rotmat(self):
        np.testing.assert_allclose(CM.qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))


class TestLogging:
    def test_metric_logger_averages_and_jsonl(self, tmp_path):
        log = MetricLogger(str(tmp_path / "m.jsonl"))
        log.log(1, {"loss": 2.0})
        avg = log.log(2, {"loss": 4.0}, n_splats=100)
        assert abs(avg["loss"] - 3.0) < 1e-9
        log.close()
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        assert len(lines) == 2 and lines[1]["n_splats"] == 100.0

    def test_step_timer(self):
        t = StepTimer()
        with t.phase("x"):
            pass
        assert "x" in t.avg

    def test_debug_panel_shape(self, rng, tmp_path):
        gt = rng.rand(3, 8, 8).astype(np.float32)
        mask = rng.rand(1, 8, 8).astype(np.float32)
        rd = rng.rand(3, 8, 8).astype(np.float32)
        panel = debug_panel(gt, mask, rd, path=str(tmp_path / "p.png"))
        assert panel.shape == (8, 32, 3)
        assert (tmp_path / "p.png").exists()


class TestNetworkGUI:
    def test_protocol_roundtrip(self):
        from gaussian_garments_tpu.network_gui import NetworkGUI

        gui = NetworkGUI()
        gui.init("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]

        msg = {
            "resolution_x": 32, "resolution_y": 16, "train": True,
            "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False, "keep_alive": True,
            "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).ravel().astype(float)),
            "view_projection_matrix": list(np.eye(4).ravel().astype(float)),
        }
        received = {}

        def client():
            s = socket.create_connection(("127.0.0.1", port))
            payload = json.dumps(msg).encode()
            s.sendall(len(payload).to_bytes(4, "little") + payload)
            img = s.recv(32 * 16 * 3)
            n = int.from_bytes(s.recv(4), "little")
            received["verify"] = s.recv(n).decode()
            s.close()

        th = threading.Thread(target=client)
        th.start()
        import time
        for _ in range(500):
            gui.try_connect()
            if gui.conn is not None:
                break
            time.sleep(0.01)
        assert gui.conn is not None
        cam, do_training, *_ = gui.receive()
        assert cam.image_width == 32 and do_training
        gui.send(bytes(32 * 16 * 3), "ok")
        th.join()
        assert received["verify"] == "ok"


class TestS3Checkpoint:
    def test_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from types import SimpleNamespace
        from gaussian_garments_tpu.models import gaussian as G
        from gaussian_garments_tpu.models.adam import tree_adam_init
        from gaussian_garments_tpu.training.checkpoints import load_s3_ckpt, save_s3_ckpt

        splats = G.GaussianParams(
            xyz=jnp.zeros((5, 3)), features_dc=jnp.ones((5, 1, 3)),
            features_rest=jnp.zeros((5, 3, 3)), scaling=jnp.zeros((5, 3)),
            rotation=jnp.zeros((5, 4)), opacity=jnp.zeros((5, 1)))
        state = SimpleNamespace(
            net_params={"w": jnp.ones((2, 2))}, net_buffers={"n": jnp.zeros(3)},
            splats=splats, net_adam=tree_adam_init({"w": jnp.ones((2, 2))}),
            splat_adam=tree_adam_init(splats), iteration=jnp.int32(7))
        save_s3_ckpt(tmp_path, state, epoch=2)
        ck = load_s3_ckpt(tmp_path)
        assert ck["epoch"] == 2
        np.testing.assert_allclose(np.asarray(ck["net_params"]["w"]), 1.0)
        np.testing.assert_allclose(np.asarray(ck["splats"].features_dc), 1.0)

    @pytest.mark.parametrize("async_save", [False, True])
    def test_roundtrip_orbax(self, tmp_path, async_save):
        import jax.numpy as jnp
        from types import SimpleNamespace
        from gaussian_garments_tpu.models import gaussian as G
        from gaussian_garments_tpu.models.adam import tree_adam_init
        from gaussian_garments_tpu.training import checkpoints as C

        splats = G.GaussianParams(
            xyz=jnp.arange(15.0).reshape(5, 3), features_dc=jnp.ones((5, 1, 3)),
            features_rest=jnp.zeros((5, 3, 3)), scaling=jnp.zeros((5, 3)),
            rotation=jnp.zeros((5, 4)), opacity=jnp.zeros((5, 1)))
        state = SimpleNamespace(
            net_params={"w": jnp.full((2, 2), 3.0)}, net_buffers={"n": jnp.zeros(3)},
            splats=splats, net_adam=tree_adam_init({"w": jnp.ones((2, 2))}),
            splat_adam=tree_adam_init(splats), iteration=jnp.int32(7))
        C.save_s3_ckpt(tmp_path, state, epoch=4, backend="orbax",
                       async_save=async_save)
        C.wait_for_saves()
        assert C.has_s3_ckpt(tmp_path)
        ck = C.load_s3_ckpt(tmp_path)
        assert ck["epoch"] == 4 and ck["iteration"] == 7
        np.testing.assert_allclose(np.asarray(ck["net_params"]["w"]), 3.0)
        np.testing.assert_allclose(np.asarray(ck["splats"].xyz),
                                   np.arange(15.0).reshape(5, 3))

    def test_orbax_survives_killed_writer(self, tmp_path):
        """A writer killed mid-save leaves an uncommitted net.orbax dir and a
        stale *.orbax-checkpoint-tmp step; resume must not trip on the
        uncommitted dir and later saves must still succeed (before the
        CheckpointManager rewrite this broke every subsequent save with a
        tensorstore ENOENT rename race — reproduced on the s3 CLI)."""
        import jax.numpy as jnp
        from types import SimpleNamespace
        from gaussian_garments_tpu.models import gaussian as G
        from gaussian_garments_tpu.models.adam import tree_adam_init
        from gaussian_garments_tpu.training import checkpoints as C

        splats = G.GaussianParams(
            xyz=jnp.zeros((5, 3)), features_dc=jnp.ones((5, 1, 3)),
            features_rest=jnp.zeros((5, 3, 3)), scaling=jnp.zeros((5, 3)),
            rotation=jnp.zeros((5, 4)), opacity=jnp.zeros((5, 1)))
        state = SimpleNamespace(
            net_params={"w": jnp.ones((2, 2))}, net_buffers={"n": jnp.zeros(3)},
            splats=splats, net_adam=tree_adam_init({"w": jnp.ones((2, 2))}),
            splat_adam=tree_adam_init(splats), iteration=jnp.int32(1))

        # killed before the first commit: empty net.orbax must NOT look
        # like a resumable checkpoint
        od = tmp_path / "ckpt" / "net.orbax"
        od.mkdir(parents=True)
        assert not C.has_s3_ckpt(tmp_path)

        # killed mid-write: a stale uncommitted tmp step dir with junk in it
        junk = od / "7.orbax-checkpoint-tmp-1234567"
        junk.mkdir()
        (junk / "garbage").write_text("x")
        assert not C.has_s3_ckpt(tmp_path)

        C.save_s3_ckpt(tmp_path, state, epoch=7, backend="orbax")
        C.wait_for_saves()
        assert C.has_s3_ckpt(tmp_path)
        assert C.load_s3_ckpt(tmp_path)["epoch"] == 7
        # the next epoch's save keeps working and resume picks the latest
        C.save_s3_ckpt(tmp_path, state, epoch=8, backend="orbax")
        C.wait_for_saves()
        assert C.load_s3_ckpt(tmp_path)["epoch"] == 8

    def test_orbax_same_epoch_resave(self, tmp_path):
        """s3_appearance.py saves mid-epoch (save_iterations cadence) and
        again at epoch end with the SAME step=epoch. orbax's force=True does
        not overwrite an existing step (it raises StepAlreadyExistsError);
        the saver must delete the stale step first — async mid-epoch + sync
        end-of-epoch is the exact crash pattern from ADVICE r2."""
        import jax.numpy as jnp
        from types import SimpleNamespace
        from gaussian_garments_tpu.models import gaussian as G
        from gaussian_garments_tpu.models.adam import tree_adam_init
        from gaussian_garments_tpu.training import checkpoints as C

        splats = G.GaussianParams(
            xyz=jnp.zeros((5, 3)), features_dc=jnp.ones((5, 1, 3)),
            features_rest=jnp.zeros((5, 3, 3)), scaling=jnp.zeros((5, 3)),
            rotation=jnp.zeros((5, 4)), opacity=jnp.zeros((5, 1)))

        def mk_state(it):
            return SimpleNamespace(
                net_params={"w": jnp.full((2, 2), float(it))},
                net_buffers={"n": jnp.zeros(3)}, splats=splats,
                net_adam=tree_adam_init({"w": jnp.ones((2, 2))}),
                splat_adam=tree_adam_init(splats), iteration=jnp.int32(it))

        # async mid-epoch save, then the end-of-epoch sync save of the SAME
        # epoch while the async write may still be in flight
        C.save_s3_ckpt(tmp_path, mk_state(100), epoch=1, backend="orbax",
                       async_save=True)
        C.save_s3_ckpt(tmp_path, mk_state(250), epoch=1, backend="orbax")
        C.wait_for_saves()
        ck = C.load_s3_ckpt(tmp_path)
        assert ck["epoch"] == 1 and ck["iteration"] == 250
        np.testing.assert_allclose(np.asarray(ck["net_params"]["w"]), 250.0)
        # and a third overwrite of the same step still works (sync + sync)
        C.save_s3_ckpt(tmp_path, mk_state(300), epoch=1, backend="orbax")
        C.wait_for_saves()
        assert C.load_s3_ckpt(tmp_path)["iteration"] == 300
