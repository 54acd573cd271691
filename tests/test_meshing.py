"""Native stage-1 meshing tests: FFT screened Poisson + SurfaceNets +
clustering remesh (replacing the reference's open3d Poisson depth-13 and
pyacvd cluster(8000), utils/initialisation_utils.py:144-170), and the
full post_process from a synthetic fused.ply to template.obj with no
optional dependencies."""
import numpy as np
import pytest


def _sphere_cloud(n=30000, noise=0.004, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (d * (1.0 + noise * rng.randn(n, 1))).astype(np.float32), d


def _signed_volume(v, f):
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    return float(np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0)


class TestMeshingPrimitives:
    def test_normals_match_sphere(self):
        from gaussian_garments_tpu.stages.meshing import estimate_normals

        pts, true_n = _sphere_cloud(8000)
        n = estimate_normals(pts)
        agree = np.abs(np.einsum("ij,ij->i", n, true_n))
        assert agree.mean() > 0.97          # PCA accuracy
        signed = np.einsum("ij,ij->i", n, true_n)
        assert np.mean(signed > 0) > 0.95   # MST orientation consistency

    def test_surface_nets_sphere_sdf(self):
        from gaussian_garments_tpu.stages.meshing import surface_nets

        res = 64
        g = np.mgrid[0:res, 0:res, 0:res].astype(np.float32) / (res - 1) - 0.5
        sdf = 0.35 - np.sqrt((g ** 2).sum(axis=0))   # >0 inside
        v, f = surface_nets(sdf, 0.0)
        r = np.linalg.norm(v / (res - 1) - 0.5, axis=1)
        assert abs(r.mean() - 0.35) < 0.01
        vol = _signed_volume(v / (res - 1) - 0.5, f)
        assert abs(vol - 4 / 3 * np.pi * 0.35 ** 3) / (4 / 3 * np.pi * 0.35 ** 3) < 0.05
        # consistent outward winding: volume positive and near-watertight
        e = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert np.mean(counts == 2) > 0.99

    def test_reconstruct_sphere(self):
        from gaussian_garments_tpu.stages.meshing import reconstruct_mesh

        pts, _ = _sphere_cloud()
        v, f = reconstruct_mesh(pts, target_faces=4000, res=96)
        assert 3000 <= len(f) <= 4400
        r = np.linalg.norm(v, axis=1)
        assert abs(r.mean() - 1.0) < 0.01 and r.std() < 0.02
        vol = _signed_volume(v, f)
        assert abs(vol - 4 / 3 * np.pi) / (4 / 3 * np.pi) < 0.08

    def test_largest_component(self):
        from gaussian_garments_tpu.stages.meshing import largest_component

        # two triangles sharing nothing: keep the bigger fan
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                      [5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32)
        f = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6]])
        v2, f2 = largest_component(v, f)
        assert len(f2) == 2 and len(v2) == 4

    def test_cluster_remesh_budget(self):
        from gaussian_garments_tpu.stages.meshing import reconstruct_mesh

        pts, _ = _sphere_cloud()
        v, f = reconstruct_mesh(pts, target_faces=1000, res=96)
        assert 700 <= len(f) <= 1100


class TestPostProcessEndToEnd:
    def test_fused_ply_to_template_obj(self, tmp_path):
        """Synthetic dense cloud (with green-background clutter) →
        template.obj, exercising the reference post_process chain
        (initialisation_utils.py:109-173) with zero optional deps."""
        from gaussian_garments_tpu.stages.s1 import post_process
        from gaussian_garments_tpu.utils.io import read_obj, store_ply

        pts, _ = _sphere_cloud(40000, noise=0.002)
        pts = pts * 0.3                      # ~person scale in meters
        colors = np.full((len(pts), 3), 128, np.float32)
        # green-background junk the filter must remove
        junk = np.random.RandomState(1).rand(2000, 3).astype(np.float32) * 2 - 1
        junk_c = np.tile(np.array([[20, 230, 20]], np.float32), (len(junk), 1))
        store_ply(tmp_path / "fused.ply",
                  np.concatenate([pts, junk]),
                  np.concatenate([colors, junk_c]))

        post_process(tmp_path, tmp_path, remesh_faces=2000, grid_res=96)

        tmpl = read_obj(tmp_path / "template.obj")
        v, f = np.asarray(tmpl["vertices"]), np.asarray(tmpl["faces"])
        assert 1200 <= len(f) <= 2200
        r = np.linalg.norm(v, axis=1)
        assert abs(r.mean() - 0.3) < 0.01    # junk filtered, sphere kept
        assert _signed_volume(v, f) > 0
