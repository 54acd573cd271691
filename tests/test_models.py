"""Model-layer tests: mesh-binding math, cloth energies (zero at rest,
finite-difference gradients), densify/prune bookkeeping, face frames."""
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_garments_tpu import geometry as geo
from gaussian_garments_tpu.data import synthetic as syn
from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.models import mesh_gaussian as MG
from gaussian_garments_tpu.models import mesh_model as MM


def _template():
    verts, faces, _ = syn.make_cloth_template(8, 8)
    return verts, faces


class TestGeometry:
    def test_face_orientation_orthonormal(self, rng):
        verts, faces = _template()
        orien, scale = geo.compute_face_orientation(jnp.asarray(verts), jnp.asarray(faces.astype(np.int32)))
        o = np.asarray(orien)
        eye = np.einsum("fij,fkj->fik", o.transpose(0, 2, 1), o.transpose(0, 2, 1))
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(faces), 1, 1)), atol=1e-5)
        assert (np.asarray(scale) > 0).all()

    def test_barycentric_sum_and_reconstruct(self, rng):
        tri = rng.randn(20, 3, 2).astype(np.float32)
        w = rng.rand(20, 3).astype(np.float32)
        w /= w.sum(1, keepdims=True)
        pts = np.einsum("nk,nkc->nc", w, tri)
        a, b, c = geo.barycentric_2d(jnp.asarray(tri), jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(a + b + c), np.ones(20), atol=1e-5)
        np.testing.assert_allclose(np.stack([a, b, c], -1), w, atol=1e-4)

    def test_connectivity_counts(self):
        verts, faces = _template()
        edges = geo.get_vertex_connectivity(faces)
        adj_f, adj_e = geo.get_face_connectivity_combined(faces)
        # Euler on a disk-topology grid: every interior edge borders 2 faces
        assert len(adj_f) == len(adj_e)
        assert len(adj_f) < len(edges)
        # each adjacent pair actually shares the named edge
        f = faces
        for k in range(0, len(adj_f), 7):
            fa, fb = adj_f[k]
            e = set(adj_e[k])
            assert e.issubset(set(f[fa])) and e.issubset(set(f[fb]))

    def test_virtual_edges_on_opposed_sheets(self):
        # two parallel sheets with opposed normals -> virtual edges exist
        v1, f1, _ = syn.make_cloth_template(6, 6, ripple=0.0)
        v2 = v1.copy()
        v2[:, 2] -= 0.2  # below sheet 1: its rays (along -normal = -z) hit it
        f2 = f1[:, ::-1] + len(v1)  # flip winding so normals oppose
        v = np.concatenate([v1, v2])
        f = np.concatenate([f1, f2])
        ve, ve_len = geo.init_virtual_edge(v, f)
        assert len(ve) > 0
        np.testing.assert_allclose(ve_len, 0.2, atol=1e-3)


class TestMeshModel:
    def test_energies_zero_at_rest(self):
        verts, faces = _template()
        mesh = MM.create(verts, faces)
        assert abs(float(MM.stretching_energy(mesh))) < 1e-8
        # a rippled sheet has nonzero rest bending; compare against itself
        e0 = float(MM.bending_energy(mesh))
        assert np.isfinite(e0)
        assert float(MM.virtual_edge_energy(mesh)) == 0.0

    def test_stretching_grows_with_stretch(self):
        verts, faces = _template()
        mesh = MM.create(verts, faces)
        stretched = mesh.replace(v=mesh.v * jnp.asarray([1.2, 1.0, 1.0]))
        assert float(MM.stretching_energy(stretched)) > 1e-4

    def test_energy_gradients_finite_diff(self, rng):
        verts, faces = _template()
        mesh = MM.create(verts, faces)
        v0 = mesh.v + jnp.asarray(rng.randn(*verts.shape).astype(np.float32) * 0.01)

        def e(v):
            return MM.stretching_energy(mesh.replace(v=v)) + MM.bending_energy(mesh.replace(v=v))

        g = np.asarray(jax.grad(e)(v0))
        eps = 1e-3
        for idx in [(0, 0), (17, 2), (30, 1)]:
            vp = np.array(v0); vp[idx] += eps
            vm = np.array(v0); vm[idx] -= eps
            fd = (float(e(jnp.asarray(vp))) - float(e(jnp.asarray(vm)))) / (2 * eps)
            assert abs(fd - g[idx]) < 5e-2 * max(1.0, abs(fd)), (idx, fd, g[idx])

    def test_collision_penalty(self):
        verts, faces = _template()
        mesh = MM.create(verts, faces)
        # a fake body plane just above the cloth -> every vertex penetrates
        nn_points = np.asarray(verts) + np.array([0, 0, 0.05], np.float32)
        nn_normals = np.tile(np.array([[0, 0, 1]], np.float32), (len(verts), 1))
        m2 = mesh.replace(nn_points=jnp.asarray(nn_points), nn_normals=jnp.asarray(nn_normals), has_body=True)
        assert float(MM.collision_energy(m2)) > 0
        # body far below -> no penetration
        nn_points2 = np.asarray(verts) - np.array([0, 0, 1.0], np.float32)
        m3 = m2.replace(nn_points=jnp.asarray(nn_points2))
        assert float(MM.collision_energy(m3)) == 0.0

    def test_momentum_update_blends(self):
        verts, faces = _template()
        mesh = MM.create(verts, faces)
        v_new = mesh.v * 1.1
        m2 = MM.momentum_update(mesh, v_new)
        # Dm_inv moved toward the new pose but not fully
        assert not np.allclose(np.asarray(m2.dm_inv), np.asarray(mesh.dm_inv))


class TestMeshBinding:
    def test_world_xyz_at_zero_is_face_center(self):
        verts, faces = _template()
        colors = syn.face_checker_colors(faces, verts)
        params, aux, binding, counter = MG.create_from_template(verts, faces, colors, 0)
        frames = MG.compute_face_frames(jnp.asarray(verts), jnp.asarray(faces.astype(np.int32)))
        xyz = np.asarray(MG.world_xyz(params, jnp.asarray(binding.astype(np.int32)), frames))
        centers = verts[faces].mean(1)
        n = len(faces)
        np.testing.assert_allclose(xyz[:n], centers, atol=1e-5)

    def test_world_rotation_unit(self):
        verts, faces = _template()
        colors = syn.face_checker_colors(faces, verts)
        params, aux, binding, _ = MG.create_from_template(verts, faces, colors, 0)
        frames = MG.compute_face_frames(jnp.asarray(verts), jnp.asarray(faces.astype(np.int32)))
        rot = np.asarray(MG.world_rotation(params, jnp.asarray(binding.astype(np.int32)), frames))
        np.testing.assert_allclose(np.linalg.norm(rot, axis=1), 1.0, atol=1e-5)

    def test_local_world_roundtrip_under_rigid_motion(self, rng):
        """A rigidly-moved mesh must carry splats rigidly."""
        verts, faces = _template()
        colors = syn.face_checker_colors(faces, verts)
        params, aux, binding, _ = MG.create_from_template(verts, faces, colors, 0)
        params = params.replace(xyz=jnp.asarray(rng.randn(*params.xyz.shape).astype(np.float32) * 0.1))
        b = jnp.asarray(binding.astype(np.int32))
        f32 = jnp.asarray(faces.astype(np.int32))

        from gaussian_garments_tpu.utils.quaternion import quat_to_rotmat
        q = jnp.asarray(np.array([0.9, 0.1, 0.3, -0.2], np.float32))
        R = quat_to_rotmat(q)
        t = jnp.asarray(np.array([0.3, -0.2, 0.5], np.float32))
        v2 = verts @ np.asarray(R).T + np.asarray(t)

        x1 = MG.world_xyz(params, b, MG.compute_face_frames(jnp.asarray(verts), f32))
        x2 = MG.world_xyz(params, b, MG.compute_face_frames(jnp.asarray(v2), f32))
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x1) @ np.asarray(R).T + np.asarray(t), atol=1e-4)


class TestDensify:
    def test_clone_split_prune_bookkeeping(self, rng):
        verts, faces = _template()
        colors = syn.face_checker_colors(faces, verts)
        params, aux, binding, counter = MG.create_from_template(verts, faces, colors, 0)
        n0 = int(aux.alive.sum())
        adam = G.adam_init(params)

        # force every splat to want cloning: big accumulated grads, tiny scale
        aux = aux.replace(
            xyz_gradient_accum=jnp.ones_like(aux.xyz_gradient_accum),
            denom=jnp.ones_like(aux.denom),
        )
        p2, a2, ad2, b2, c2, stats = MG.densify_and_prune(
            params, aux, adam, binding, counter,
            verts, faces,
            max_grad=1e-8, min_opacity=0.0, extent=1.0,
            max_screen_size=None, percent_dense=10.0,  # huge -> all "small" -> clone
            rng=rng,
        )
        assert stats["n_clone"] == n0
        assert stats["n_alive"] == 2 * n0
        # each face's counter reflects its splats
        bb = b2[: stats["n_alive"]]
        counts = np.bincount(bb, minlength=len(faces))
        np.testing.assert_array_equal(counts, c2)

    def test_prune_keeps_one_per_face(self, rng):
        verts, faces = _template()
        colors = syn.face_checker_colors(faces, verts)
        params, aux, binding, counter = MG.create_from_template(verts, faces, colors, 0)
        n0 = int(aux.alive.sum())
        adam = G.adam_init(params)
        # opacity so low that everything would be pruned
        params = params.replace(opacity=jnp.full_like(params.opacity, -10.0))
        p2, a2, ad2, b2, c2, stats = MG.densify_and_prune(
            params, aux, adam, binding, counter, verts, faces,
            max_grad=1e9, min_opacity=0.5, extent=1.0,
            max_screen_size=None, percent_dense=0.01, rng=rng,
        )
        # binding guard: every face keeps its (single) splat
        assert stats["n_alive"] == n0
        assert (c2 >= 1).all()

    def test_base_model_densify(self, rng):
        pts = rng.randn(50, 3).astype(np.float32)
        cols = rng.rand(50, 3).astype(np.float32)
        params, aux = G.create_from_pcd(pts, cols, 1)
        adam = G.adam_init(params)
        aux = aux.replace(
            xyz_gradient_accum=jnp.ones_like(aux.xyz_gradient_accum) * 1.0,
            denom=jnp.ones_like(aux.denom),
        )
        p2, a2, ad2, stats = G.densify_and_prune(
            params, aux, adam, max_grad=0.5, min_opacity=0.005,
            extent=1.0, max_screen_size=None, percent_dense=0.01, rng=rng,
        )
        assert stats["n_alive"] >= 50  # clones+splits never shrink below start (opacity=0.1 > 0.005)
        assert a2.alive.sum() == stats["n_alive"]

    def test_reset_opacity(self, rng):
        pts = rng.randn(20, 3).astype(np.float32)
        cols = rng.rand(20, 3).astype(np.float32)
        params, aux = G.create_from_pcd(pts, cols, 0)
        adam = G.adam_init(params)
        p2, ad2 = G.reset_opacity(params, adam)
        op = np.asarray(G.get_opacity(p2))
        assert (op <= 0.01 + 1e-6).all()
        assert float(jnp.abs(ad2.mu.opacity).max()) == 0.0


class TestPlyRoundtrip:
    def test_save_load(self, tmp_path, rng):
        pts = rng.randn(30, 3).astype(np.float32)
        cols = rng.rand(30, 3).astype(np.float32)
        params, aux = G.create_from_pcd(pts, cols, 2)
        path = str(tmp_path / "pc.ply")
        G.save_ply(path, params, np.asarray(aux.alive))
        params2, aux2 = G.load_ply(path, 2)
        for k in G.PARAM_NAMES:
            np.testing.assert_allclose(
                np.asarray(getattr(params2, k)), np.asarray(getattr(params, k)), atol=1e-6, err_msg=k
            )
