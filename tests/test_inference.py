"""Inference-path tests: trajectory pkl contract, multi-garment visibility,
body compositing, texture (de)serialization round trip."""
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_garments_tpu import doll as D
from gaussian_garments_tpu.data import synthetic as syn
from gaussian_garments_tpu.models import avatar_gaussian as AG
from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.models import mesh_gaussian as MG


@pytest.fixture(scope="module")
def garment():
    verts, faces, uvs = syn.make_cloth_template(6, 6)
    bind, _ = AG.build_binding(uvs, faces, 32)
    n = bind.binding.shape[0]
    splats = G.GaussianParams(
        xyz=jnp.zeros((n, 3)), features_dc=jnp.ones((n, 1, 3)) * 0.2,
        features_rest=jnp.zeros((n, 3, 3)), scaling=jnp.full((n, 3), -4.0),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        opacity=jnp.full((n, 1), 2.0))
    return verts, faces, uvs, bind, splats


def _fake_update(verts, faces, bind, splats, dz=0.0):
    v = jnp.asarray(verts) + jnp.asarray([0.0, 0, dz])
    f = jnp.asarray(faces.astype(np.int32))
    frames = MG.compute_face_frames(v, f)
    anchor = AG.barycentric_3d(bind, v, f)
    n = bind.binding.shape[0]
    return {
        "xyz": AG.avatar_world_xyz(splats.xyz, bind, frames, anchor),
        "anchor": anchor,
        "rotation": MG.world_rotation(splats, bind.binding, frames),
        "scaling": MG.world_scaling(splats, bind.binding, frames),
        "opacity": G.get_opacity(splats),
        "shs": G.get_features(splats),
        "raw_shs": G.get_features(splats),
        "style": jnp.zeros((n, 1, 3)),
        "mesh_v": v,
        "mesh_f": f,
    }


class TestJointVisibility:
    def test_front_sheet_occludes_back(self, garment):
        verts, faces, uvs, bind, splats = garment
        cam = syn.make_camera_ring(1, radius=0.4, height=2.2, width=64, height_px=64)[0]
        # two copies of the sheet: one nearer the camera, one behind it
        u_front = _fake_update(verts, faces, bind, splats, dz=0.0)
        u_back = _fake_update(verts, faces, bind, splats, dz=0.0)
        # shift along the camera's viewing axis
        view_dir = np.asarray(cam.camera_center) - 0.0  # toward the camera
        view_dir = view_dir / np.linalg.norm(view_dir)
        u_front["mesh_v"] = u_front["mesh_v"] + jnp.asarray(view_dir * 0.3)
        u_front["anchor"] = u_front["anchor"] + jnp.asarray(view_dir * 0.3)
        u_front["xyz"] = u_front["xyz"] + jnp.asarray(view_dir * 0.3)
        vis = D.joint_visibility([u_front, u_back], cam.camera_center)
        n = bind.binding.shape[0]
        front_vis = float(vis[:n].mean())
        back_vis = float(vis[n:].mean())
        assert front_vis > 0.8
        assert back_vis < 0.4


class TestSimulationContract:
    def test_split_vertices(self, garment, tmp_path):
        verts, faces, uvs, bind, splats = garment
        # the split logic only needs templates; emulate two garments
        sim = object.__new__(D.Simulation)
        g = D.Garment(name="g", template={"vertices": verts}, bind=bind,
                      splats=splats, net=None, net_vars={}, sh_degree=0)
        sim.garments = [g, g]
        both = np.concatenate([verts, verts + 1.0])
        out = sim.split_vertices(both)
        assert len(out) == 2
        np.testing.assert_allclose(out[0], verts)
        np.testing.assert_allclose(out[1], verts + 1.0)


class TestBodyCompositing:
    def test_body_in_front_masks_garment(self, garment):
        verts, faces, uvs, bind, splats = garment
        cam = syn.make_camera_ring(1, radius=0.4, height=2.2, width=64, height_px=64)[0]
        view_dir = np.asarray(cam.camera_center) - 0.0  # toward the camera
        view_dir = view_dir / np.linalg.norm(view_dir)
        body_v = jnp.asarray(verts + view_dir[None] * 0.5)   # body in front
        f32 = jnp.asarray(faces.astype(np.int32))
        mask, body_img = D.body_mask_and_image(
            body_v, f32, [jnp.asarray(verts)], [f32], cam)
        assert float(mask.mean()) > 0.05         # body visible in front
        assert body_img.shape == (3, 64, 64)
        # compositing keeps body pixels where masked
        garment_rgb = jnp.ones((3, 64, 64))
        garment_a = jnp.ones((64, 64))
        out = D.composite(garment_rgb, garment_a, body_img, mask)
        m = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(out)[:, m], np.asarray(body_img)[:, m], atol=1e-6)

    def test_concat_bundle_vis_masks_opacity(self, garment):
        verts, faces, uvs, bind, splats = garment
        u = _fake_update(verts, faces, bind, splats)
        n = bind.binding.shape[0]
        vis = jnp.zeros((n,), bool)
        b = D.concat_bundle([u], vis, 0)
        assert float(jnp.abs(b.opacity).max()) == 0.0
