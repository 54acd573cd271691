"""Stage-2 integration tests on the synthetic scene (SURVEY.md §4):
convergence of the jitted template step, sharded-vs-single-device parity,
and densification in the loop."""
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_garments_tpu.config import OptimizationParams
from gaussian_garments_tpu.data import synthetic as syn
from gaussian_garments_tpu.models import mesh_gaussian as MG
from gaussian_garments_tpu.models import mesh_model as MM
from gaussian_garments_tpu.renderer import BatchedCameras, RasterConfig
from gaussian_garments_tpu.training import s2 as S2

CFG = RasterConfig(tile_capacity=128, chunk_tiles=16)


def _opt():
    parser = ArgumentParser()
    return OptimizationParams(parser).extract(parser.parse_args([]))


@pytest.fixture(scope="module")
def scene():
    return syn.make_scene(n_cams=4, nx=10, ny=10, width=64, height=64)


def _init_state(scene, perturb=0.0, seed=0):
    cams, verts, faces, uvs, colors = scene
    v0 = verts
    if perturb:
        v0 = verts + np.random.RandomState(seed).randn(*verts.shape).astype(np.float32) * perturb
    params, aux, binding, counter = MG.create_from_template(v0, faces, colors, max_sh_degree=0)
    mesh = MM.create(v0, faces)
    return S2.init_state(params, aux, binding, mesh), counter, cams, verts, faces


class TestTemplateStep:
    def test_loss_decreases(self, scene):
        state, counter, cams, verts, faces = _init_state(scene, perturb=0.01)
        step = S2.make_s2_step(_opt(), mode="template_p1", use_body=False, raster_cfg=CFG)
        batch = BatchedCameras.from_cameras(cams)
        bg = jnp.zeros(3)
        state, ld0, _ = step(state, batch, bg, 1.6e-3, 1.6e-3)
        for _ in range(60):
            state, ld, m = step(state, batch, bg, 1.6e-3, 1.6e-3)
        assert np.isfinite(float(m["loss"]))
        assert float(ld["img"]) < 0.5 * float(ld0["img"])

    def test_phase1_splats_only_no_energies(self, scene):
        """Reference template phase 1 optimizes SPLATS ONLY and applies no
        cloth energies: mesh.v is created requires_grad=False
        (scene/mesh_model.py:13), the phase-2 switch enables it
        (s2_registration.py:217-225), and the energy add is gated on
        mesh.v.requires_grad (:264-267). PARITY.md 'template phase gating'."""
        state, counter, cams, verts, faces = _init_state(scene, perturb=0.01)
        step = S2.make_s2_step(_opt(), mode="template_p1", use_body=False, raster_cfg=CFG)
        batch = BatchedCameras.from_cameras(cams)
        v0 = state.mesh.v
        p0 = state.params
        state, ld, _ = step(state, batch, jnp.zeros(3), 1.6e-3, 1.6e-3)
        np.testing.assert_array_equal(np.asarray(state.mesh.v), np.asarray(v0))
        for k in ("bending", "stretching", "collision", "virtual_edge"):
            assert k not in ld
        assert float(jnp.abs(state.params.xyz - p0.xyz).max()) > 0

    def test_phase2_only_moves_vertices(self, scene):
        state, counter, cams, verts, faces = _init_state(scene, perturb=0.01)
        step = S2.make_s2_step(_opt(), mode="template_p2", use_body=False, raster_cfg=CFG)
        batch = BatchedCameras.from_cameras(cams)
        p0 = state.params
        v0 = state.mesh.v
        state, _, _ = step(state, batch, jnp.zeros(3), 1.6e-3, 1.6e-3)
        for name in ("xyz", "opacity", "scaling"):
            np.testing.assert_array_equal(
                np.asarray(getattr(state.params, name)), np.asarray(getattr(p0, name))
            )
        assert float(jnp.abs(state.mesh.v - v0).max()) > 0

    def test_densify_in_loop(self, scene):
        state, counter, cams, verts, faces = _init_state(scene)
        opt = _opt()
        step = S2.make_s2_step(opt, mode="template_p1", use_body=False, raster_cfg=CFG)
        batch = BatchedCameras.from_cameras(cams)
        for _ in range(20):
            state, _, _ = step(state, batch, jnp.zeros(3), 1.6e-3, 1.6e-3)
        n_before = int(state.aux.alive.sum())
        # force a permissive threshold so something clones
        state2, counter2, stats = S2.densify_and_prune_state(
            state, opt, cameras_extent=2.0, max_screen_size=None,
            binding_counter=counter, rng=np.random.RandomState(0),
        )
        assert stats["n_alive"] == int(state2.aux.alive.sum())
        assert (counter2 >= 1).all()
        # step still runs at the (possibly regrown) capacity
        step2 = S2.make_s2_step(opt, mode="template_p1", use_body=False, raster_cfg=CFG)
        state2, ld, m = step2(state2, batch, jnp.zeros(3), 1.6e-3, 1.6e-3)
        assert np.isfinite(float(m["loss"]))


class TestDeadSlots:
    """Capacity padding must be gradient-safe: dead (alive=False) slots sit in
    the differentiable local→world chain, and a NaN there leaks into the
    *shared* face-frame (vertex) gradients through 0·NaN — the template-fit
    NaN blowup after the first densify regrowth (found at r2: all vertices
    poisoned within ~100 iters of the capacity 1922→3027 repack)."""

    def test_step_with_dead_slots_stays_finite(self, scene):
        cams, verts, faces, uvs, colors = scene
        n = len(faces)
        params, aux, binding, counter = MG.create_from_template(
            verts, faces, colors, max_sh_degree=0, capacity=n + 64)
        # dead-slot rotations pad as identity quats, never all-zero
        rot = np.asarray(params.rotation)
        np.testing.assert_array_equal(rot[n:, 0], 1.0)
        mesh = MM.create(verts, faces)
        state = S2.init_state(params, aux, binding, mesh)
        step = S2.make_s2_step(_opt(), mode="template_p1", use_body=False, raster_cfg=CFG)
        batch = BatchedCameras.from_cameras(cams)
        for _ in range(3):
            state, ld, m = step(state, batch, jnp.zeros(3), 1.6e-3, 1.6e-3)
        assert np.isfinite(np.asarray(state.mesh.v)).all()
        for name in ("xyz", "scaling", "rotation", "opacity"):
            assert np.isfinite(np.asarray(getattr(state.params, name))).all(), name

    def test_legacy_zero_quat_padding_stays_finite(self, scene):
        """Checkpoints written before the identity-quat padding fix carry
        all-zero dead-slot quaternions; the safe-norm in quaternion.normalize
        must keep gradients finite for those too."""
        cams, verts, faces, uvs, colors = scene
        n = len(faces)
        params, aux, binding, counter = MG.create_from_template(
            verts, faces, colors, max_sh_degree=0, capacity=n + 64)
        rot = np.asarray(params.rotation).copy()
        rot[n:] = 0.0
        state = S2.init_state(params.replace(rotation=jnp.asarray(rot)), aux, binding,
                              MM.create(verts, faces))
        step = S2.make_s2_step(_opt(), mode="template_p1", use_body=False, raster_cfg=CFG)
        batch = BatchedCameras.from_cameras(cams)
        state, ld, m = step(state, batch, jnp.zeros(3), 1.6e-3, 1.6e-3)
        assert np.isfinite(np.asarray(state.mesh.v)).all()
        assert np.isfinite(np.asarray(state.params.rotation)).all()


class TestSharded:
    def test_shard_map_matches_single_device(self, scene):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        state, counter, cams, verts, faces = _init_state(scene, perturb=0.01)
        opt = _opt()
        batch = BatchedCameras.from_cameras(cams)  # 4 cameras
        bg = jnp.zeros(3)

        # single device reference
        step1 = S2.make_s2_step(opt, mode="template_p1", use_body=False, raster_cfg=CFG)
        s_ref, ld_ref, m_ref = step1(state, batch, bg, 1.6e-3, 1.6e-3)

        # 4-way camera sharding
        mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("data",))
        stepn = S2.make_s2_step(opt, mode="template_p1", use_body=False,
                                raster_cfg=CFG, axis_name="data", jit=False)
        sharded = jax.jit(shard_map(
            stepn, mesh=mesh,
            in_specs=(P(), P("data"), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ))
        s_shard, ld_shard, m_shard = sharded(state, batch, bg, 1.6e-3, 1.6e-3)

        np.testing.assert_allclose(float(m_shard["loss"]), float(m_ref["loss"]), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(s_shard.mesh.v), np.asarray(s_ref.mesh.v), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_shard.params.xyz), np.asarray(s_ref.params.xyz), atol=1e-6
        )
        # densification stats identical too
        np.testing.assert_allclose(
            np.asarray(s_shard.aux.xyz_gradient_accum),
            np.asarray(s_ref.aux.xyz_gradient_accum), rtol=1e-4, atol=1e-7,
        )
