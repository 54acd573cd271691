"""Tracking-accuracy integration test (the actual purpose of stage 2):
sequence-mode optimization must pull a warm-started mesh toward the true
frame geometry, measured in vertex space — not just in photometric loss."""
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_garments_tpu.config import OptimizationParams
from gaussian_garments_tpu.data import synthetic as syn
from gaussian_garments_tpu.models import mesh_gaussian as MG
from gaussian_garments_tpu.models import mesh_model as MM
from gaussian_garments_tpu.renderer import BatchedCameras, RasterConfig
from gaussian_garments_tpu.training import s2 as S2


def _opt():
    parser = ArgumentParser()
    return OptimizationParams(parser).extract(parser.parse_args([]))


class TestSequenceTracking:
    def test_recovers_translated_frame(self):
        # true frame-1 geometry: the template translated + slightly bent
        verts, faces, uvs = syn.make_cloth_template(10, 10)
        true_v1 = verts + np.array([0.02, -0.015, 0.01], np.float32)
        true_v1[:, 2] += 0.02 * np.sin(4 * verts[:, 0])
        colors = syn.face_checker_colors(faces, verts)
        cams = syn.make_camera_ring(4, width=64, height_px=64)
        cams = syn.render_ground_truth(cams, true_v1, faces, colors)

        # splats fitted to the template (colors exact by construction)
        params, aux, binding, counter = MG.create_from_template(
            verts, faces, colors, max_sh_degree=0)
        # give splats the GT appearance so only geometry must be solved
        from gaussian_garments_tpu.utils.sh import rgb2sh
        params = params.replace(
            features_dc=jnp.asarray(rgb2sh(colors)[:, None, :]),
            opacity=jnp.full_like(params.opacity, 3.0),
            scaling=jnp.full_like(params.scaling, -2.4),  # world ≈ exp(-4.6) after face scale
        )
        mesh = MM.create(verts, faces)
        state = S2.init_state(params, aux, binding, mesh)

        opt = _opt()
        cfg = RasterConfig(tile_capacity=128, chunk_tiles=16)
        step = S2.make_s2_step(opt, mode="seq", use_body=False, raster_cfg=cfg)
        batch = BatchedCameras.from_cameras(cams)
        bg = jnp.zeros(3)

        err0 = float(jnp.abs(state.mesh.v - jnp.asarray(true_v1)).mean())
        vert_lr = 1e-3
        for _ in range(180):
            state, ld, m = step(state, batch, bg, vert_lr, vert_lr)
        err1 = float(jnp.abs(state.mesh.v - jnp.asarray(true_v1)).mean())

        assert np.isfinite(err1)
        # tracking reduces mean vertex error substantially
        assert err1 < 0.6 * err0, (err0, err1)
