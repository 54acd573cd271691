"""LBS tests (SURVEY.md §4: "LBS identity pose = rest mesh") on a tiny
synthetic 3-joint chain model."""
import jax.numpy as jnp
import numpy as np

from gaussian_garments_tpu import lbs as L


def _toy_model(rng, n_verts=40, n_joints=4):
    verts = rng.rand(n_verts, 3).astype(np.float32)
    verts[:, 1] *= 2  # a vertical "limb"
    parents = np.array([0, 0, 1, 2])
    # joints along y
    jr = np.zeros((n_joints, n_verts), np.float32)
    for j in range(n_joints):
        band = (verts[:, 1] >= j * 0.5) & (verts[:, 1] < (j + 1) * 0.5)
        if band.sum() == 0:
            band[j] = True
        jr[j, band] = 1.0 / band.sum()
    w = np.zeros((n_verts, n_joints), np.float32)
    seg = np.clip((verts[:, 1] / 0.5).astype(int), 0, n_joints - 1)
    w[np.arange(n_verts), seg] = 1.0
    return L.SmplxModel(
        v_template=verts,
        shapedirs=np.zeros((n_verts, 3, 10), np.float32),
        expr_dirs=np.zeros((n_verts, 3, 10), np.float32),
        posedirs=np.zeros(((n_joints - 1) * 9, n_verts * 3), np.float32),
        J_regressor=jr,
        parents=parents,
        lbs_weights=w,
        left_hand_components=np.eye(45, dtype=np.float32)[:12],
        right_hand_components=np.eye(45, dtype=np.float32)[:12],
        pose_mean=np.zeros(165, np.float32),
        faces=np.zeros((1, 3), np.int64),
    )


class TestLBS:
    def test_rodrigues_identity_and_known(self, rng):
        r = np.asarray(L.batch_rodrigues(jnp.zeros((2, 3))))
        np.testing.assert_allclose(r, np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)
        # 90° about z
        r = np.asarray(L.batch_rodrigues(jnp.asarray([[0.0, 0, np.pi / 2]])))[0]
        np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_identity_pose_is_rest(self, rng):
        m = _toy_model(rng)
        n_j = m.J_regressor.shape[0]
        A, v, off = L.lbs(
            jnp.zeros((1, 20)), jnp.zeros((1, n_j * 3)),
            jnp.asarray(m.v_template),
            jnp.concatenate([jnp.asarray(m.shapedirs), jnp.asarray(m.expr_dirs)], axis=-1),
            jnp.asarray(m.posedirs), jnp.asarray(m.J_regressor), m.parents,
            jnp.asarray(m.lbs_weights),
        )
        np.testing.assert_allclose(np.asarray(v), m.v_template, atol=1e-5)
        np.testing.assert_allclose(np.asarray(A)[:, :3, :3],
                                   np.tile(np.eye(3), (n_j, 1, 1)), atol=1e-6)

    def test_root_rotation_rotates_everything(self, rng):
        m = _toy_model(rng)
        n_j = m.J_regressor.shape[0]
        pose = np.zeros((1, n_j * 3), np.float32)
        pose[0, 2] = np.pi / 2  # root rotation about z
        A, v, _ = L.lbs(
            jnp.zeros((1, 20)), jnp.asarray(pose), jnp.asarray(m.v_template),
            jnp.concatenate([jnp.asarray(m.shapedirs), jnp.asarray(m.expr_dirs)], axis=-1),
            jnp.asarray(m.posedirs), jnp.asarray(m.J_regressor), m.parents,
            jnp.asarray(m.lbs_weights),
        )
        # root joint location
        j0 = m.J_regressor[0] @ m.v_template
        R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        expected = (m.v_template - j0) @ R.T + j0
        np.testing.assert_allclose(np.asarray(v), expected, atol=1e-4)
