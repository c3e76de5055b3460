"""SMPL-JAX layer tests: structural invariants + kinematic-chain parity."""
import numpy as np
import jax.numpy as jnp

from neuralbody_tpu.datasets import ray_utils
from neuralbody_tpu.utils import smpl


MODEL = smpl.make_synthetic_model(n_verts=200, n_joints=8, seed=1)
NJ = 8


class TestRodrigues:
    def test_matches_numpy_oracle(self, rng):
        rvecs = rng.randn(5, 3).astype(np.float32) * 0.5
        ours = np.asarray(smpl.rodrigues(jnp.array(rvecs)))
        ref = ray_utils.batch_rodrigues(rvecs.astype(np.float64))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_identity_at_zero(self):
        R = np.asarray(smpl.rodrigues(jnp.zeros((1, 3))))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-5)


class TestLbs:
    def test_rest_pose_is_template(self):
        verts, joints = smpl.lbs(MODEL, jnp.zeros(NJ * 3), jnp.zeros(10))
        np.testing.assert_allclose(
            np.asarray(verts), MODEL["v_template"], atol=1e-5)

    def test_shape_blend(self):
        shapes = jnp.zeros(10).at[0].set(2.0)
        verts, _ = smpl.lbs(MODEL, jnp.zeros(NJ * 3), shapes)
        expect = MODEL["v_template"] + 2.0 * MODEL["shapedirs"][..., 0]
        np.testing.assert_allclose(np.asarray(verts), expect, atol=1e-5)

    def test_root_rotation_rotates_everything(self, rng):
        poses = np.zeros(NJ * 3, np.float32)
        poses[:3] = [0.0, 0.7, 0.0]
        verts, joints = smpl.lbs(MODEL, jnp.array(poses), jnp.zeros(10))

        R = np.asarray(smpl.rodrigues(jnp.array(poses[:3])[None]))[0]
        j0 = MODEL["J_regressor"] @ MODEL["v_template"]
        root = j0[0]
        expect = (MODEL["v_template"] - root) @ R.T + root
        np.testing.assert_allclose(np.asarray(verts), expect, atol=1e-4)

    def test_rigid_transform_matches_numpy_chain(self, rng):
        """Kinematic chain parity vs the data-layer numpy implementation
        (ref: if_nerf_data_utils.py:374-406), which zju_smpl shares."""
        poses = (rng.randn(NJ, 3) * 0.3).astype(np.float32)
        j0 = MODEL["J_regressor"] @ MODEL["v_template"]

        rot = smpl.rodrigues(jnp.array(poses))
        _, A = smpl.rigid_transform(rot, jnp.array(j0), MODEL["parents"])

        # numpy oracle expects 24 joints; generalize by monkey-adapting
        ref = _numpy_rigid(poses.astype(np.float64), j0.astype(np.float64),
                           MODEL["parents"])
        np.testing.assert_allclose(np.asarray(A), ref, rtol=1e-3, atol=1e-4)

    def test_world_transform(self, rng):
        Rh = np.array([0.1, 0.2, 0.3], np.float32)
        Th = np.array([1.0, 2.0, 3.0], np.float32)
        v0, _ = smpl.lbs(MODEL, jnp.zeros(NJ * 3), jnp.zeros(10))
        vw, _ = smpl.smpl_forward(MODEL, jnp.zeros(NJ * 3), jnp.zeros(10),
                                  Rh=jnp.array(Rh), Th=jnp.array(Th))
        R = np.asarray(smpl.rodrigues(jnp.array(Rh)[None]))[0]
        np.testing.assert_allclose(
            np.asarray(vw), np.asarray(v0) @ R.T + Th, atol=1e-4)
        # and the dataset-side inverse recovers the SMPL frame
        back = (np.asarray(vw) - Th) @ R
        np.testing.assert_allclose(back, np.asarray(v0), atol=1e-4)


def _numpy_rigid(poses, joints, parents):
    """Reference-formula chain with the rest-joint correction."""
    n = len(joints)
    rots = ray_utils.batch_rodrigues(poses)
    rel = joints.copy()
    rel[1:] -= joints[parents[1:]]
    tf = np.zeros((n, 4, 4))
    tf[:, :3, :3] = rots
    tf[:, :3, 3] = rel
    tf[:, 3, 3] = 1
    chain = [tf[0]]
    for i in range(1, n):
        chain.append(chain[parents[i]] @ tf[i])
    A = np.stack(chain)
    jh = np.concatenate([joints, np.zeros((n, 1))], axis=1)
    corr = np.einsum("jab,jb->ja", A, jh)
    A[:, :3, 3] -= corr[:, :3]
    return A
