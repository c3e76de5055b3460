"""JAX SMPL body model: shape/pose blend shapes + LBS skinning.

TPU-native replacement for the reference's PyTorch SMPL layer (ref:
zju_smpl/smplmodel/body_model.py:22-153, lbs.py:140-235) and the chumpy
model in the People-Snapshot tooling (ref: tools/snapshot_smpl/smpl.py).
Pure functions over a model-data dict; jit/vmap-friendly. Used by the
offline vertex-extraction tools (ref: zju_smpl/extract_vertices.py) and by
the T-pose variant's canonical-space machinery.

Model data comes from the standard SMPL pickle (SMPL_NEUTRAL.pkl etc.);
`load_model` reads it, `make_synthetic_model` fabricates a small stand-in
for tests (no SMPL download in CI).
"""
from __future__ import annotations

import pickle

import numpy as np
import jax
import jax.numpy as jnp


def load_model(path):
    """SMPL pickle -> dict of numpy arrays (v_template, shapedirs, posedirs,
    J_regressor, weights, kintree/parents, faces)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def arr(x):
        # chumpy arrays / scipy sparse -> dense numpy
        if hasattr(x, "toarray"):
            x = x.toarray()
        return np.array(x, dtype=np.float64).astype(np.float32)

    posedirs = arr(data["posedirs"])                      # [V, 3, 207]
    return {
        "v_template": arr(data["v_template"]),            # [V, 3]
        "shapedirs": arr(data["shapedirs"])[..., :10],    # [V, 3, 10]
        "posedirs": posedirs.reshape(-1, posedirs.shape[-1]).T,  # [207, V*3]
        "J_regressor": arr(data["J_regressor"]),          # [J, V]
        "weights": arr(data["weights"]),                  # [V, J]
        "parents": np.array(data["kintree_table"][0]).astype(np.int32),
        "faces": np.array(data["f"]).astype(np.int32),
    }


def make_synthetic_model(n_verts=400, n_joints=24, seed=0, faces=False):
    """Small structurally-valid SMPL-like model for tests.

    faces=True triangulates the ellipsoid surface (convex hull) so the
    closest-face barycentric blend-weight path (utils/surface.py, used by
    tools/prepare_warping.py) is exercised; default keeps the faceless
    point cloud the older fixtures expect."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n_verts, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v *= np.array([0.3, 0.9, 0.15], np.float32)
    parents = np.zeros(n_joints, np.int32)
    for j in range(1, n_joints):
        parents[j] = rng.randint(0, j)
    J_regressor = rng.rand(n_joints, n_verts).astype(np.float32)
    J_regressor /= J_regressor.sum(1, keepdims=True)
    weights = rng.rand(n_verts, n_joints).astype(np.float32) ** 4
    weights /= weights.sum(1, keepdims=True)
    n_pose_basis = 9 * (n_joints - 1)
    return {
        "v_template": v,
        "shapedirs": 0.01 * rng.randn(n_verts, 3, 10).astype(np.float32),
        "posedirs": 0.01 * rng.randn(
            n_pose_basis, n_verts * 3).astype(np.float32),
        "J_regressor": J_regressor,
        "weights": weights,
        "parents": parents,
        "faces": (_hull_faces(v) if faces else np.zeros((0, 3), np.int32)),
    }


def _hull_faces(v):
    from scipy.spatial import ConvexHull
    return ConvexHull(np.asarray(v, np.float64)).simplices.astype(np.int32)


def rodrigues(rvecs):
    """Axis-angle [J, 3] -> rotation matrices [J, 3, 3] (jnp)."""
    angle = jnp.linalg.norm(rvecs + 1e-8, axis=-1, keepdims=True)
    axis = rvecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([
        zeros, -rz, ry,
        rz, zeros, -rx,
        -ry, rx, zeros,
    ], axis=-1).reshape(*rvecs.shape[:-1], 3, 3)
    ident = jnp.eye(3)
    return ident + sin * K + (1.0 - cos) * (K @ K)


def rigid_transform(rot_mats, joints, parents):
    """Forward kinematics: per-joint world transforms + skinning matrices A
    (ref: lbs.py batch_rigid_transform). rot_mats [J,3,3], joints [J,3]."""
    J = joints.shape[0]
    rel = joints.at[1:].add(-joints[parents[1:]])
    tf = jnp.zeros((J, 4, 4))
    tf = tf.at[:, :3, :3].set(rot_mats)
    tf = tf.at[:, :3, 3].set(rel)
    tf = tf.at[:, 3, 3].set(1.0)

    # sequential chain (J=24 is tiny; unrolled python loop jits fine)
    chain = [tf[0]]
    for j in range(1, J):
        chain.append(chain[int(parents[j])] @ tf[j])
    transforms = jnp.stack(chain)

    posed_joints = transforms[:, :3, 3]
    # remove the rest-pose joint location from the translation
    joints_h = jnp.concatenate([joints, jnp.zeros((J, 1))], axis=1)
    corr = jnp.einsum("jab,jb->ja", transforms, joints_h)
    A = transforms.at[:, :3, 3].add(-corr[:, :3])
    return posed_joints, A


def lbs(model, poses, shapes, new_params=False):
    """SMPL forward: axis-angle poses [72], shapes [10] -> verts [V, 3]
    in the SMPL (canonical root) frame, plus posed joints [J, 3]
    (ref: lbs.py:140-235; new_params toggles pose blend shapes,
    ref lbs.py:210-213)."""
    poses = poses.reshape(-1, 3)
    v_shaped = model["v_template"] + jnp.einsum(
        "vdk,k->vd", model["shapedirs"], shapes)
    joints = model["J_regressor"] @ v_shaped

    rot_mats = rodrigues(poses)
    if new_params:
        ident = jnp.eye(3)
        pose_feature = (rot_mats[1:] - ident).reshape(-1)
        pose_offsets = (pose_feature @ model["posedirs"]).reshape(-1, 3)
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    posed_joints, A = rigid_transform(rot_mats, joints,
                                      np.asarray(model["parents"]))

    T = jnp.einsum("vj,jab->vab", model["weights"], A)
    v_h = jnp.concatenate(
        [v_posed, jnp.ones((v_posed.shape[0], 1))], axis=1)
    verts = jnp.einsum("vab,vb->va", T, v_h)[:, :3]
    return verts, posed_joints


def smpl_forward(model, poses, shapes, Rh=None, Th=None, new_params=False):
    """World-space vertices: apply global rotation Rh (axis-angle) and
    translation Th after LBS (ref: body_model.py forward)."""
    verts, joints = lbs(model, poses, shapes, new_params=new_params)
    if Rh is not None:
        R = rodrigues(jnp.reshape(Rh, (1, 3)))[0]
        verts = verts @ R.T
        joints = joints @ R.T
    if Th is not None:
        verts = verts + jnp.reshape(Th, (1, 3))
        joints = joints + jnp.reshape(Th, (1, 3))
    return verts, joints
