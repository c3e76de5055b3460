"""Blend-weight / warping preparation for the T-pose variant.

Equivalent of the reference tools/prepare_warping.py:1-225 (which depends on
the external C++ pysmplceres + psbody.mesh): for each frame, build a dense
grid over the POSED body bounds and map every grid point to its T-pose
location via the blend weights of its closest point ON the posed SMPL
surface — closest-face barycentric interpolation of the per-vertex
weights (ref prepare_warping.py:195-199; utils/surface.py replaces
psbody.mesh) — and the frame's inverse bone transforms. Output per frame:
ptot_pts.npy [X, Y, Z, 3] + pbounds/tbounds, consumed by the tpose
dataset/renderer.

Usage:
    python tools/prepare_warping.py --data_root <seq> \
        --model_path SMPL_NEUTRAL.pkl [--ptot_vsize 0.02]
"""
import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def warp_grid_for_frame(model, poses, ptot_vsize, pad=0.05):
    """Returns (ptot_pts [X,Y,Z,3] T-pose coords of the posed grid,
    pbounds [2,3], tbounds [2,3])."""
    import jax.numpy as jnp
    from neuralbody_tpu.ops.blend import ppts_to_pts
    from neuralbody_tpu.utils import smpl
    from neuralbody_tpu.utils.surface import barycentric_blend_weights

    # posed vertices in the SMPL (root) frame + skinning transforms
    pverts, _ = smpl.lbs(model, jnp.asarray(poses), jnp.zeros(10))
    pverts = np.asarray(pverts)
    rot = smpl.rodrigues(jnp.asarray(poses).reshape(-1, 3))
    joints = model["J_regressor"] @ model["v_template"]
    _, A = smpl.rigid_transform(rot, jnp.asarray(joints), model["parents"])

    tverts = model["v_template"]
    pbounds = np.stack([pverts.min(0) - pad, pverts.max(0) + pad])
    tbounds = np.stack([tverts.min(0) - pad, tverts.max(0) + pad])

    vs = np.asarray(ptot_vsize)
    axes = [np.arange(pbounds[0, a], pbounds[1, a] + vs[a], vs[a])
            for a in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    X, Y, Z = grid.shape[:3]
    flat = grid.reshape(-1, 3).astype(np.float32)

    if len(model["faces"]):
        # closest-SURFACE-point barycentric weights (reference fidelity)
        bw = barycentric_blend_weights(
            pverts, model["faces"], model["weights"], flat)  # [N, J]
    else:  # faceless point cloud (synthetic fixtures): closest vertex
        from scipy.spatial import cKDTree
        _, nn = cKDTree(pverts).query(flat, k=1)
        bw = model["weights"][nn]                  # [N, J]

    tpts = np.asarray(ppts_to_pts(jnp.asarray(flat), jnp.asarray(bw), A))
    return (tpts.reshape(X, Y, Z, 3).astype(np.float32),
            pbounds.astype(np.float32), tbounds.astype(np.float32))


def main():
    from neuralbody_tpu.utils.platform import ensure_platform
    ensure_platform()
    from neuralbody_tpu.utils import smpl

    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--params_dir", default="params")
    ap.add_argument("--out_dir", default="warping")
    ap.add_argument("--ptot_vsize", type=float, default=0.02)
    args = ap.parse_args()

    model = smpl.load_model(args.model_path)
    params_dir = osp.join(args.data_root, args.params_dir)
    out_dir = osp.join(args.data_root, args.out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # canonical template vertices: the tpose dataset voxelizes these
    np.save(osp.join(args.data_root, "tvertices.npy"),
            np.asarray(model["v_template"], np.float32))

    for fn in sorted(os.listdir(params_dir),
                     key=lambda s: int(s.split(".")[0])):
        i = fn.split(".")[0]
        params = np.load(osp.join(params_dir, fn), allow_pickle=True).item()
        poses = np.asarray(params["poses"]).reshape(-1)
        ptot, pbounds, tbounds = warp_grid_for_frame(
            model, poses, (args.ptot_vsize,) * 3)
        np.savez_compressed(osp.join(out_dir, f"{i}.npz"),
                            ptot_pts=ptot, pbounds=pbounds, tbounds=tbounds)
        print(f"frame {i}: warped grid {ptot.shape}")


if __name__ == "__main__":
    main()
