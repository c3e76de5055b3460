"""Extract per-frame posed SMPL vertices from params files.

Equivalent of the reference zju_smpl/extract_vertices.py:1-41: for each
params/{i}.npy (poses, shapes, Rh, Th), run the JAX SMPL layer and write
vertices/{i}.npy in the world frame. The ZJU convention applies Rh/Th
OUTSIDE the model (vertices are saved in world space).

Usage:
    python tools/extract_vertices.py --data_root data/zju_mocap/CoreView_313 \
        --model_path data/smplx/smpl/SMPL_NEUTRAL.pkl [--new_params]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--params_dir", default="params")
    ap.add_argument("--out_dir", default="vertices")
    ap.add_argument("--new_params", action="store_true",
                    help="apply pose blend shapes (ref lbs.py:210-213)")
    args = ap.parse_args()

    from neuralbody_tpu.utils.platform import ensure_platform
    ensure_platform()
    import jax.numpy as jnp
    from neuralbody_tpu.utils import smpl

    model = smpl.load_model(args.model_path)
    params_dir = os.path.join(args.data_root, args.params_dir)
    out_dir = os.path.join(args.data_root, args.out_dir)
    os.makedirs(out_dir, exist_ok=True)

    for fn in sorted(os.listdir(params_dir), key=lambda s: int(s.split(".")[0])):
        i = fn.split(".")[0]
        params = np.load(os.path.join(params_dir, fn),
                         allow_pickle=True).item()
        poses = np.asarray(params["poses"]).reshape(-1)
        shapes = np.asarray(params["shapes"]).reshape(-1)[:10]
        verts, _ = smpl.smpl_forward(
            model, jnp.asarray(poses), jnp.asarray(shapes),
            Rh=jnp.asarray(np.asarray(params["Rh"]).reshape(3)),
            Th=jnp.asarray(np.asarray(params["Th"]).reshape(3)),
            new_params=args.new_params)
        np.save(os.path.join(out_dir, f"{i}.npy"),
                np.asarray(verts, np.float32))
        print(f"frame {i}: vertices saved")


if __name__ == "__main__":
    main()
