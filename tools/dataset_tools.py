"""Dataset-production tools: camera annotation, EasyMocap conversion,
occupancy voxelization, People-Snapshot processing.

Consolidates the reference's offline tooling as subcommands (ref:
tools/custom/get_annots.py, zju_smpl/easymocap_to_neuralbody.py,
lib/utils/light_stage/ply_to_occupancy.py:41-66, tools/process_snapshot.py):

    python tools/dataset_tools.py annots --input_dir my_capture
    python tools/dataset_tools.py easymocap --input_dir my_313 \
        --model_path SMPL_NEUTRAL.pkl
    python tools/dataset_tools.py occupancy --ply points.ply --out occ.npz
    python tools/dataset_tools.py snapshot --input_dir female-3-casual \
        --model_path SMPL_FEMALE.pkl
"""
import argparse
import glob
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def read_cams_yml(cam_names, intri="intri.yml", extri="extri.yml"):
    """intri/extri.yml -> cams dict in annots.npy convention (T in mm)."""
    import cv2
    fi = cv2.FileStorage(intri, cv2.FILE_STORAGE_READ)
    fe = cv2.FileStorage(extri, cv2.FILE_STORAGE_READ)
    cams = {"K": [], "D": [], "R": [], "T": []}
    for name in cam_names:
        cams["K"].append(fi.getNode(f"K_{name}").mat())
        cams["D"].append(fi.getNode(f"dist_{name}").mat().T)
        cams["R"].append(fe.getNode(f"Rot_{name}").mat())
        cams["T"].append(fe.getNode(f"T_{name}").mat() * 1000)
    return cams


def cmd_annots(args):
    os.chdir(args.input_dir)
    cam_dirs = sorted(os.listdir("images"))
    cams = read_cams_yml(cam_dirs)
    all_ims = []
    for d in cam_dirs:
        ims = np.array(sorted(glob.glob(osp.join("images", d, "*.jpg"))))
        all_ims.append(ims)
    n = min(len(i) for i in all_ims)
    ims = np.stack([i[:n] for i in all_ims], axis=1)
    annot = {"cams": cams,
             "ims": [{"ims": row.tolist()} for row in ims]}
    np.save("annots.npy", annot)
    print(f"annots.npy: {len(cam_dirs)} cams, {n} frames")


def cmd_easymocap(args):
    """EasyMocap output-smpl-3d json -> params/ + vertices/."""
    import jax.numpy as jnp
    from neuralbody_tpu.utils import smpl

    model = smpl.load_model(args.model_path)
    param_in = osp.join(args.input_dir, "output-smpl-3d", "smpl")
    param_out = osp.join(args.input_dir, "params")
    vert_out = osp.join(args.input_dir, "vertices")
    os.makedirs(param_out, exist_ok=True)
    os.makedirs(vert_out, exist_ok=True)

    for fn in sorted(os.listdir(param_in)):
        idx = int(osp.splitext(fn)[0])
        ann = json.load(open(osp.join(param_in, fn)))["annots"][0]
        poses = np.array(ann["poses"]).reshape(-1)
        Rh = np.array(ann["Rh"]).reshape(3)
        Th = np.array(ann["Th"]).reshape(3)
        shapes = np.array(ann["shapes"]).reshape(-1)[:10]
        np.save(osp.join(param_out, f"{idx}.npy"),
                {"poses": poses[None], "Rh": Rh[None], "Th": Th[None],
                 "shapes": shapes[None]})
        # EasyMocap poses exclude the global rotation (applied via Rh)
        full = np.zeros(model["parents"].shape[0] * 3)
        full[3:3 + len(poses)] = poses[:len(full) - 3]
        verts, _ = smpl.smpl_forward(
            model, jnp.asarray(full), jnp.asarray(shapes),
            Rh=jnp.asarray(Rh), Th=jnp.asarray(Th))
        np.save(osp.join(vert_out, f"{idx}.npy"),
                np.asarray(verts, np.float32))
        print(f"frame {idx}")


def cmd_occupancy(args):
    """Point cloud -> packed 256^3 occupancy npz (ref: ply_to_occupancy.py)."""
    from scipy.spatial import cKDTree
    from neuralbody_tpu.utils.mesh_io import load_ply

    pts, _ = load_ply(args.ply)
    res = args.res
    mn, mx = pts.min(0), pts.max(0)
    center = (mn + mx) / 2
    scale = (mx - mn).max() * 1.05
    grid_lin = (np.arange(res) + 0.5) / res - 0.5
    gx, gy, gz = np.meshgrid(grid_lin, grid_lin, grid_lin, indexing="ij")
    q = np.stack([gx, gy, gz], -1).reshape(-1, 3) * scale + center
    tree = cKDTree(pts)
    d, _ = tree.query(q, k=1)
    occ = (d < scale / res).reshape(res, res, res).astype(np.uint8)
    np.savez_compressed(
        args.out,
        compressed_occupancies=np.packbits(occ.reshape(-1)),
        bounds=np.stack([mn, mx]).astype(np.float32))
    print(f"occupancy: {occ.sum()} voxels occupied -> {args.out}")


def cmd_snapshot(args):
    """People-Snapshot: video + masks_hdf5 + consensus -> framework layout
    (ref: tools/process_snapshot.py:58-147, chumpy replaced by SMPL-JAX)."""
    import cv2
    import h5py
    import jax.numpy as jnp
    from neuralbody_tpu.utils import smpl

    root = args.input_dir
    os.makedirs(osp.join(root, "image"), exist_ok=True)
    os.makedirs(osp.join(root, "mask"), exist_ok=True)
    os.makedirs(osp.join(root, "vertices"), exist_ok=True)

    # frames from video
    videos = glob.glob(osp.join(root, "*.mp4"))
    if videos:
        cap = cv2.VideoCapture(videos[0])
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            cv2.imwrite(osp.join(root, "image", f"{i}.jpg"), frame)
            i += 1
        cap.release()

    # masks from hdf5 (eroded by 4, ref process_snapshot.py)
    mask_files = glob.glob(osp.join(root, "masks*.hdf5"))
    if mask_files:
        with h5py.File(mask_files[0], "r") as f:
            masks = f["masks"][:]
        kernel = np.ones((4, 4), np.uint8)
        for i, m in enumerate(masks):
            m = cv2.erode(m.astype(np.uint8), kernel)
            cv2.imwrite(osp.join(root, "mask", f"{i}.png"), m)

    # pose/trans + vertices from reconstructed_poses.hdf5
    pose_files = glob.glob(osp.join(root, "reconstructed_poses.hdf5"))
    if pose_files and args.model_path:
        model = smpl.load_model(args.model_path)
        with h5py.File(pose_files[0], "r") as f:
            poses = f["pose"][:]
            trans = f["trans"][:]
            betas = f["betas"][:]
        np.save(osp.join(root, "params.npy"),
                {"pose": poses, "trans": trans, "shapes": betas})
        for i in range(len(poses)):
            full = poses[i].copy()
            Rh = full[:3].copy()
            full[:3] = 0
            verts, _ = smpl.smpl_forward(
                model, jnp.asarray(full), jnp.asarray(betas[:10]),
                Rh=jnp.asarray(Rh), Th=jnp.asarray(trans[i]))
            np.save(osp.join(root, "vertices", f"{i}.npy"),
                    np.asarray(verts, np.float32))
    print("snapshot processing done")


def main():
    from neuralbody_tpu.utils.platform import ensure_platform
    ensure_platform()
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("annots")
    a.add_argument("--input_dir", required=True)

    e = sub.add_parser("easymocap")
    e.add_argument("--input_dir", required=True)
    e.add_argument("--model_path", required=True)

    o = sub.add_parser("occupancy")
    o.add_argument("--ply", required=True)
    o.add_argument("--out", required=True)
    o.add_argument("--res", type=int, default=256)

    s = sub.add_parser("snapshot")
    s.add_argument("--input_dir", required=True)
    s.add_argument("--model_path", default=None)

    args = ap.parse_args()
    {"annots": cmd_annots, "easymocap": cmd_easymocap,
     "occupancy": cmd_occupancy, "snapshot": cmd_snapshot}[args.cmd](args)


if __name__ == "__main__":
    main()
