"""Novel-POSE evaluation on the converged checkpoint (ref protocol #2).

The reference's second headline metric is unseen-pose synthesis
(test_novel_pose True: frames past the training window, appearance latent
pinned to the last trained frame — ref multi_view_dataset.py novel-pose
windows, supplementary_material.md). This regenerates the shaded fixture
with EXTRA frames (same seed => training frames 0..5 identical), loads
the convergence run's checkpoint, and evaluates the held-out camera on
the two never-trained poses. Writes NOVELPOSE_r05.json.

Run after tools/convergence_run.py (shares its workdir checkpoint):
    python /root/repo/tools/novel_pose_eval.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train-workdir", default="/tmp/convergence_r05")
    ap.add_argument("--out", default="/root/repo/NOVELPOSE_r05.json")
    ap.add_argument("--workdir", default="/tmp/novelpose_r05")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from fake_data import make_fake_zju

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from convergence_run import make_cfg

    n_cams = 6
    root = os.path.join(args.workdir, "CoreView_999")
    if not os.path.exists(f"{root}/annots.npy"):
        print("rendering extended shaded fixture (8 frames)...", flush=True)
        make_fake_zju(root, n_frames=8, n_cams=n_cams, hw=512,
                      n_verts=6890, shaded=True)

    cfg = make_cfg(root, args.workdir, tiny=False, n_cams=n_cams,
                   ep_iter=250)
    cfg.trained_model_dir = os.path.join(args.train_workdir, "trained")
    cfg.test_novel_pose = True
    cfg.num_novel_pose_frame = 2
    cfg.test.frame_sampler_interval = 1

    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)

    from neuralbody_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    begin = trainer.resume()
    assert begin > 0, "no checkpoint found — run convergence_run first"
    print(f"loaded checkpoint at epoch {begin}", flush=True)

    t0 = time.perf_counter()
    m = trainer.validate()
    dt = time.perf_counter() - t0
    out = {
        "metric": "novel_pose_psnr",
        "platform": platform,
        "protocol": ("test_novel_pose: frames 6-7 (never trained, poses "
                     "past the training window), held-out camera, latent "
                     "pinned to the last trained frame (ref "
                     "multi_view_dataset novel-pose windows)"),
        "value": round(float(m["psnr"]), 3),
        "ssim": round(float(m["ssim"]), 4),
        "trained_epochs": begin,
        "eval_s": round(dt, 1),
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
