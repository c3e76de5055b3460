"""Convergence artifact (VERDICT r4 #1): train the flagship to plateau.

Trains latent_xyzc on the view-consistent shaded synthetic fixture
(tests/fake_data.py::make_fake_zju(shaded=True)) at the reference working
point (512^2, 5mm voxels, 1024 rays x 64 samples, lr 5e-4 exp decay —
configs/zju_mocap_exp/latent_xyzc_313.yaml recipe) and evaluates the
HELD-OUT camera every few epochs with the real run.py evaluate protocol
(ref run.py:41-69). Writes the PSNR/SSIM curve to QUALITY_r05.json.

Self-time-limited (CLAUDE.md: never kill mid-TPU-work): checks the wall
clock at epoch boundaries and exits cleanly within --budget-s.

Run: `python /root/repo/tools/convergence_run.py [--cpu --tiny]`.
NO PYTHONPATH (CLAUDE.md TPU gotcha) — this script inserts the repo root.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def make_cfg(root, workdir, tiny=False, n_cams=6, ep_iter=250):
    from neuralbody_tpu.config import make_cfg
    cfg = make_cfg(opts=["task", "if_nerf", "exp_name", "convergence_r05"])
    cfg.H = cfg.W = 96 if tiny else 512
    cfg.ratio = 1.0
    cfg.N_rand = 256 if tiny else 1024
    cfg.N_samples = 32 if tiny else 64
    cfg.num_train_frame = 6
    cfg.training_view = list(range(n_cams - 1))   # hold out the last camera
    cfg.voxel_size = [0.02] * 3 if tiny else [0.005] * 3
    cfg.nv = 400 if tiny else 6890
    cfg.tpu.chunk_rays = 256 if tiny else 2048
    cfg.tpu.steps_per_dispatch = 2 if tiny else 8
    cfg.ep_iter = ep_iter
    cfg.train.epoch = 10000        # driven manually by the budget loop
    cfg.train.num_workers = 2
    cfg.train.lr = 5e-4
    cfg.train.scheduler.type = "exponential"
    cfg.train.scheduler.gamma = 0.1
    # flagship yaml decays over 1000 ep x 500 it; scale to this run length
    cfg.train.scheduler.decay_epochs = 40 if not tiny else 30
    cfg.save_ep = 10000
    cfg.save_latest_ep = 10000     # checkpoints written by the budget loop
    cfg.eval_ep = 10000            # eval driven manually
    cfg.log_interval = 100
    cfg.record_interval = 50
    cfg.record_dir = os.path.join(workdir, "record")
    cfg.trained_model_dir = os.path.join(workdir, "trained")
    cfg.result_dir = os.path.join(workdir, "result")
    cfg.test.sampler = "FrameSampler"
    cfg.test.frame_sampler_interval = 2   # 3 of 6 frames per eval pass
    cfg.train_dataset.data_root = root
    cfg.train_dataset.human = "CoreView_999"
    cfg.train_dataset.ann_file = f"{root}/annots.npy"
    cfg.test_dataset.update(cfg.train_dataset)
    cfg.test_dataset.split = "test"
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="96^2 CPU-friendly learning-sanity run")
    ap.add_argument("--budget-s", type=float, default=1500.0)
    ap.add_argument("--eval-every", type=int, default=2,
                    help="evaluate the held-out view every N epochs")
    ap.add_argument("--out", default="/root/repo/QUALITY_r05.json")
    ap.add_argument("--workdir", default="/tmp/convergence_r05")
    args = ap.parse_args()
    t_start = time.perf_counter()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from fake_data import make_fake_zju

    n_cams = 4 if args.tiny else 6
    root = os.path.join(args.workdir, "CoreView_999")
    if not os.path.exists(f"{root}/annots.npy"):
        print("rendering shaded fixture...", flush=True)
        make_fake_zju(root, n_frames=6, n_cams=n_cams,
                      hw=96 if args.tiny else 512,
                      n_verts=400 if args.tiny else 6890, shaded=True)
    cfg = make_cfg(root, args.workdir, tiny=args.tiny, n_cams=n_cams,
                   ep_iter=50 if args.tiny else 250)

    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)

    from neuralbody_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    begin = trainer.resume()

    curve = []
    train_s = 0.0
    rays_done = 0
    epoch = begin
    while True:
        t0 = time.perf_counter()
        trainer.recorder.epoch = epoch
        trainer.train_epoch(epoch)
        dt = time.perf_counter() - t0
        train_s += dt
        rays_done += cfg.ep_iter * cfg.N_rand
        epoch += 1

        if epoch % args.eval_every == 0:
            m = trainer.validate()
            curve.append({"epoch": epoch, "step": epoch * cfg.ep_iter,
                          "psnr": round(float(m["psnr"]), 3),
                          "ssim": round(float(m["ssim"]), 4)})
            print(f"[{time.perf_counter() - t_start:7.1f}s] epoch {epoch} "
                  f"({dt:.1f}s/ep) held-out psnr {m['psnr']:.2f} "
                  f"ssim {m['ssim']:.4f}", flush=True)

        elapsed = time.perf_counter() - t_start
        # leave room for one more epoch + eval before the budget runs out
        if elapsed + 1.5 * dt + 20 > args.budget_s:
            break
        # plateau: < 0.1 dB PSNR spread AND no SSIM gain over the last
        # 6 evals (the tiny sanity run showed SSIM still climbing 0.48 ->
        # 0.56 while PSNR moved < 0.15 dB — PSNR alone stops too early)
        if len(curve) >= 10:
            last = curve[-6:]
            ps = [c["psnr"] for c in last]
            ss = [c["ssim"] for c in last]
            if (max(ps) - min(ps) < 0.1 and ss[-1] <= max(ss[:-1]) + 0.002
                    and ps[-1] >= max(c["psnr"] for c in curve) - 0.1):
                print("plateaued", flush=True)
                break

    trainer.save(epoch - 1, latest=True)
    if not curve or curve[-1]["epoch"] != epoch:
        m = trainer.validate()
        curve.append({"epoch": epoch, "step": epoch * cfg.ep_iter,
                      "psnr": round(float(m["psnr"]), 3),
                      "ssim": round(float(m["ssim"]), 4)})

    best = max(c["psnr"] for c in curve)
    out = {
        "metric": "held_out_view_psnr",
        "platform": platform,
        "fixture": ("shaded ellipsoid, view-consistent albedo+Lambert, "
                    f"{n_cams - 1} train views / 1 held-out, 6 frames, "
                    f"{cfg.H}^2"),
        "value": curve[-1]["psnr"],
        "best_psnr": round(best, 3),
        "final_ssim": curve[-1]["ssim"],
        "epochs": epoch,
        "steps": epoch * cfg.ep_iter,
        "rays_per_step": cfg.N_rand,
        "train_s": round(train_s, 1),
        "train_rays_per_s": round(rays_done / max(train_s, 1e-9), 1),
        "curve": curve,
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
