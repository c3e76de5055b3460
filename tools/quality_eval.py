"""End-to-end eval protocol on the real chip (VERDICT r2 #8).

Trains the flagship latent_xyzc model briefly on a fake-ZJU fixture at the
reference working point (512^2 views, 5mm voxels, 1024 rays x 64 samples),
then runs the full `run.py --type evaluate` path (sharded whole-image eval,
ref run.py:41-69) and records per-image latency, XLA compiles triggered
(proves the power-of-two ray bucketing bounds compiles), and PSNR/SSIM
into QUALITY_r04.json.

Run from anywhere: `python /root/repo/tools/quality_eval.py [--cpu]`.
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


def make_cfg(root, workdir, tiny=False):
    from neuralbody_tpu.config import make_cfg
    cfg = make_cfg(opts=["task", "if_nerf", "exp_name", "quality_r04"])
    cfg.H = cfg.W = 64 if tiny else 512
    cfg.ratio = 1.0
    cfg.N_rand = 64 if tiny else 1024
    cfg.N_samples = 8 if tiny else 64
    cfg.num_train_frame = 6
    cfg.training_view = [0, 1]
    cfg.voxel_size = [0.02] * 3 if tiny else [0.005] * 3
    cfg.nv = 400 if tiny else 6890
    cfg.tpu.chunk_rays = 256 if tiny else 2048
    cfg.tpu.steps_per_dispatch = 2 if tiny else 8
    cfg.ep_iter = 4 if tiny else 48
    cfg.train.epoch = 1 if tiny else 3
    cfg.train.num_workers = 2
    cfg.save_ep = 100
    cfg.save_latest_ep = 1
    cfg.eval_ep = 100  # eval measured separately below
    cfg.log_interval = 16
    cfg.record_dir = os.path.join(workdir, "record")
    cfg.trained_model_dir = os.path.join(workdir, "trained")
    cfg.result_dir = os.path.join(workdir, "result")
    cfg.test.frame_sampler_interval = 1
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
                    help="64^2 smoke run (CPU-friendly; no artifact claim)")
    ap.add_argument("--out", default="/root/repo/QUALITY_r04.json")
    ap.add_argument("--workdir", default="/tmp/quality_r04")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from fake_data import make_fake_zju

    root = os.path.join(args.workdir, "CoreView_999")
    if not os.path.exists(f"{root}/annots.npy"):
        make_fake_zju(root, n_frames=6, n_cams=3,
                      hw=64 if args.tiny else 512,
                      n_verts=400 if args.tiny else 6890)
    cfg = make_cfg(root, args.workdir, tiny=args.tiny)

    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)

    # -- train briefly (exercises the full Trainer on this chip) ----------
    from neuralbody_tpu.train.trainer import Trainer
    t0 = time.perf_counter()
    trainer = Trainer(cfg)
    trainer.fit()
    train_s = time.perf_counter() - t0
    print(f"train: {cfg.train.epoch} epochs x {cfg.ep_iter} iters "
          f"in {train_s:.1f}s", flush=True)

    # -- the run.py evaluate protocol (ref run.py:41-69) ------------------
    from neuralbody_tpu.config import build
    from neuralbody_tpu.datasets.loader import make_data_loader
    from neuralbody_tpu.parallel.mesh import make_mesh
    from neuralbody_tpu.parallel.train import ShardedEval

    eval_fn = ShardedEval(make_mesh(cfg.tpu.num_devices), trainer.settings)
    evaluator = build("evaluator", cfg.evaluator_module, cfg)
    loader = make_data_loader(cfg, "test")

    raw_counts, times = [], []
    for device_batch, meta in loader:
        raw_counts.append(int(np.asarray(device_batch["ray_mask"]).sum()))
        t0 = time.perf_counter()
        ret = eval_fn(trainer.params, device_batch)
        host = jax.tree.map(np.asarray, ret)  # device->host sync
        times.append(time.perf_counter() - t0)
        evaluator.evaluate(host, device_batch, meta)
    metrics = evaluator.summarize()

    compiles = len(eval_fn._steps)
    # first image of each bucket pays its compile; steady-state = the rest
    steady = sorted(times)[: max(1, len(times) - compiles)]
    out = {
        "metric": "eval_protocol",
        "platform": platform,
        "n_images": len(times),
        "image_hw": [cfg.H, cfg.W],
        "distinct_hit_ray_counts": len(set(raw_counts)),
        "eval_compiles": compiles,
        "ms_per_image_steady": round(1000 * float(np.mean(steady)), 1),
        "ms_per_image_all": round(1000 * float(np.mean(times)), 1),
        "psnr": round(float(metrics["psnr"]), 3),
        "ssim": round(float(metrics["ssim"]), 4),
        "train_epochs": cfg.train.epoch,
        "train_ep_iter": cfg.ep_iter,
        "train_s": round(train_s, 1),
        "train_rays_per_s": round(
            cfg.train.epoch * cfg.ep_iter * cfg.N_rand / train_s, 1),
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
