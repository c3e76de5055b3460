"""Tool dispatch entry point (mirrors reference run.py):

    python run.py --type dataset|network|evaluate|visualize|light_stage|evaluate_nv --cfg_file ... opts

dataset:     iterate the data loader (pipeline smoke test, ref run.py:4-11)
network:     time forward renders (perf smoke, ref run.py:14-38)
evaluate:    PSNR/SSIM metrics on held-out views / unseen poses (ref :41-69)
visualize:   demo renders per the vis_* mode overlays (ref :72-123)
light_stage: point clouds -> packed occupancy volumes (ref :103-106)
evaluate_nv: score saved competitor renders against GT (ref :109-122)
"""
import time


def _setup():
    from neuralbody_tpu.config import make_cfg_from_args
    from neuralbody_tpu.utils.platform import ensure_platform
    ensure_platform()  # honor JAX_PLATFORMS despite the axon override
    cfg, args = make_cfg_from_args()
    cfg.perturb = 0  # deterministic samples at tool time (ref run.py:50)
    return cfg, args


def _build_eval_state(cfg):
    import jax

    from neuralbody_tpu.config import build
    from neuralbody_tpu import datasets, evaluators, models, renderer, visualizers  # noqa: F401
    from neuralbody_tpu.datasets.loader import make_data_loader, make_dataset
    from neuralbody_tpu.train.checkpoint import load_params

    dataset = make_dataset(cfg, "test")
    model_static = build("model_static", cfg.network_module, cfg, dataset)
    settings = build("renderer", cfg.renderer_module, cfg, model_static)

    init_fn, _ = build("network", cfg.network_module, cfg)
    params, bn_stats = init_fn(jax.random.PRNGKey(0))
    params, bn_stats, _ = load_params(
        cfg.trained_model_dir, params, bn_stats, epoch=cfg.test.epoch)

    # eval renders shard rays over all devices (ref evaluates on one GPU)
    from neuralbody_tpu.parallel.mesh import make_mesh
    from neuralbody_tpu.parallel.train import ShardedEval
    eval_fn = ShardedEval(make_mesh(cfg.tpu.num_devices), settings)

    loader = make_data_loader(cfg, "test", dataset=dataset)
    return params, settings, loader, eval_fn


def run_dataset(cfg):
    from neuralbody_tpu import datasets  # noqa: F401
    from neuralbody_tpu.datasets.loader import make_data_loader
    loader = make_data_loader(cfg, "train")
    for i, (batch, meta) in enumerate(loader):
        if i % 10 == 0:
            print(f"batch {i}: {batch['rgb'].shape[1]} rays")
    print("dataset OK")


def run_network(cfg):
    import jax.numpy as jnp

    params, settings, loader, eval_fn = _build_eval_state(cfg)
    times = []
    for i, (device_batch, meta) in enumerate(loader):
        t0 = time.perf_counter()
        ret = eval_fn(params, device_batch)
        # fetch a scalar: block_until_ready returns early on the tunneled
        # TPU and measures dispatch only (CLAUDE.md TPU timing gotcha)
        float(jnp.sum(ret["rgb_map"]))
        if i > 0:  # skip compile
            times.append(time.perf_counter() - t0)
        if i >= 10:
            break
    import numpy as np
    print(f"forward: {np.mean(times):.4f}s/batch over {len(times)} batches")


def run_evaluate(cfg):
    import jax
    import numpy as np

    from neuralbody_tpu.config import build

    params, settings, loader, eval_fn = _build_eval_state(cfg)
    evaluator = build("evaluator", cfg.evaluator_module, cfg)
    for device_batch, meta in loader:
        ret = eval_fn(params, device_batch)
        evaluator.evaluate(jax.tree.map(np.asarray, ret), device_batch, meta)
    return evaluator.summarize()


def run_visualize(cfg):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralbody_tpu.config import build

    params, settings, loader, eval_fn = _build_eval_state(cfg)
    visualizer = build("visualizer", cfg.visualizer_module, cfg)
    for device_batch, meta in loader:
        if cfg.vis_mesh:
            from neuralbody_tpu.renderer.mesh import extract_mesh
            batch = jax.tree.map(jnp.asarray, device_batch)
            output = extract_mesh(params, batch, meta, settings, cfg)
        else:
            output = jax.tree.map(np.asarray, eval_fn(params, device_batch))
        visualizer.visualize(output, device_batch, meta)


def run_light_stage(cfg):
    """Point clouds -> packed occupancy volumes (ref run.py:103-106 ->
    lib/utils/light_stage/ply_to_occupancy.py:41-66). Converts every
    pointcloud/*.ply under the dataset root into voxel/*.npz."""
    import glob
    import os
    import types

    from tools.dataset_tools import cmd_occupancy

    root = cfg.train_dataset.data_root
    plys = sorted(glob.glob(os.path.join(root, "pointcloud", "*.ply")))
    if not plys:
        print(f"no pointcloud/*.ply under {root}")
        return
    out_dir = os.path.join(root, "voxel")
    os.makedirs(out_dir, exist_ok=True)
    for ply in plys:
        stem = os.path.splitext(os.path.basename(ply))[0]
        cmd_occupancy(types.SimpleNamespace(
            ply=ply, res=256, out=os.path.join(out_dir, stem + ".npz")))


def run_evaluate_nv(cfg):
    """Score a competitor's saved renders against GT with identical masking
    (ref run.py:109-122; evaluator: lib/evaluators/neural_volume.py). Needs
    only the data loader — no network forward."""
    from neuralbody_tpu.config import build
    from neuralbody_tpu import datasets, evaluators  # noqa: F401
    from neuralbody_tpu.datasets.loader import make_data_loader

    loader = make_data_loader(cfg, "test")
    evaluator = build("evaluator", "neural_volume", cfg)
    for device_batch, meta in loader:
        evaluator.evaluate(None, device_batch, meta)
    return evaluator.summarize()


def main():
    cfg, args = _setup()
    runners = {
        "dataset": run_dataset,
        "network": run_network,
        "evaluate": run_evaluate,
        "visualize": run_visualize,
        "light_stage": run_light_stage,
        "evaluate_nv": run_evaluate_nv,
    }
    if args.type not in runners:
        raise SystemExit(
            f"unknown --type {args.type!r}; valid: {', '.join(runners)}")
    runners[args.type](cfg)


if __name__ == "__main__":
    main()
