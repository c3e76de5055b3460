"""Instrument bench.measure_fresh's parent loop: where do the
non-overlapped ms/batch go? (wait=loader queue, stack, bank, ship+call,
sync at epoch end)

Usage: python tools/probes/fresh_phases.py [workers] [tile3d]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench

    from neuralbody_tpu.datasets.loader import DataLoader, WorkerPool
    from neuralbody_tpu.parallel.geom import GeomBank
    from neuralbody_tpu.train.step import train_step_scan_banked
    from neuralbody_tpu.utils.synthetic import SyntheticDataset

    num_workers = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    tile = (4, 8, 16) if "tile3d" in sys.argv[2:] else (4, 8)
    plan_device = "devplan" in sys.argv
    N_RAYS, N_SAMPLES, G = bench.N_RAYS, bench.N_SAMPLES, bench.G

    ds = SyntheticDataset(n_frames=4, n_cams=4, hw=(512, 512),
                          n_verts=6890, voxel_size=0.005, n_rand=N_RAYS)
    settings, params, bn_stats, tx = bench._setup(
        ds.out_sh, ds.site_caps, num_train_frame=ds.n_frames)
    opt_state = tx.init(params)
    hat_cfg = dict(out_sh=ds.out_sh, site_caps=ds.site_caps,
                   voxel_size=(0.005,) * 3, n_samples=N_SAMPLES,
                   group_size=128, tile=tile, perturb=True)
    hat_state = {}
    pool = WorkerPool(ds, num_workers)
    bank = GeomBank(pool.geom_cache, capacity=ds.n_frames)

    def run_epoch(epoch, n_batches, params, bn_stats, opt_state, t=None):
        nonlocal settings
        idx = [i % len(ds) for i in range(n_batches)]
        loader = DataLoader(ds, idx, chunk_rays=N_RAYS, batch_size=1,
                            hat_cfg=hat_cfg, hat_state=hat_state,
                            epoch=epoch, pool=pool, attach_geom=False,
                            plan_device=plan_device)
        key = jax.random.PRNGKey(epoch)
        pending, pending_keys = [], []
        stats = None
        it = iter(loader)
        while True:
            t0 = time.perf_counter()
            try:
                device, meta = next(it)
            except StopIteration:
                break
            t1 = time.perf_counter()
            pending.append(device)
            pending_keys.append(meta["geom_keys"])
            if t is not None:
                t["wait"] += t1 - t0
            if len(pending) < G:
                continue
            if plan_device and settings.hat_plan is None:
                from neuralbody_tpu.ops.device_plan import spec_from_state
                settings = settings._replace(hat_plan=spec_from_state(
                    hat_state, settings.model.encoder))
            elif not settings.hat_rows_caps:
                # static segment-expansion widths, derived by batch 0
                settings = settings._replace(
                    hat_rows_caps=tuple(hat_state["rows_caps"]))
            t1 = time.perf_counter()
            stacked = jax.tree.map(
                lambda *xs: np.stack(xs), *pending,
                is_leaf=lambda x: not isinstance(x, dict))
            t2 = time.perf_counter()
            bank_arrays, stacked["geom_rows"] = bank.rows(pending_keys)
            pending.clear()
            pending_keys.clear()
            key, *subs = jax.random.split(key, G + 1)
            t3 = time.perf_counter()
            stacked = jax.tree.map(jnp.asarray, stacked)
            t4 = time.perf_counter()
            params, bn_stats, opt_state, stats = train_step_scan_banked(
                params, bn_stats, opt_state, stacked, jnp.stack(subs),
                bank_arrays, settings, tx)
            t5 = time.perf_counter()
            if t is not None:
                t["stack"] += t2 - t1
                t["bank"] += t3 - t2
                t["ship"] += t4 - t3
                t["call"] += t5 - t4
        t0 = time.perf_counter()
        _ = float(stats["loss"][-1])
        if t is not None:
            t["sync"] += time.perf_counter() - t0
        return params, bn_stats, opt_state

    try:
        params, bn_stats, opt_state = run_epoch(
            0, 2 * G, params, bn_stats, opt_state)
        n_disp = 12
        t = dict.fromkeys(("wait", "stack", "bank", "ship", "call",
                           "sync"), 0.0)
        t0 = time.perf_counter()
        params, bn_stats, opt_state = run_epoch(
            1, n_disp * G, params, bn_stats, opt_state, t)
        dt = time.perf_counter() - t0
    finally:
        pool.shutdown()
    n = n_disp * G
    print(f"workers={num_workers} tile={tile} devplan={plan_device}: "
          f"{N_RAYS * n / dt:.0f} rays/s ({dt / n * 1000:.2f} ms/batch)")
    for k, v in t.items():
        print(f"  {k:6s} {v / n * 1000:6.2f} ms/batch")


if __name__ == "__main__":
    main()
