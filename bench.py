"""Benchmark: training-step throughput (rays/s/chip, fwd+bwd) at the
reference recipe's working point — 1024 rays x 64 samples, 6890-vertex body,
5mm voxels, 512x512 views (BASELINE.json metric).

Two measurements:
  * fresh (the headline `value`): the PRODUCTION pipeline — loader worker
    processes JPEG-decode synthetic 512^2 views, sample train rays, and run
    the hat-interpolation host planner per batch; the device scans G=8
    distinct batches per dispatch. Includes all host work and host->device
    transfer.
  * broadcast: one pre-planned batch broadcast G times — pure device
    compute ceiling (what BENCH_r01/r02 measured).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"broadcast_rays_per_s", ...}.

vs_baseline: the reference publishes no speed numbers (BASELINE.md). We use
the reference's own training recipe as the yardstick: 400 epochs x 500 iters
x 1024 rays (~205M ray-steps) at the commonly reported ~1 day on a consumer
GPU => ~2400 rays/s. Documented estimate, not a published number.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_S = 2400.0
N_RAYS, N_SAMPLES, G = 1024, 64, 8


def _setup(out_sh, site_caps, num_train_frame, dtype="bfloat16",
           hat_rows_caps=(), n_rays=N_RAYS, use_pallas=False,
           nv=6890, voxel=0.005):
    import optax

    from neuralbody_tpu.models import latent_xyzc
    from neuralbody_tpu.models.latent_xyzc import ModelStatic
    from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
    from neuralbody_tpu.renderer.renderer import RenderSettings

    # production encoder dtype: bf16 activations, f32 accumulation/BN
    # (cfg.tpu.compute_dtype; the encoder's gathers are bytes-bound).
    # use_pallas=False: the fused kernel loses integrated (CLAUDE.md)
    model_static = ModelStatic(
        encoder=EncoderStatic(out_sh=out_sh, site_caps=tuple(site_caps),
                              compute_dtype=dtype, use_pallas=use_pallas))
    settings = RenderSettings(
        model=model_static, voxel_size=(voxel,) * 3,
        n_samples=N_SAMPLES, chunk_rays=n_rays,
        hat_rows_caps=tuple(hat_rows_caps))
    params, bn_stats = latent_xyzc.init(
        jax.random.PRNGKey(0), num_train_frame=num_train_frame, nv=nv)
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
    return settings, params, bn_stats, tx


def measure_broadcast(n_rays=N_RAYS, use_pallas=False, n_iters=20,
                      pre_expand=True, n_verts=6890, voxel=0.005):
    """Device-compute ceiling: one batch scanned G times per dispatch.

    n_verts/voxel are overridable only for CPU smoke tests; the headline
    number always uses the reference working point (6890 @ 5mm)."""
    from neuralbody_tpu.train.step import train_step_scan
    from neuralbody_tpu.utils.synthetic import make_batch

    batch_np, static = make_batch(
        n_rays=n_rays, n_verts=n_verts, voxel_size=voxel, seed=0,
        hat=True, n_samples=N_SAMPLES)
    batch = jax.tree.map(jnp.asarray, batch_np)
    settings, params, bn_stats, tx = _setup(
        static["out_sh"], static["site_caps"], num_train_frame=60,
        hat_rows_caps=static["hat"]["rows_caps"], n_rays=n_rays,
        use_pallas=use_pallas, nv=n_verts, voxel=voxel)
    opt_state = tx.init(params)

    if pre_expand:
        # HBM-resident batch: expand the compact row segments and
        # reconstruct the sorted points/dirs ONCE — both exist only to
        # shrink the fresh host->TPU payload and are pure overhead when
        # the batch already lives on device (VERDICT r4 #3;
        # renderer.render_rays_hat fast paths)
        from neuralbody_tpu.renderer.renderer import precompute_hat_device
        batch = precompute_hat_device(
            batch, static["hat"]["rows_caps"], static["site_caps"],
            N_SAMPLES)

    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (G,) + x.shape), batch)
    keys = jax.random.split(jax.random.PRNGKey(1), G)

    # warmup/compile (fetch a scalar: block_until_ready is unreliable on
    # the tunneled TPU — see CLAUDE.md)
    params, bn_stats, opt_state, stats = train_step_scan(
        params, bn_stats, opt_state, batches, keys, settings, tx)
    _ = float(stats["loss"][-1])

    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, bn_stats, opt_state, stats = train_step_scan(
            params, bn_stats, opt_state, batches, keys, settings, tx)
    # the final loss depends on every previous step's params: one scalar
    # fetch forces the whole chain without per-iter host round-trips
    _ = float(stats["loss"][-1])
    dt = time.perf_counter() - t0
    return n_rays * n_iters * G / dt


def measure_fresh(num_workers=2, n_disp=12, n_rays=N_RAYS,
                  plan_device=False, packed=True):
    """Production pipeline: worker-pool loader feeding G distinct fresh
    batches per dispatch. plan_device=True builds the hat plan ON DEVICE
    (ops/device_plan.py; measured net-slower on the tunneled v5e, so the
    production default ships host-planned compact payloads — CLAUDE.md
    fresh-path cost model). packed=True ships each group as one buffer."""
    from neuralbody_tpu.datasets.loader import DataLoader, WorkerPool
    from neuralbody_tpu.parallel.geom import GeomBank
    from neuralbody_tpu.parallel.pack import make_layout, pack
    from neuralbody_tpu.train.step import (train_step_scan_banked,
                                           train_step_scan_packed)
    from neuralbody_tpu.utils.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=4, n_cams=4, hw=(512, 512),
                          n_verts=6890, voxel_size=0.005, n_rand=n_rays)
    settings, params, bn_stats, tx = _setup(
        ds.out_sh, ds.site_caps, num_train_frame=ds.n_frames,
        n_rays=n_rays)
    opt_state = tx.init(params)

    hat_cfg = dict(out_sh=ds.out_sh, site_caps=ds.site_caps,
                   voxel_size=(0.005,) * 3, n_samples=N_SAMPLES,
                   group_size=128, tile=(4, 8), perturb=True)
    hat_state = {}
    pool = WorkerPool(ds, num_workers)
    # frame geometry lives in an HBM-resident bank, selected by index
    # inside the jitted step — never re-shipped per batch (parallel/geom.py)
    bank = GeomBank(pool.geom_cache, capacity=ds.n_frames)

    layout_box = {}

    def _prep(item):
        """Stack + host->device transfer of one dispatch group (prefetcher
        thread — overlaps with the in-flight scan; parallel/transfer.py).
        packed=True ships the whole group as ONE uint8 buffer: device
        buffer creation costs ~12 ms/array on the tunnel regardless of
        size (tools/probes/fresh_gap.py), so leaf count — not bytes — is
        the dominant fresh-path cost."""
        group, group_keys, subs = item
        if packed:
            stacked = {k: np.stack([g[k] for g in group])
                       for k in group[0]}
            bank_arrays, rows = bank.rows(group_keys)
            stacked["geom_rows"] = np.asarray(rows)
            if "layout" not in layout_box:
                layout_box["layout"] = make_layout(stacked)
            lo = layout_box["layout"]
            return jnp.asarray(pack(stacked, lo)), jnp.stack(subs), \
                bank_arrays, lo
        stacked = jax.tree.map(
            lambda *xs: jnp.asarray(np.stack(xs)), *group,
            is_leaf=lambda x: not isinstance(x, dict))
        bank_arrays, stacked["geom_rows"] = bank.rows(group_keys)
        return stacked, jnp.stack(subs), bank_arrays, None

    def run_epoch(epoch, n_batches, params, bn_stats, opt_state):
        nonlocal settings
        from neuralbody_tpu.parallel.transfer import DevicePrefetcher
        idx = [i % len(ds) for i in range(n_batches)]
        loader = DataLoader(ds, idx, chunk_rays=n_rays, batch_size=1,
                            hat_cfg=hat_cfg, hat_state=hat_state,
                            epoch=epoch, pool=pool, attach_geom=False,
                            plan_device=plan_device)
        key = jax.random.PRNGKey(epoch)
        pending, pending_keys = [], []
        stats = None

        def dispatch(ready):
            nonlocal params, bn_stats, opt_state, stats
            stacked, keys, bank_arrays, lo = ready
            if lo is not None:
                (params, bn_stats, opt_state,
                 stats) = train_step_scan_packed(
                    params, bn_stats, opt_state, stacked, keys,
                    bank_arrays, lo, settings, tx)
            else:
                (params, bn_stats, opt_state,
                 stats) = train_step_scan_banked(
                    params, bn_stats, opt_state, stacked, keys,
                    bank_arrays, settings, tx)

        prefetch = DevicePrefetcher(_prep, depth=2)
        try:
            for device, meta in loader:
                pending.append(device)
                pending_keys.append(meta["geom_keys"])
                if len(pending) < G:
                    continue
                if plan_device and settings.hat_plan is None:
                    from neuralbody_tpu.ops.device_plan import \
                        spec_from_state
                    settings = settings._replace(
                        hat_plan=spec_from_state(
                            hat_state, settings.model.encoder))
                elif not settings.hat_rows_caps:
                    # static segment-expansion widths, derived by batch 0
                    settings = settings._replace(
                        hat_rows_caps=tuple(hat_state["rows_caps"]))
                key, *subs = jax.random.split(key, G + 1)
                prefetch.submit((pending, pending_keys, subs))
                pending, pending_keys = [], []
                for ready in prefetch.ready():
                    dispatch(ready)
            for ready in prefetch.drain():
                dispatch(ready)
        finally:
            prefetch.close()
        return params, bn_stats, opt_state, stats

    try:
        # warm epoch: compile the scan step, ship geoms, warm worker caches
        params, bn_stats, opt_state, stats = run_epoch(
            0, 2 * G, params, bn_stats, opt_state)
        _ = float(stats["loss"][-1])

        t0 = time.perf_counter()
        params, bn_stats, opt_state, stats = run_epoch(
            1, n_disp * G, params, bn_stats, opt_state)
        _ = float(stats["loss"][-1])
        dt = time.perf_counter() - t0
    finally:
        pool.shutdown()
    return n_rays * n_disp * G / dt


def main():
    fresh = measure_fresh()
    broadcast = measure_broadcast()
    # batch-size scaling headroom (same recipe, 4x rays/step; SWEEP_r05)
    broadcast_4k = measure_broadcast(n_rays=4096, n_iters=6)
    print(json.dumps({
        "metric": "train_rays_per_s_per_chip",
        "value": round(fresh, 1),
        "unit": "rays/s (fwd+bwd, 1024x64 @ 5mm, fresh host-planned batches)",
        "vs_baseline": round(fresh / BASELINE_RAYS_PER_S, 3),
        "broadcast_rays_per_s": round(broadcast, 1),
        "fresh_over_broadcast": round(fresh / broadcast, 3),
        "broadcast_4096_rays_per_s": round(broadcast_4k, 1),
    }))


if __name__ == "__main__":
    main()
