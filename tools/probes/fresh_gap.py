"""Where does fresh lose 2x vs broadcast? (SWEEP_r05 follow-up)

Three measurements on the chip:
  A. transfer cost of a stacked fresh dispatch tree: ms per G=8 tree,
     FRESH buffers each rep (the client dedup cache makes repeated
     buffers free — CLAUDE.md), vs the same bytes as ONE packed buffer.
     Distinguishes per-leaf RPC latency from bandwidth.
  B. device-resident fresh scan: pre-ship N distinct dispatch trees,
     then dispatch all scans back-to-back and sync once. If this hits
     broadcast's ~26 ms/batch, the gap is transfer/feed; if ~52, the
     device itself is slower on distinct data.
  C. broadcast control (same program, one tree).

Usage: python tools/probes/fresh_gap.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from neuralbody_tpu.train.step import train_step_scan
    from neuralbody_tpu.utils.synthetic import make_batch

    G = bench.G
    batch_np, static = make_batch(
        n_rays=1024, n_verts=6890, voxel_size=0.005, seed=0,
        hat=True, n_samples=64)
    settings, params, bn_stats, tx = bench._setup(
        static["out_sh"], static["site_caps"], num_train_frame=60,
        hat_rows_caps=static["hat"]["rows_caps"])
    opt_state = tx.init(params)

    # the per-dispatch payload tree (geometry excluded = banked mode)
    payload_keys = [k for k in batch_np
                    if k.startswith(("hat_", "z_")) or k in
                    ("ray_o", "ray_d", "near", "far", "rgb", "ray_mask")]
    tree = {k: np.broadcast_to(batch_np[k][None],
                               (G,) + batch_np[k].shape).copy()
            for k in payload_keys}
    n_leaves = len(tree)
    n_bytes = sum(v.nbytes for v in tree.values())
    print(f"payload: {n_leaves} leaves, {n_bytes/1e6:.2f} MB/dispatch",
          flush=True)

    # A1: ship the tree, fresh buffers each rep
    reps = 10
    t0 = time.perf_counter()
    for r in range(reps):
        fresh = {k: v + np.uint8(1) if v.dtype == np.uint8 else v + 1
                 for k, v in tree.items()}  # rewrite -> defeats dedup
        dev = {k: jnp.asarray(v) for k, v in fresh.items()}
        _ = float(jnp.sum(dev["near"]))    # sync marker
    dt_tree = (time.perf_counter() - t0) / reps
    print(f"A1 tree ship+sync: {1000*dt_tree:.1f} ms "
          f"({n_bytes/dt_tree/1e6:.0f} MB/s)", flush=True)

    # A2: same bytes as ONE packed buffer
    flat = np.concatenate([v.view(np.uint8).ravel()
                           for v in tree.values()])
    t0 = time.perf_counter()
    for r in range(reps):
        flat2 = flat + np.uint8(r + 1)
        dev = jnp.asarray(flat2)
        _ = int(dev[-1])
    dt_flat = (time.perf_counter() - t0) / reps
    print(f"A2 packed ship+sync: {1000*dt_flat:.1f} ms "
          f"({n_bytes/dt_flat/1e6:.0f} MB/s)", flush=True)

    # C: broadcast control
    batch = jax.tree.map(jnp.asarray, batch_np)
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (G,) + x.shape), batch)
    keys = jax.random.split(jax.random.PRNGKey(1), G)
    params, bn_stats, opt_state, stats = train_step_scan(
        params, bn_stats, opt_state, batches, keys, settings, tx)
    _ = float(stats["loss"][-1])
    n_iter = 8
    t0 = time.perf_counter()
    for _ in range(n_iter):
        params, bn_stats, opt_state, stats = train_step_scan(
            params, bn_stats, opt_state, batches, keys, settings, tx)
    _ = float(stats["loss"][-1])
    dt = (time.perf_counter() - t0) / (n_iter * G)
    print(f"C broadcast: {1000*dt:.1f} ms/batch", flush=True)

    # B: device-resident DISTINCT trees, dispatch back-to-back
    n_disp = 8
    trees = []
    for d in range(n_disp):
        t = dict(batches)
        for k in payload_keys:
            v = np.asarray(batch_np[k])
            if v.dtype in (np.uint16, np.int32):
                vv = v  # index arrays must stay valid; reuse
            else:
                vv = v + np.float32(1e-4 * (d + 1))
            t[k] = jnp.asarray(np.broadcast_to(
                vv[None], (G,) + vv.shape).copy())
        trees.append(t)
    _ = float(jnp.sum(trees[-1]["near"]))   # transfers done
    t0 = time.perf_counter()
    for d in range(n_disp):
        params, bn_stats, opt_state, stats = train_step_scan(
            params, bn_stats, opt_state, trees[d], keys, settings, tx)
    _ = float(stats["loss"][-1])
    dt = (time.perf_counter() - t0) / (n_disp * G)
    print(f"B device-resident distinct: {1000*dt:.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
