"""Benchmark: training-step throughput (rays/s/chip, fwd+bwd) at the
reference recipe's working point — 1024 rays x 64 samples, 6890-vertex body,
5mm voxels, 512x512-scale scene (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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


def main():
    import optax

    from neuralbody_tpu.models import latent_xyzc
    from neuralbody_tpu.models.latent_xyzc import ModelStatic
    from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
    from neuralbody_tpu.renderer.renderer import RenderSettings
    from neuralbody_tpu.train.step import train_step_scan
    from neuralbody_tpu.utils.synthetic import make_batch

    n_rays, n_samples = 1024, 64
    # hat=True: host-planned grouped hat-matmul interpolation (the
    # production training path; see ops/hat_interp.py)
    batch_np, static = make_batch(
        n_rays=n_rays, n_verts=6890, voxel_size=0.005, seed=0,
        hat=True, n_samples=n_samples)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model_static = ModelStatic(
        encoder=EncoderStatic(out_sh=static["out_sh"],
                              site_caps=static["site_caps"]))
    settings = RenderSettings(
        model=model_static, voxel_size=(0.005,) * 3,
        n_samples=n_samples, chunk_rays=n_rays)

    params, bn_stats = latent_xyzc.init(
        jax.random.PRNGKey(0), num_train_frame=60)
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
    opt_state = tx.init(params)

    # production loop shape: G steps per dispatch via lax.scan
    G = 8
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (G,) + x.shape), batch)
    keys = jax.random.split(jax.random.PRNGKey(1), G)

    # warmup/compile (fetch a scalar: block_until_ready is unreliable on
    # the tunneled TPU — see CLAUDE.md)
    params, bn_stats, opt_state, stats = train_step_scan(
        params, bn_stats, opt_state, batches, keys, settings, tx)
    _ = float(stats["loss"][-1])

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, bn_stats, opt_state, stats = train_step_scan(
            params, bn_stats, opt_state, batches, keys, settings, tx)
    # the final loss depends on every previous step's params: one scalar
    # fetch forces the whole chain without per-iter host round-trips
    _ = float(stats["loss"][-1])
    dt = time.perf_counter() - t0

    rays_per_s = n_rays * n_iters * G / dt
    print(json.dumps({
        "metric": "train_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s (fwd+bwd, 1024x64 @ 5mm voxels)",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
