"""GSPMD partition-overhead bound on the virtual CPU mesh (VERDICT r4 #9).

Equal-total-work comparison: the sharded scan step on the SAME global
batch, once on a 1-device mesh and once sharded over 8 virtual CPU
devices, all on the same physical cores.

Two configurations, because the encoder is REPLICATED per device by
design (each chip encodes its own feature-volume copy — parallel and free
on real chips, but 8x duplicated FLOPs on an oversubscribed CPU mesh, so
it contaminates a naive t8/t1):

  * encoder-heavy (the flagship working point, scaled down): t8/t1 mixes
    the replicated-encoder duplication with partition overhead — reported
    for transparency, NOT an overhead bound.
  * decode-dominated (tiny encoder, 4x the rays): the ray-sharded
    decode/quadrature path dominates, so t8/t1 - 1 approximates the
    GSPMD partition cost (reshards, per-shard padding, collective sync of
    the gradient all-reduce) on the sharded path.

This bounds *software* overhead only; real multi-chip efficiency
additionally depends on ICI bandwidth, which one host cannot measure
(BASELINE.md >=85% target note).

Usage: python tools/probes/cpu_mesh_scaling.py   (parent: spawns children)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

G, ITERS = 2, 8
CONFIGS = {
    # name: (n_rays, n_samples, n_verts, voxel, hat)
    "encoder_heavy": (1024, 16, 512, 0.02, True),
    "decode_dominated": (4096, 16, 128, 0.04, True),
    # site-interp path (device z sampling, per-ray interpolation): the
    # control — its decode shards cleanly on the ray axis, so comparing
    # against decode_dominated isolates how much of the hat path's t8 is
    # the global hat_sort gather forcing replication
    "decode_dominated_site": (4096, 16, 128, 0.04, False),
}


def child(ndev, cfg):
    n_rays, n_samples, n_verts, voxel, hat = CONFIGS[cfg]
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from neuralbody_tpu.models import latent_xyzc
    from neuralbody_tpu.models.latent_xyzc import ModelStatic
    from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
    from neuralbody_tpu.parallel.mesh import make_mesh, shard_batch
    from neuralbody_tpu.parallel.train import make_sharded_scan_step
    from neuralbody_tpu.renderer.renderer import RenderSettings
    from neuralbody_tpu.utils.synthetic import make_batch

    assert jax.device_count() >= ndev, (jax.device_count(), ndev)
    hat_static = None
    if hat:
        # round the group count to a multiple of 8 so the hat tables
        # shard on the group axis (parallel/mesh.py group_sharded)
        _, st0 = make_batch(
            n_rays=n_rays, n_verts=n_verts, voxel_size=voxel, seed=0,
            hat=True, n_samples=n_samples, hat_perturb=False)
        hat_static = dict(st0["hat"])
        hat_static["n_groups"] = -(-hat_static["n_groups"] // 8) * 8
    batch_np, static = make_batch(
        n_rays=n_rays, n_verts=n_verts, voxel_size=voxel, seed=0,
        hat=hat, n_samples=n_samples, hat_perturb=False,
        hat_static=hat_static)
    ms = ModelStatic(encoder=EncoderStatic(
        out_sh=static["out_sh"], site_caps=tuple(static["site_caps"])))
    settings = RenderSettings(
        model=ms, voxel_size=(voxel,) * 3, n_samples=n_samples,
        chunk_rays=n_rays,
        hat_rows_caps=(tuple(static["hat"]["rows_caps"]) if hat else ()))
    params, bn_stats = latent_xyzc.init(
        jax.random.PRNGKey(0), num_train_frame=4, nv=n_verts)
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
    opt_state = tx.init(params)

    mesh = make_mesh(ndev)
    stacked = jax.tree.map(
        lambda x: np.broadcast_to(x[None], (G,) + x.shape), batch_np,
        is_leaf=lambda x: not isinstance(x, dict))
    step = make_sharded_scan_step(mesh, settings, tx, batch_np)
    batches = shard_batch(mesh, stacked, stacked=True)
    keys = jax.random.split(jax.random.PRNGKey(1), G)

    params, bn_stats, opt_state, stats = step(
        params, bn_stats, opt_state, batches, keys)
    _ = float(stats["loss"][-1])   # compile + warm

    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, bn_stats, opt_state, stats = step(
            params, bn_stats, opt_state, batches, keys)
    _ = float(stats["loss"][-1])
    dt = time.perf_counter() - t0
    print(json.dumps({"ndev": ndev,
                      "ms_per_step": round(1000 * dt / (ITERS * G), 2)}))


def main():
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--ndev") + 1]),
              sys.argv[sys.argv.index("--config") + 1])
        return
    out = {"metric": "gspmd_partition_overhead_cpu_mesh",
           "equal_total_work": f"G={G}", "configs": {}}
    for cfg, (n_rays, n_samples, n_verts, voxel, hat) in CONFIGS.items():
        results = {}
        for ndev in (1, 8):
            env = dict(
                os.environ,
                XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"),
                JAX_PLATFORMS="cpu")
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--ndev", str(ndev), "--config", cfg],
                env=env, capture_output=True, text=True, cwd=REPO)
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(r.stdout, r.stderr)
                raise SystemExit(f"child {cfg} ndev={ndev} failed")
            results[ndev] = json.loads(line[-1])
            print(cfg, results[ndev], flush=True)
        t1, t8 = results[1]["ms_per_step"], results[8]["ms_per_step"]
        out["configs"][cfg] = {
            "shape": f"{n_rays}x{n_samples}, {n_verts}v @ {voxel}",
            "ms_per_step_1dev": t1, "ms_per_step_8dev": t8,
            "t8_over_t1_minus_1": round(t8 / t1 - 1, 4)}
    out["note"] = ("encoder_heavy mixes the BY-DESIGN per-device encoder "
                   "replication into t8 (8x encoder FLOPs on shared "
                   "cores); decode_dominated isolates the ray-sharded "
                   "path's GSPMD partition overhead")
    print(json.dumps(out))
    with open(os.path.join(REPO, "SCALING_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
