"""Sweep hat-planner tile shapes / group sizes on the device train step.

Usage: python tools/probes/hat_tile_sweep.py [dtype] [tile:P ...]
  e.g.  python tools/probes/hat_tile_sweep.py bfloat16 4,8:128 4,8,8:128 4,8,8:256

Measures the broadcast (device-ceiling) scan step per config — same shape
as bench.py's measure_broadcast. Self-limiting; no timeout (CLAUDE.md).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import optax
from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.utils.synthetic import make_batch
from neuralbody_tpu.renderer.renderer import RenderSettings
from neuralbody_tpu.train.step import train_step_scan

args = sys.argv[1:]
dtype = args.pop(0) if args and not args[0][0].isdigit() else "bfloat16"
configs = []
for a in (args or ["4,8:128", "4,8,8:128"]):
    t, p = a.split(":")
    configs.append((tuple(int(x) for x in t.split(",")), int(p)))

tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
G = 8
for tile, P in configs:
    t0 = time.perf_counter()
    batch_np, static = make_batch(
        n_rays=1024, n_verts=6890, voxel_size=0.005, seed=0, hat=True,
        n_samples=64, hat_static={"tile": tile, "group_size": P})
    hs = static["hat"]
    print(f"tile={tile} P={P}: host prep {time.perf_counter()-t0:.1f}s "
          f"ngrp={hs['n_groups']} rows_caps={hs['rows_caps']} "
          f"seg_caps={hs['seg_caps']} "
          f"dot_slots={hs['n_groups']*P*sum(hs['rows_caps'])/1e6:.0f}M",
          flush=True)
    batch = jax.tree.map(jnp.asarray, batch_np)
    ms = ModelStatic(encoder=EncoderStatic(out_sh=static["out_sh"],
                                           site_caps=static["site_caps"],
                                           compute_dtype=dtype))
    params, bn = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
    s = RenderSettings(model=ms, voxel_size=(0.005,) * 3, n_samples=64,
                       chunk_rays=1024, hat_rows_caps=hs["rows_caps"])
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (G,) + x.shape), batch)
    keys = jax.random.split(jax.random.PRNGKey(1), G)
    opt = tx.init(params)
    t0 = time.perf_counter()
    params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s,
                                          tx)
    print(f"  compile {time.perf_counter()-t0:.0f}s "
          f"loss {float(st['loss'][-1]):.5f}", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        params, bn, opt, st = train_step_scan(params, bn, opt, batches,
                                              keys, s, tx)
        _ = float(st["loss"][-1])
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"  tile={tile} P={P} {dtype}: {best/G*1000:.2f} ms/step, "
          f"{1024*G/best:,.0f} rays/s", flush=True)
