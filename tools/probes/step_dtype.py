"""Time the broadcast train step at f32 vs bf16 encoder dtype + trace.

Usage: python tools/probes/step_dtype.py [trace]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.renderer.renderer import RenderSettings
from neuralbody_tpu.train.step import train_step_scan
from neuralbody_tpu.utils.synthetic import make_batch


def main():
    batch_np, static = make_batch(n_rays=1024, n_verts=6890,
                                  voxel_size=0.005, seed=0, hat=True,
                                  n_samples=64)
    batch = jax.tree.map(jnp.asarray, batch_np)
    G = 8
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (G,) + x.shape), batch)
    keys = jax.random.split(jax.random.PRNGKey(1), G)
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))

    last = None
    for dt in ("float32", "bfloat16"):
        ms = ModelStatic(encoder=EncoderStatic(
            out_sh=static["out_sh"], site_caps=static["site_caps"],
            compute_dtype=dt))
        s = RenderSettings(model=ms, voxel_size=(0.005,) * 3, n_samples=64,
                           chunk_rays=1024,
                           hat_rows_caps=static["hat"]["rows_caps"])
        params, bn = latent_xyzc.init(jax.random.PRNGKey(0),
                                      num_train_frame=60)
        opt = tx.init(params)
        params, bn, opt, st = train_step_scan(params, bn, opt, batches,
                                              keys, s, tx)
        print(f"{dt} warm loss {float(st['loss'][-1]):.5f}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                params, bn, opt, st = train_step_scan(
                    params, bn, opt, batches, keys, s, tx)
            _ = float(st["loss"][-1])
            ts.append((time.perf_counter() - t0) / (10 * G))
        print(f"{dt}: {min(ts)*1000:.2f} ms/step "
              f"({1024/min(ts):.0f} rays/s)", flush=True)
        last = (params, bn, opt, s)

    if len(sys.argv) > 1 and sys.argv[1] == "trace":
        params, bn, opt, s = last
        with jax.profiler.trace("/tmp/jax_trace_x"):
            params, bn, opt, st = train_step_scan(params, bn, opt, batches,
                                                  keys, s, tx)
            _ = float(st["loss"][-1])
        print("trace done -> /tmp/jax_trace_x", flush=True)


if __name__ == "__main__":
    main()
