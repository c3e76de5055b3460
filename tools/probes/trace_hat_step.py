"""Profile the production train step (hat path, bf16 encoder) and print
per-op aggregates: where does the ~22 ms/step go now?

Usage: python tools/probes/trace_hat_step.py [f32]
"""
import collections
import glob
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

LOG = "/tmp/jax_trace_hatstep"


def main():
    from neuralbody_tpu.models import latent_xyzc
    from neuralbody_tpu.models.latent_xyzc import ModelStatic
    from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
    from neuralbody_tpu.renderer.renderer import RenderSettings
    from neuralbody_tpu.train.step import train_step_scan
    from neuralbody_tpu.utils.synthetic import make_batch

    dtype = "float32" if "f32" in sys.argv[1:] else "bfloat16"
    use_pallas = "pallas" in sys.argv[1:]
    batch_np, static = make_batch(n_rays=1024, n_verts=6890,
                                  voxel_size=0.005, seed=0, hat=True,
                                  n_samples=64)
    batch = jax.tree.map(jnp.asarray, batch_np)
    ms = ModelStatic(encoder=EncoderStatic(
        out_sh=static["out_sh"], site_caps=tuple(static["site_caps"]),
        compute_dtype=dtype, use_pallas=use_pallas))
    params, bn = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
    s = RenderSettings(model=ms, voxel_size=(0.005,) * 3, n_samples=64,
                       chunk_rays=1024,
                       hat_rows_caps=static["hat"]["rows_caps"])
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
    opt = tx.init(params)
    G = 8
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (G,) + x.shape), batch)
    keys = jax.random.split(jax.random.PRNGKey(1), G)

    params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys,
                                          s, tx)
    print("warm loss", float(st["loss"][-1]), flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        params, bn, opt, st = train_step_scan(params, bn, opt, batches,
                                              keys, s, tx)
    _ = float(st["loss"][-1])
    dt = (time.perf_counter() - t0) / (4 * G)
    print(f"step: {dt * 1000:.2f} ms ({1024 / dt:.0f} rays/s)", flush=True)

    with jax.profiler.trace(LOG):
        params, bn, opt, st = train_step_scan(params, bn, opt, batches,
                                              keys, s, tx)
        _ = float(st["loss"][-1])
    print("trace captured", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = sorted(glob.glob(LOG + "/**/*.xplane.pb", recursive=True))
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(xs[-1], "rb").read())
    plane = [p for p in sp.planes if "TPU" in p.name][0]
    md = {k: v.name for k, v in plane.event_metadata.items()}

    def cat(name):
        if name.startswith("%while") or name.startswith("jit_"):
            return None
        m = re.match(r"%(\w+?)[\.\d]* = (\S+?)\[([\d,]*)\]", name)
        if not m:
            return name[:48]
        op, dt_, shape = m.groups()
        return f"{op} {dt_}[{shape}]"

    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        agg = collections.Counter()
        cnt = collections.Counter()
        for e in line.events:
            c = cat(md.get(e.metadata_id, "?"))
            if c is None:
                continue
            agg[c] += e.duration_ps
            cnt[c] += 1
        total = sum(agg.values())
        print(f"device total {total / 1e12 / G * 1000:.2f} ms/step")
        for c, ps in agg.most_common(28):
            print(f"  {ps / 1e12 / G * 1000:7.3f} ms/step x{cnt[c]:4d}  {c}")


if __name__ == "__main__":
    main()
