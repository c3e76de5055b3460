"""Separate tunnel RTT from per-step compute: vary G; sync vs pipelined."""
import sys, time, jax, jax.numpy as jnp, numpy as np
import optax
from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.utils.synthetic import make_batch
from neuralbody_tpu.renderer.renderer import RenderSettings
from neuralbody_tpu.train.step import train_step_scan

batch_np, static = make_batch(n_rays=1024, n_verts=6890, voxel_size=0.005, seed=0)
batch = jax.tree.map(jnp.asarray, batch_np)
ms = ModelStatic(encoder=EncoderStatic(out_sh=static["out_sh"],
                                       site_caps=static["site_caps"]))
params0, bn0 = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
s = RenderSettings(model=ms, voxel_size=(0.005,) * 3, n_samples=64,
                   chunk_rays=1024, site_interp=True)
tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))

for G in [int(x) for x in sys.argv[1:]] or [8, 64]:
    batches = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (G,) + x.shape),
                           batch)
    keys = jax.random.split(jax.random.PRNGKey(1), G)
    p = jax.tree.map(jnp.array, params0)   # fresh copies (donation-safe)
    b = jax.tree.map(jnp.array, bn0)
    opt = tx.init(p)
    t0 = time.perf_counter()
    p, b, opt, st = train_step_scan(p, b, opt, batches, keys, s, tx)
    _ = float(st["loss"][-1])
    print(f"G={G} compile+first {time.perf_counter()-t0:.1f}s", flush=True)

    # synchronous: fetch a scalar per dispatch
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        p, b, opt, st = train_step_scan(p, b, opt, batches, keys, s, tx)
        _ = float(st["loss"][-1])
        ts.append(time.perf_counter() - t0)
    sync = min(ts)
    print(f"G={G} sync: {sync*1000:.1f} ms/dispatch -> {sync/G*1000:.2f} "
          f"ms/step, {1024*G/sync:,.0f} rays/s", flush=True)

    # pipelined: N dispatches, one final fetch
    N = 6
    t0 = time.perf_counter()
    for _ in range(N):
        p, b, opt, st = train_step_scan(p, b, opt, batches, keys, s, tx)
    _ = float(st["loss"][-1])
    pipe = (time.perf_counter() - t0) / N
    print(f"G={G} pipe: {pipe*1000:.1f} ms/dispatch -> {pipe/G*1000:.2f} "
          f"ms/step, {1024*G/pipe:,.0f} rays/s", flush=True)
