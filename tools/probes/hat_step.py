import sys; sys.path.insert(0, "/root/repo")
import sys, time, jax, jax.numpy as jnp, numpy as np
import optax
from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.utils.synthetic import make_batch
from neuralbody_tpu.renderer.renderer import RenderSettings
from neuralbody_tpu.train.step import train_step_scan

t0 = time.perf_counter()
batch_np, static = make_batch(n_rays=1024, n_verts=6890, voxel_size=0.005,
                              seed=0, hat=True, n_samples=64)
print(f"host prep (full batch): {time.perf_counter()-t0:.2f}s "
      f"rows_caps={static['hat']['rows_caps']}", flush=True)
batch = jax.tree.map(jnp.asarray, batch_np)
ms = ModelStatic(encoder=EncoderStatic(out_sh=static["out_sh"],
                                       site_caps=static["site_caps"]))
params, bn = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
s = RenderSettings(model=ms, voxel_size=(0.005,) * 3, n_samples=64,
                   chunk_rays=1024, site_interp=True,
                   hat_rows_caps=static["hat"]["rows_caps"])
tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
G = 8
batches = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (G,) + x.shape),
                       batch)
keys = jax.random.split(jax.random.PRNGKey(1), G)
opt = tx.init(params)
t0 = time.perf_counter()
params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s, tx)
print(f"compile+first {time.perf_counter()-t0:.1f}s loss "
      f"{float(st['loss'][-1]):.5f}", flush=True)
ts = []
for _ in range(4):
    t0 = time.perf_counter()
    params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s,
                                          tx)
    _ = float(st["loss"][-1])
    ts.append(time.perf_counter() - t0)
best = min(ts)
print(f"hat step: {best/G*1000:.2f} ms/step, {1024*G/best:,.0f} rays/s",
      flush=True)
