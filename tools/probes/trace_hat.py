import time, jax, jax.numpy as jnp
import optax
from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.utils.synthetic import make_batch
from neuralbody_tpu.renderer.renderer import RenderSettings
from neuralbody_tpu.train.step import train_step_scan

batch_np, static = make_batch(n_rays=1024, n_verts=6890, voxel_size=0.005,
                              seed=0, hat=True, n_samples=64)
batch = jax.tree.map(jnp.asarray, batch_np)
ms = ModelStatic(encoder=EncoderStatic(out_sh=static["out_sh"],
                                       site_caps=static["site_caps"]))
params, bn = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
s = RenderSettings(model=ms, voxel_size=(0.005,) * 3, n_samples=64,
                   chunk_rays=1024,
                   hat_rows_caps=static["hat"]["rows_caps"])
tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
G = 4
batches = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (G,) + x.shape),
                       batch)
keys = jax.random.split(jax.random.PRNGKey(1), G)
opt = tx.init(params)
params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s, tx)
print("warm", float(st["loss"][-1]), flush=True)
with jax.profiler.trace("/tmp/jax_trace_hat"):
    params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s,
                                          tx)
    _ = float(st["loss"][-1])
print("trace done", flush=True)
