"""Capture a profiler trace of the train step and print top ops by time."""
import glob, gzip, json, os, sys, time
import jax, jax.numpy as jnp
import optax
from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.utils.synthetic import make_batch
from neuralbody_tpu.renderer.renderer import RenderSettings
from neuralbody_tpu.train.step import train_step_scan

LOG = "/tmp/jax_trace"

batch_np, static = make_batch(n_rays=1024, n_verts=6890, voxel_size=0.005,
                              seed=0)
batch = jax.tree.map(jnp.asarray, batch_np)
ms = ModelStatic(encoder=EncoderStatic(out_sh=static["out_sh"],
                                       site_caps=static["site_caps"]))
params, bn = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
s = RenderSettings(model=ms, voxel_size=(0.005,) * 3, n_samples=64,
                   chunk_rays=1024, site_interp=True)
tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
opt = tx.init(params)
G = 4
batches = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (G,) + x.shape),
                       batch)
keys = jax.random.split(jax.random.PRNGKey(1), G)

# warmup/compile
params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s, tx)
print("warm loss", float(st["loss"][-1]), flush=True)

with jax.profiler.trace(LOG):
    params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s,
                                          tx)
    _ = float(st["loss"][-1])
print("trace captured", flush=True)

# ---- parse xplane: per-op totals on the device plane ----
xs = sorted(glob.glob(LOG + "/**/*.xplane.pb", recursive=True))
print("xplane files:", xs, flush=True)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

for tool in ("framework_op_stats", "hlo_stats"):
    try:
        data, _ = rtd.xspace_to_tool_data(xs, tool, {})
        out = f"/tmp/trace_{tool}.json"
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else str(data))
        print("wrote", out, len(data), flush=True)
    except Exception as e:
        print(f"{tool} failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
