"""Worker process for the multi-host data-parallel test.

Launched by tests/test_multiprocess.py either standalone (8 local CPU
devices) or as 2 processes x 4 devices with NB_* env set. Runs N sharded
train steps on the deterministic synthetic scene and dumps the final
params so the parent can assert the multi-process run matches the
single-process one exactly (the reference's DDP invariant,
ref train_net.py:93-98).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from neuralbody_tpu.parallel.bootstrap import maybe_initialize_distributed  # noqa: E402

multi = maybe_initialize_distributed()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import optax  # noqa: E402


def main(out_path, n_steps=6):
    from neuralbody_tpu.models import latent_xyzc
    from neuralbody_tpu.models.latent_xyzc import ModelStatic
    from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
    from neuralbody_tpu.parallel.mesh import (
        make_mesh, replicate_state, shard_batch)
    from neuralbody_tpu.parallel.train import make_sharded_train_step
    from neuralbody_tpu.renderer.renderer import RenderSettings
    from neuralbody_tpu.utils.synthetic import make_batch

    n_dev = jax.device_count()
    assert n_dev == 8, f"expected 8 global devices, got {n_dev}"

    batch, static = make_batch(n_rays=128, n_verts=256, voxel_size=0.04,
                               seed=0)
    model_static = ModelStatic(encoder=EncoderStatic(
        out_sh=static["out_sh"], site_caps=static["site_caps"]))
    settings = RenderSettings(model=model_static, voxel_size=(0.04,) * 3,
                              n_samples=8, chunk_rays=128)
    params, bn_stats = latent_xyzc.init(
        jax.random.PRNGKey(0), num_train_frame=4, nv=256)
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
    opt_state = tx.init(params)

    mesh = make_mesh()
    params, bn_stats, opt_state = replicate_state(
        mesh, (params, bn_stats, opt_state))
    step = make_sharded_train_step(mesh, settings, tx, batch)

    sbatch = shard_batch(mesh, batch)
    losses = []
    for i in range(n_steps):
        params, bn_stats, opt_state, stats = step(
            params, bn_stats, opt_state, sbatch, jax.random.PRNGKey(i))
        losses.append(float(stats["loss"]))

    if jax.process_index() == 0:
        flat, _ = jax.tree.flatten(params)
        np.savez(out_path,
                 n_steps=n_steps,
                 loss=np.asarray(losses, np.float64),
                 **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)})
        print(f"worker done: loss={losses[-1]:.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
