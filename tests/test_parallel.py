"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.parallel.mesh import make_mesh, shard_batch
from neuralbody_tpu.parallel.train import make_sharded_train_step
from neuralbody_tpu.renderer.renderer import RenderSettings
from neuralbody_tpu.train.step import train_step
from neuralbody_tpu.utils.synthetic import make_batch


@pytest.fixture(scope="module")
def setup():
    batch_np, static = make_batch(
        n_rays=128, n_verts=512, voxel_size=0.04, seed=5)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model_static = ModelStatic(
        encoder=EncoderStatic(out_sh=static["out_sh"],
                              site_caps=static["site_caps"]))
    settings = RenderSettings(model=model_static, voxel_size=(0.04,) * 3,
                              n_samples=8, chunk_rays=128)
    params, bn_stats = latent_xyzc.init(
        jax.random.PRNGKey(0), num_train_frame=4, nv=512)
    return batch, settings, params, bn_stats


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device(setup):
    batch, settings, params, bn_stats = setup
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
    key = jax.random.PRNGKey(9)

    # single-device reference
    p1 = jax.tree.map(lambda x: x.copy(), params)
    s1 = jax.tree.map(lambda x: x.copy(), bn_stats)
    o1 = tx.init(p1)
    p1, s1, o1, st1 = train_step(p1, s1, o1, batch, key, settings, tx)

    # 8-device sharded
    mesh = make_mesh(8)
    step = make_sharded_train_step(mesh, settings, tx, batch)
    p8 = jax.tree.map(lambda x: x.copy(), params)
    s8 = jax.tree.map(lambda x: x.copy(), bn_stats)
    o8 = tx.init(p8)
    sbatch = shard_batch(mesh, batch)
    p8, s8, o8, st8 = step(p8, s8, o8, sbatch, key)

    assert np.isfinite(float(st8["loss"]))
    np.testing.assert_allclose(float(st1["loss"]), float(st8["loss"]),
                               rtol=1e-5)
    # updated parameters agree across the sharded/unsharded paths
    jax.tree.map(
        lambda v1, v8: np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v8), rtol=5e-4, atol=5e-5),
        p1, p8)


def test_sharded_eval_matches_single_device(setup):
    """VERDICT #5: eval render with rays sharded over the mesh must equal
    the plain single-device eval (ref evaluates on one GPU)."""
    from neuralbody_tpu.parallel.train import ShardedEval
    from neuralbody_tpu.train.step import eval_step

    batch, settings, params, bn_stats = setup

    single = eval_step(params, batch, settings)
    sharded = ShardedEval(make_mesh(8), settings)(
        params, jax.tree.map(np.asarray, batch))

    np.testing.assert_allclose(
        np.asarray(single["rgb_map"]), np.asarray(sharded["rgb_map"]),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(single["depth_map"]), np.asarray(sharded["depth_map"]),
        rtol=1e-5, atol=1e-6)


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_hat_step_matches_single_device():
    """The hat training path under ray+GROUP sharding (parallel/mesh.py
    group_sharded) reproduces the single-device step. Group sharding is
    what lets the grouped interpolation/decode partition over chips
    instead of replicating behind the global pts[hat_sort] gather."""
    derive, static = make_batch(
        n_rays=128, n_verts=512, voxel_size=0.04, seed=5, hat=True,
        n_samples=8, hat_perturb=False)
    hs = dict(static["hat"])
    hs["n_groups"] = -(-hs["n_groups"] // 8) * 8   # shardable group axis
    batch_np, static = make_batch(
        n_rays=128, n_verts=512, voxel_size=0.04, seed=5, hat=True,
        n_samples=8, hat_perturb=False, hat_static=hs)
    assert batch_np["hat_seg_a1"].shape[1] % 8 == 0

    model_static = ModelStatic(
        encoder=EncoderStatic(out_sh=static["out_sh"],
                              site_caps=static["site_caps"]))
    settings = RenderSettings(
        model=model_static, voxel_size=(0.04,) * 3, n_samples=8,
        chunk_rays=128, hat_rows_caps=tuple(static["hat"]["rows_caps"]))
    params, bn_stats = latent_xyzc.init(
        jax.random.PRNGKey(0), num_train_frame=4, nv=512)
    batch = jax.tree.map(jnp.asarray, batch_np)
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
    key = jax.random.PRNGKey(9)

    p1 = jax.tree.map(lambda x: x.copy(), params)
    s1 = jax.tree.map(lambda x: x.copy(), bn_stats)
    o1 = tx.init(p1)
    p1, s1, o1, st1 = train_step(p1, s1, o1, batch, key, settings, tx)

    mesh = make_mesh(8)
    from neuralbody_tpu.parallel.mesh import batch_shardings
    shardings = batch_shardings(mesh, batch_np)
    from jax.sharding import PartitionSpec
    assert shardings["hat_seg_a1"].spec == PartitionSpec(None, "data", None)
    assert shardings["hat_sort"].spec == PartitionSpec(None, "data")

    step = make_sharded_train_step(mesh, settings, tx, batch_np)
    p8 = jax.tree.map(lambda x: x.copy(), params)
    s8 = jax.tree.map(lambda x: x.copy(), bn_stats)
    o8 = tx.init(p8)
    p8, s8, o8, st8 = step(p8, s8, o8, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(st1["loss"]), float(st8["loss"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda v1, v8: np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v8), rtol=5e-4, atol=5e-5),
        p1, p8)
