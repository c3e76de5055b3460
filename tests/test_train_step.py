"""End-to-end training-step tests on a synthetic scene (no real data)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.renderer.renderer import (
    RenderSettings, render_rays, render_density_grid,
)
from neuralbody_tpu.train.step import eval_step, train_step, masked_mse
from neuralbody_tpu.utils.synthetic import make_batch
import optax


@pytest.fixture(scope="module")
def scene():
    # small body, coarse voxels -> small grids and fast CPU compile
    batch_np, static = make_batch(
        n_rays=256, n_verts=800, voxel_size=0.02, seed=3)
    batch = jax.tree.map(jnp.asarray, batch_np)
    enc = EncoderStatic(out_sh=static["out_sh"],
                        site_caps=static["site_caps"])
    model_static = ModelStatic(encoder=enc)
    return batch, model_static


@pytest.fixture(scope="module")
def params(scene):
    return latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=4, nv=800)


class TestRender:
    def test_render_shapes_and_finiteness(self, scene, params):
        batch, model_static = scene
        p, _ = params
        settings = RenderSettings(model=model_static, voxel_size=(0.02, 0.02, 0.02), n_samples=16,
                                  chunk_rays=256)
        ret, _ = render_rays(p, batch, settings, key=jax.random.PRNGKey(1),
                             train=True)
        assert ret["rgb_map"].shape == (1, 256, 3)
        assert ret["depth_map"].shape == (1, 256)
        for v in ret.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_chunked_equals_unchunked(self, scene, params):
        batch, model_static = scene
        p, _ = params
        s1 = RenderSettings(model=model_static, voxel_size=(0.02, 0.02, 0.02), n_samples=16, chunk_rays=256)
        s2 = RenderSettings(model=model_static, voxel_size=(0.02, 0.02, 0.02), n_samples=16, chunk_rays=64)
        r1, _ = render_rays(p, batch, s1, train=False)
        r2, _ = render_rays(p, batch, s2, train=False)
        np.testing.assert_allclose(np.asarray(r1["rgb_map"]),
                                   np.asarray(r2["rgb_map"]),
                                   rtol=1e-5, atol=1e-6)

    def test_density_grid(self, scene, params):
        batch, model_static = scene
        p, _ = params
        settings = RenderSettings(model=model_static, voxel_size=(0.02, 0.02, 0.02), n_samples=16)
        pts = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (1, 512, 3)),
            dtype=jnp.float32)
        alpha = render_density_grid(p, {**batch, "pts": pts}, settings,
                                    pt_chunk=512)
        assert alpha.shape == (1, 512)
        assert np.isfinite(np.asarray(alpha)).all()


class TestTrainStep:
    def test_loss_decreases(self, scene, params):
        batch, model_static = scene
        # copy: train_step donates its params/opt_state buffers
        p = jax.tree.map(lambda x: x.copy(), params[0])
        bn_stats = jax.tree.map(lambda x: x.copy(), params[1])
        settings = RenderSettings(model=model_static, voxel_size=(0.02, 0.02, 0.02), n_samples=16,
                                  chunk_rays=256)
        tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
        opt_state = tx.init(p)

        key = jax.random.PRNGKey(42)
        losses = []
        for i in range(30):
            key, sub = jax.random.split(key)
            p, bn_stats, opt_state, stats = train_step(
                p, bn_stats, opt_state, batch, sub, settings, tx)
            losses.append(float(stats["loss"]))

        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, losses

    def test_eval_step_deterministic(self, scene, params):
        batch, model_static = scene
        p, _ = params
        settings = RenderSettings(model=model_static, voxel_size=(0.02, 0.02, 0.02), n_samples=16,
                                  chunk_rays=256)
        r1 = eval_step(p, batch, settings)
        r2 = eval_step(p, batch, settings)
        np.testing.assert_array_equal(np.asarray(r1["rgb_map"]),
                                      np.asarray(r2["rgb_map"]))

    def test_masked_mse_ignores_padding(self):
        pred = jnp.ones((1, 4, 3))
        tgt = jnp.zeros((1, 4, 3))
        mask = jnp.array([[1.0, 1.0, 0.0, 0.0]])
        # padded rays carry garbage
        pred = pred.at[0, 2:].set(99.0)
        assert float(masked_mse(pred, tgt, mask)) == pytest.approx(1.0)
