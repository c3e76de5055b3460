"""NeRF baseline (coarse+fine) tests, incl. parity vs a torch oracle MLP."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn as tnn

from neuralbody_tpu.models import nerf
from neuralbody_tpu.models.nerf import NerfStatic
from neuralbody_tpu.renderer.volume_renderer import (
    NerfRenderSettings, render_nerf_rays,
)
from neuralbody_tpu.train.step import nerf_train_step, nerf_eval_step


class TorchNerfOracle(tnn.Module):
    """Reference-topology NeRF MLP (ref: lib/networks/nerf.py:8-69),
    loaded with our params for parity checking."""

    def __init__(self, params, st):
        super().__init__()
        self.st = st
        self.params = params

    def _lin(self, layer, x):
        w = torch.from_numpy(np.asarray(layer["w"]))
        b = torch.from_numpy(np.asarray(layer["b"]))
        return x @ w + b

    def forward(self, input_pts, input_views):
        h = input_pts
        for i, layer in enumerate(self.params["pts_linears"]):
            h = torch.relu(self._lin(layer, h))
            if i in self.st.skips:
                h = torch.cat([input_pts, h], -1)
        alpha = self._lin(self.params["alpha_linear"], h)
        feature = self._lin(self.params["feature_linear"], h)
        h = torch.cat([feature, input_views], -1)
        h = torch.relu(self._lin(self.params["views_linear"], h))
        rgb = self._lin(self.params["rgb_linear"], h)
        return torch.cat([rgb, alpha], -1)


def _embed_torch(x, L):
    outs = [x]
    for i in range(L):
        outs += [torch.sin(x * 2.0 ** i), torch.cos(x * 2.0 ** i)]
    return torch.cat(outs, -1)


class TestNerfMlp:
    def test_matches_torch_oracle(self, rng):
        st = NerfStatic(depth=4, width=32, skips=(2,), xyz_res=4, view_res=2)
        params = nerf.init_mlp(jax.random.PRNGKey(0), st)
        pts = rng.randn(50, 3).astype(np.float32)
        dirs = rng.randn(50, 3).astype(np.float32)

        ours = np.asarray(nerf.apply_mlp(
            params, jnp.array(pts), jnp.array(dirs), st))

        oracle = TorchNerfOracle(params, st)
        ref = oracle(
            _embed_torch(torch.from_numpy(pts), 4),
            _embed_torch(torch.from_numpy(dirs), 2),
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


def _ray_batch(rng, n_rays=64):
    ro = rng.randn(1, n_rays, 3).astype(np.float32)
    rd = rng.randn(1, n_rays, 3).astype(np.float32)
    near = np.full((1, n_rays), 1.0, np.float32)
    far = np.full((1, n_rays), 3.0, np.float32)
    rgb = rng.rand(1, n_rays, 3).astype(np.float32)
    mask = np.ones((1, n_rays), np.float32)
    return {k: jnp.asarray(v) for k, v in dict(
        ray_o=ro, ray_d=rd, near=near, far=far, rgb=rgb,
        ray_mask=mask).items()}


class TestNerfRenderer:
    def _settings(self, n_importance):
        st = NerfStatic(depth=2, width=32, skips=(0,), xyz_res=4, view_res=2)
        return NerfRenderSettings(
            model=st, model_fine=st, n_samples=8,
            n_importance=n_importance, chunk_rays=64)

    def test_coarse_only(self, rng):
        s = self._settings(0)
        params, _ = nerf.init(jax.random.PRNGKey(1), s.model)
        batch = _ray_batch(rng)
        ret, _ = render_nerf_rays(params, batch, s, train=False)
        assert ret["rgb_map"].shape == (1, 64, 3)
        assert "rgb0" not in ret

    def test_hierarchical(self, rng):
        s = self._settings(16)
        params, _ = nerf.init(jax.random.PRNGKey(1), s.model, s.model_fine)
        batch = _ray_batch(rng)
        ret, _ = render_nerf_rays(params, batch, s,
                                  key=jax.random.PRNGKey(2), train=True)
        assert ret["rgb_map"].shape == (1, 64, 3)
        assert ret["rgb0"].shape == (1, 64, 3)
        assert ret["z_std"].shape == (1, 64)
        assert np.isfinite(np.asarray(ret["rgb_map"])).all()

    def test_train_decreases_loss(self, rng):
        s = self._settings(8)
        params, _ = nerf.init(jax.random.PRNGKey(1), s.model, s.model_fine)
        batch = _ray_batch(rng)
        tx = optax.adam(5e-3)
        opt = tx.init(params)
        key = jax.random.PRNGKey(3)
        losses = []
        for _ in range(25):
            key, sub = jax.random.split(key)
            params, opt, stats = nerf_train_step(
                params, opt, batch, sub, s, tx)
            losses.append(float(stats["loss"]))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_eval_deterministic(self, rng):
        s = self._settings(8)
        params, _ = nerf.init(jax.random.PRNGKey(1), s.model, s.model_fine)
        batch = _ray_batch(rng)
        r1 = nerf_eval_step(params, batch, s)
        r2 = nerf_eval_step(params, batch, s)
        np.testing.assert_array_equal(np.asarray(r1["rgb_map"]),
                                      np.asarray(r2["rgb_map"]))
