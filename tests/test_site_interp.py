"""Site-feature interpolation path: exact equivalence with the dense path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralbody_tpu.models import latent_xyzc, sparse_conv_net
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.ops.sparse_conv import (
    build_frame_geometry, scatter_index_volume, site_trilinear_sample,
    scatter_dense,
)
from neuralbody_tpu.ops.grid_sample import grid_sample_3d
from neuralbody_tpu.renderer.renderer import RenderSettings, render_rays
from neuralbody_tpu.utils.synthetic import make_batch


class TestSiteTrilinear:
    def test_matches_dense_grid_sample(self, rng):
        sh = (32, 32, 32)
        lvl_sh = (16, 16, 16)
        cap = 64
        n = 40
        sites = np.unique(
            rng.randint(0, 16, (n, 3)).astype(np.int32), axis=0)
        S = len(sites)
        feats = np.zeros((cap, 8), np.float32)
        feats[:S] = rng.randn(S, 8)
        sites_pad = np.full((cap, 3), 2 ** 30, np.int32)
        sites_pad[:S] = sites

        ivol = scatter_index_volume(jnp.array(sites_pad), lvl_sh, cap)
        # continuous full-res voxel coords incl. out-of-range
        dhw = rng.uniform(-3, 35, (200, 3)).astype(np.float32)
        ours = site_trilinear_sample(
            jnp.array(feats), ivol, jnp.array(dhw), sh, cap)

        # dense reference: scatter then grid_sample with the reference
        # normalization gc = dhw/out_sh*2-1 (xyz flip for the sampler)
        vol = scatter_dense(jnp.array(feats), jnp.array(sites_pad), lvl_sh)
        gc = dhw / np.array(sh) * 2.0 - 1.0
        ref = grid_sample_3d(vol, jnp.array(gc[:, ::-1]))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradient_flows_to_site_feats(self, rng):
        lvl_sh = (8, 8, 8)
        cap = 16
        sites = np.array([[1, 1, 1], [2, 2, 2]], np.int32)
        sites_pad = np.full((cap, 3), 2 ** 30, np.int32)
        sites_pad[:2] = sites
        ivol = scatter_index_volume(jnp.array(sites_pad), lvl_sh, cap)
        dhw = jnp.array([[2.5, 2.5, 2.5]], jnp.float32)

        def f(feats):
            return jnp.sum(site_trilinear_sample(
                feats, ivol, dhw, (16, 16, 16), cap))

        g = jax.grad(f)(jnp.ones((cap, 4)))
        g = np.asarray(g)
        assert np.abs(g[:2]).sum() > 0
        assert np.abs(g[2:]).sum() == 0


class TestRenderEquivalence:
    def test_site_path_equals_dense_path(self):
        batch_np, static = make_batch(n_rays=128, n_verts=500,
                                      voxel_size=0.02, seed=11)
        batch = jax.tree.map(jnp.asarray, batch_np)
        ms = ModelStatic(encoder=EncoderStatic(
            out_sh=static["out_sh"], site_caps=static["site_caps"]))
        params, _ = latent_xyzc.init(jax.random.PRNGKey(0),
                                     num_train_frame=4, nv=500)
        base = dict(model=ms, voxel_size=(0.02,) * 3, n_samples=8,
                    chunk_rays=128)
        r_dense, _ = render_rays(
            params, batch, RenderSettings(**base, site_interp=False),
            train=False)
        r_site, _ = render_rays(
            params, batch, RenderSettings(**base, site_interp=True),
            train=False)
        np.testing.assert_allclose(
            np.asarray(r_dense["rgb_map"]), np.asarray(r_site["rgb_map"]),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(r_dense["acc_map"]), np.asarray(r_site["acc_map"]),
            rtol=1e-4, atol=1e-5)

    def test_site_path_gradients_match_dense(self):
        batch_np, static = make_batch(n_rays=64, n_verts=400,
                                      voxel_size=0.02, seed=12)
        batch = jax.tree.map(jnp.asarray, batch_np)
        ms = ModelStatic(encoder=EncoderStatic(
            out_sh=static["out_sh"], site_caps=static["site_caps"]))
        params, _ = latent_xyzc.init(jax.random.PRNGKey(1),
                                     num_train_frame=4, nv=400)
        base = dict(model=ms, voxel_size=(0.02,) * 3, n_samples=8,
                    chunk_rays=64)

        def loss(params, site):
            settings = RenderSettings(**base, site_interp=site)
            ret, _ = render_rays(params, batch, settings, train=False)
            return jnp.mean((ret["rgb_map"] - batch["rgb"]) ** 2)

        g_dense = jax.grad(lambda p: loss(p, False))(params)
        g_site = jax.grad(lambda p: loss(p, True))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-6),
            g_dense, g_site)
