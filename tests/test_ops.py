"""Parity tests for core ops against torch-CPU / numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from neuralbody_tpu.ops import (
    positional_encoding, embed_dim, grid_sample_3d, raw2outputs, sample_pdf,
    stratified_z_vals,
)


class TestEmbedder:
    def test_dims(self):
        assert embed_dim(10) == 63
        assert embed_dim(4) == 27

    def test_layout_matches_reference_formula(self, rng):
        """Reference layout: [x, sin(2^0 x), cos(2^0 x), ..., cos(2^{L-1} x)]
        (ref: lib/networks/embedder.py:10-36)."""
        x = rng.randn(5, 3).astype(np.float32)
        out = np.asarray(positional_encoding(jnp.array(x), 4))
        expect = [x]
        for i in range(4):
            expect.append(np.sin(x * 2.0 ** i))
            expect.append(np.cos(x * 2.0 ** i))
        expect = np.concatenate(expect, axis=-1)
        np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-6)


class TestGridSample:
    @pytest.mark.parametrize("shape", [(4, 5, 6, 3), (8, 8, 8, 16)])
    def test_forward_matches_torch(self, rng, shape):
        D, H, W, C = shape
        vol = rng.randn(D, H, W, C).astype(np.float32)
        # coords in and out of bounds
        coords = rng.uniform(-1.4, 1.4, size=(200, 3)).astype(np.float32)

        ours = np.asarray(grid_sample_3d(jnp.array(vol), jnp.array(coords)))

        tvol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # [1,C,D,H,W]
        tgrid = torch.from_numpy(coords)[None, None, None]      # [1,1,1,N,3]
        ref = F.grid_sample(tvol, tgrid, padding_mode="zeros",
                            align_corners=True)
        ref = ref[0, :, 0, 0].T.numpy()                          # [N,C]
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_volume_gradient_matches_torch(self, rng):
        D, H, W, C = 5, 6, 7, 4
        vol = rng.randn(D, H, W, C).astype(np.float32)
        coords = rng.uniform(-1.2, 1.2, size=(64, 3)).astype(np.float32)
        g = rng.randn(64, C).astype(np.float32)

        def f(v):
            return jnp.sum(grid_sample_3d(v, jnp.array(coords)) * jnp.array(g))

        ours = np.asarray(jax.grad(f)(jnp.array(vol)))

        tvol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None].requires_grad_()
        tgrid = torch.from_numpy(coords)[None, None, None]
        out = F.grid_sample(tvol, tgrid, padding_mode="zeros",
                            align_corners=True)[0, :, 0, 0].T
        out.backward(torch.from_numpy(g))
        ref = tvol.grad[0].permute(1, 2, 3, 0).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_coord_gradient_matches_torch(self, rng):
        D, H, W, C = 5, 6, 7, 4
        vol = rng.randn(D, H, W, C).astype(np.float32)
        coords = rng.uniform(-0.9, 0.9, size=(32, 3)).astype(np.float32)
        g = rng.randn(32, C).astype(np.float32)

        def f(c):
            return jnp.sum(grid_sample_3d(jnp.array(vol), c) * jnp.array(g))

        ours = np.asarray(jax.grad(f)(jnp.array(coords)))

        tvol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
        tgrid = torch.from_numpy(coords)[None, None, None].requires_grad_()
        out = F.grid_sample(tvol, tgrid, padding_mode="zeros",
                            align_corners=True)[0, :, 0, 0].T
        out.backward(torch.from_numpy(g))
        ref = tgrid.grad[0, 0, 0].numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


class TestCompositing:
    def _torch_raw2outputs(self, raw, z_vals, rays_d, white_bkgd):
        """Independent torch implementation of the quadrature formula
        (ref: lib/networks/renderer/nerf_net_utils.py:6-51)."""
        raw = torch.from_numpy(raw)
        z_vals = torch.from_numpy(z_vals)
        rays_d = torch.from_numpy(rays_d)
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = torch.cat(
            [dists, torch.full_like(dists[..., :1], 1e10)], -1)
        dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
        rgb = torch.sigmoid(raw[..., :3])
        alpha = 1.0 - torch.exp(-torch.relu(raw[..., 3]) * dists)
        ones = torch.ones(alpha.shape[0], 1)
        trans = torch.cumprod(
            torch.cat([ones, 1.0 - alpha + 1e-10], -1), -1)[:, :-1]
        weights = alpha * trans
        rgb_map = torch.sum(weights[..., None] * rgb, -2)
        depth_map = torch.sum(weights * z_vals, -1)
        acc_map = torch.sum(weights, -1)
        disp = 1.0 / torch.clamp(depth_map / acc_map, min=1e-10)
        if white_bkgd:
            rgb_map = rgb_map + (1.0 - acc_map[..., None])
        return (rgb_map.numpy(), disp.numpy(), acc_map.numpy(),
                weights.numpy(), depth_map.numpy())

    @pytest.mark.parametrize("white_bkgd", [False, True])
    def test_matches_formula(self, rng, white_bkgd):
        R, S = 16, 8
        raw = rng.randn(R, S, 4).astype(np.float32)
        z = np.sort(rng.uniform(1, 4, (R, S)).astype(np.float32), axis=-1)
        d = rng.randn(R, 3).astype(np.float32)

        out = raw2outputs(jnp.array(raw), jnp.array(z), jnp.array(d),
                          white_bkgd=white_bkgd)
        rgb, disp, acc, w, depth = self._torch_raw2outputs(raw, z, d, white_bkgd)
        np.testing.assert_allclose(np.asarray(out["rgb_map"]), rgb, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["weights"]), w, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["acc_map"]), acc, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["depth_map"]), depth, rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["disp_map"]), disp, rtol=1e-4, atol=1e-4)

    def test_grad_finite(self, rng):
        R, S = 8, 8
        raw = rng.randn(R, S, 4).astype(np.float32)
        z = np.sort(rng.uniform(1, 4, (R, S)).astype(np.float32), axis=-1)
        d = rng.randn(R, 3).astype(np.float32)

        def loss(raw):
            return jnp.mean(
                raw2outputs(raw, jnp.array(z), jnp.array(d))["rgb_map"] ** 2)

        g = jax.grad(loss)(jnp.array(raw))
        assert np.isfinite(np.asarray(g)).all()


class TestSamplePdf:
    def test_deterministic_matches_numpy(self, rng):
        R, B, N = 4, 16, 32
        bins = np.sort(rng.uniform(0, 1, (R, B)).astype(np.float32), axis=-1)
        w = rng.uniform(0, 1, (R, B - 1)).astype(np.float32)

        out = np.asarray(sample_pdf(jnp.array(bins), jnp.array(w), N, det=True))

        # numpy oracle of the inverse-CDF formula
        wref = w + 1e-5
        pdf = wref / wref.sum(-1, keepdims=True)
        cdf = np.concatenate([np.zeros((R, 1), np.float32),
                              np.cumsum(pdf, -1)], -1)
        u = np.broadcast_to(np.linspace(0, 1, N, dtype=np.float32), (R, N))
        expect = np.empty((R, N), np.float32)
        for r in range(R):
            inds = np.searchsorted(cdf[r], u[r], side="right")
            below = np.maximum(0, inds - 1)
            above = np.minimum(B - 1, inds)
            denom = cdf[r][above] - cdf[r][below]
            denom = np.where(denom < 1e-5, 1.0, denom)
            t = (u[r] - cdf[r][below]) / denom
            expect[r] = bins[r][below] + t * (bins[r][above] - bins[r][below])
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)

    def test_random_in_range(self, rng):
        R, B, N = 4, 16, 64
        bins = np.sort(rng.uniform(0, 1, (R, B)).astype(np.float32), axis=-1)
        w = rng.uniform(0, 1, (R, B - 1)).astype(np.float32)
        out = np.asarray(sample_pdf(jnp.array(bins), jnp.array(w), N,
                                    key=jax.random.PRNGKey(0)))
        assert (out >= bins[:, :1] - 1e-5).all()
        assert (out <= bins[:, -1:] + 1e-5).all()


class TestRayOps:
    def test_deterministic_zvals(self):
        near = jnp.array([[1.0, 2.0]])
        far = jnp.array([[3.0, 6.0]])
        z = stratified_z_vals(near, far, 5)
        np.testing.assert_allclose(
            np.asarray(z[0, 0]), np.linspace(1, 3, 5), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(z[0, 1]), np.linspace(2, 6, 5), rtol=1e-6)

    def test_perturbed_within_bins(self):
        near = jnp.full((1, 16), 1.0)
        far = jnp.full((1, 16), 5.0)
        z = stratified_z_vals(near, far, 64, key=jax.random.PRNGKey(1),
                              perturb=True)
        z = np.asarray(z)
        assert (np.diff(z, axis=-1) > -1e-6).all()
        assert (z >= 1.0 - 1e-6).all() and (z <= 5.0 + 1e-6).all()
