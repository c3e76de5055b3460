"""Iso-surface extraction (native C++) and mesh-pipeline tests."""
import numpy as np
import jax
import pytest

from neuralbody_tpu.utils.mcubes import marching_cubes
from neuralbody_tpu.utils.mesh_io import save_ply, load_ply


class TestIsoSurface:
    def test_sphere_surface(self):
        n = 32
        c, r = (n - 1) / 2.0, 10.0
        g = np.mgrid[:n, :n, :n].astype(np.float32)
        # positive inside the sphere, crosses 0 at radius r
        sdf = r - np.sqrt(((g - c) ** 2).sum(0))
        verts, tris = marching_cubes(sdf, 0.0)

        assert len(verts) > 100
        assert len(tris) > 100
        radii = np.linalg.norm(verts - c, axis=1)
        # vertices lie on the sphere within a voxel
        assert abs(radii.mean() - r) < 0.2
        assert radii.std() < 0.2
        # valid topology
        assert tris.min() >= 0 and tris.max() < len(verts)
        # watertight: every edge shared by exactly 2 triangles
        edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                                tris[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_empty_grid(self):
        verts, tris = marching_cubes(np.zeros((8, 8, 8), np.float32), 0.5)
        assert len(verts) == 0 and len(tris) == 0

    def test_threshold_semantics(self):
        # density cube: inner block at 10, rest 0; iso 5 -> box surface
        g = np.zeros((16, 16, 16), np.float32)
        g[4:12, 4:12, 4:12] = 10.0
        verts, _ = marching_cubes(g, 5.0)
        assert len(verts) > 0
        assert verts.min() >= 3.0 and verts.max() <= 12.0


class TestPlyIO:
    def test_roundtrip(self, tmp_path, rng):
        v = rng.randn(10, 3).astype(np.float32)
        f = rng.randint(0, 10, (5, 3)).astype(np.int32)
        p = str(tmp_path / "m.ply")
        save_ply(p, v, f)
        v2, f2 = load_ply(p)
        np.testing.assert_allclose(v, v2)
        np.testing.assert_array_equal(f, f2)


class TestMeshPipeline:
    def test_extract_mesh_from_trained_density(self, tmp_path):
        """Full path: synthetic scene -> density grid -> world mesh."""
        import jax.numpy as jnp
        from neuralbody_tpu.config import make_cfg
        from neuralbody_tpu.models import latent_xyzc
        from neuralbody_tpu.models.latent_xyzc import ModelStatic
        from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
        from neuralbody_tpu.renderer.mesh import extract_mesh
        from neuralbody_tpu.renderer.renderer import RenderSettings
        from neuralbody_tpu.utils.synthetic import make_batch

        batch_np, static = make_batch(n_rays=16, n_verts=400,
                                      voxel_size=0.02, seed=7)
        batch = jax.tree.map(jnp.asarray, batch_np)
        ms = ModelStatic(encoder=EncoderStatic(
            out_sh=static["out_sh"], site_caps=static["site_caps"]))
        settings = RenderSettings(model=ms, voxel_size=(0.02,) * 3,
                                  n_samples=8)
        params, _ = latent_xyzc.init(jax.random.PRNGKey(0),
                                     num_train_frame=4, nv=400)

        # grid over the body bounds in world space
        grid_shape = (24, 24, 24)
        bounds = np.asarray(batch_np["bounds"][0])
        lin = [np.linspace(bounds[0, a], bounds[1, a], grid_shape[a])
               for a in range(3)]
        pts = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
        inside = np.ones(grid_shape, bool)

        from neuralbody_tpu.renderer.renderer import render_density_grid
        mesh_batch = {**batch, "pts": jnp.asarray(pts[None])}
        alpha = np.asarray(render_density_grid(
            params, mesh_batch, settings, pt_chunk=pts.shape[0]))[0]

        cfg = make_cfg()
        # iso strictly inside the density range so a surface must exist
        cfg.mesh_th = float((alpha.min() + alpha.max()) / 2)
        cfg.voxel_size = [0.02] * 3
        cfg.tpu.mesh_pt_chunk = pts.shape[0]

        meta = {"inside": inside, "grid_min_xyz": bounds[0]}
        out = extract_mesh(params, mesh_batch, meta, settings, cfg)
        assert out["cube"].shape == tuple(s + 20 for s in grid_shape)
        assert len(out["vertices"]) > 0
        assert out["triangles"].max() < len(out["vertices"])

    def test_nerf_mesh_density_and_extract(self):
        """NeRF mesh baseline (ref nerf_mesh.py:96-138 +
        volume_mesh_renderer.py:84-107): density-only trunk eval on a
        dense grid, family-dispatched through extract_mesh."""
        import jax.numpy as jnp
        from neuralbody_tpu.config import make_cfg
        from neuralbody_tpu.models import nerf
        from neuralbody_tpu.renderer.mesh import extract_mesh
        from neuralbody_tpu.renderer.volume_renderer import (
            NerfRenderSettings, render_nerf_density_grid)

        st = nerf.NerfStatic(depth=2, width=32)
        params, _ = nerf.init(jax.random.PRNGKey(0), st, st)
        settings = NerfRenderSettings(model=st, model_fine=st)

        grid_shape = (16, 16, 16)
        lin = [np.linspace(-0.5, 0.5, s) for s in grid_shape]
        pts = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
        batch = {"pts": jnp.asarray(pts[None], jnp.float32)}

        alpha = np.asarray(render_nerf_density_grid(
            params, batch, settings, pt_chunk=1024))[0]
        assert alpha.shape == (pts.shape[0],)
        assert np.isfinite(alpha).all()
        # oracle: density == coarse trunk alpha head at the same points
        ref = np.asarray(nerf.apply_density(
            params["coarse"], jnp.asarray(pts, jnp.float32), st))
        np.testing.assert_allclose(alpha, ref, rtol=1e-5, atol=1e-6)

        cfg = make_cfg()
        cfg.mesh_th = float((alpha.min() + alpha.max()) / 2)
        cfg.voxel_size = [0.0625] * 3
        cfg.tpu.mesh_pt_chunk = 1024
        meta = {"inside": np.ones(grid_shape, bool),
                "grid_min_xyz": np.array([-0.5, -0.5, -0.5], np.float32)}
        out = extract_mesh(params, batch, meta, settings, cfg)
        assert len(out["vertices"]) > 0
