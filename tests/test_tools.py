"""Offline tooling tests: vertex extraction, annots, occupancy, rasterizer."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestExtractVertices:
    def test_extract_matches_direct_smpl(self, tmp_path):
        import pickle
        import jax.numpy as jnp
        from neuralbody_tpu.utils import smpl

        model = smpl.make_synthetic_model(n_verts=100, n_joints=6, seed=2)
        # save as an SMPL-style pickle
        pkl = {
            "v_template": model["v_template"],
            "shapedirs": model["shapedirs"],
            "posedirs": model["posedirs"].T.reshape(100, 3, -1),
            "J_regressor": model["J_regressor"],
            "weights": model["weights"],
            "kintree_table": np.stack(
                [model["parents"], np.arange(6)]).astype(np.int64),
            "f": model["faces"],
        }
        model_path = str(tmp_path / "SMPL_TEST.pkl")
        with open(model_path, "wb") as f:
            pickle.dump(pkl, f)

        data_root = tmp_path / "seq"
        (data_root / "params").mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(2):
            np.save(str(data_root / "params" / f"{i}.npy"),
                    {"poses": rng.randn(1, 18) * 0.2,
                     "shapes": rng.randn(1, 10) * 0.3,
                     "Rh": rng.randn(1, 3) * 0.2,
                     "Th": rng.randn(1, 3)})

        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/extract_vertices.py"),
             "--data_root", str(data_root), "--model_path", model_path],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr

        for i in range(2):
            got = np.load(str(data_root / "vertices" / f"{i}.npy"))
            p = np.load(str(data_root / "params" / f"{i}.npy"),
                        allow_pickle=True).item()
            want, _ = smpl.smpl_forward(
                model, jnp.asarray(p["poses"].reshape(-1)),
                jnp.asarray(p["shapes"].reshape(-1)[:10]),
                Rh=jnp.asarray(p["Rh"].reshape(3)),
                Th=jnp.asarray(p["Th"].reshape(3)))
            np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


class TestOccupancy:
    def test_pack_roundtrip(self, tmp_path):
        from neuralbody_tpu.utils.mesh_io import save_ply

        rng = np.random.RandomState(1)
        pts = rng.randn(500, 3).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        ply = str(tmp_path / "p.ply")
        out = str(tmp_path / "occ.npz")
        save_ply(ply, pts)

        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/dataset_tools.py"),
             "occupancy", "--ply", ply, "--out", out, "--res", "32"],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr

        data = np.load(out)
        occ = np.unpackbits(data["compressed_occupancies"])[:32 ** 3]
        occ = occ.reshape(32, 32, 32)
        assert occ.sum() > 0
        assert data["bounds"].shape == (2, 3)


class TestRasterizer:
    def test_renders_cube(self):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from render_mesh import rasterize

        # unit cube mesh
        v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                      for z in (0, 1)], np.float32)
        f = np.array([
            [0, 1, 3], [0, 3, 2], [4, 5, 7], [4, 7, 6],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 3, 7], [1, 7, 5],
        ])
        img = rasterize(v, f, size=64)
        assert img.shape == (64, 64, 3)
        assert img.max() > 0.1          # something rendered
        assert (img.sum(-1) == 0).any()  # background remains


class TestClosestSurfacePoint:
    """utils/surface.py: reference-fidelity barycentric blend weights
    (ref tools/prepare_warping.py:186-199; VERDICT r4 #8)."""

    def _ellipsoid_mesh(self, n=200, seed=3):
        from scipy.spatial import ConvexHull

        rng = np.random.RandomState(seed)
        v = rng.randn(n, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        v *= np.array([0.3, 0.8, 0.15])
        hull = ConvexHull(v)
        return v, hull.simplices.astype(np.int64)

    def test_matches_brute_force(self):
        from neuralbody_tpu.utils.surface import (_point_triangle_bary,
                                                  closest_point_on_mesh)

        verts, faces = self._ellipsoid_mesh()
        rng = np.random.RandomState(0)
        q = rng.randn(64, 3) * 0.4

        _, _, _, pts = closest_point_on_mesh(verts, faces, q, k=16)

        # brute force: exact projection on EVERY face
        tri = verts[faces]
        bary_all = _point_triangle_bary(
            q[:, None], tri[None, :, 0], tri[None, :, 1], tri[None, :, 2])
        closest_all = np.einsum("nfk,fkd->nfd", bary_all, tri)
        d2_all = ((q[:, None] - closest_all) ** 2).sum(-1)
        d_brute = np.sqrt(d2_all.min(1))
        d_ours = np.linalg.norm(q - pts, axis=-1)
        np.testing.assert_allclose(d_ours, d_brute, atol=1e-9)

    def test_on_surface_identity(self):
        from neuralbody_tpu.utils.surface import closest_point_on_mesh

        verts, faces = self._ellipsoid_mesh()
        rng = np.random.RandomState(1)
        fid = rng.randint(0, len(faces), 40)
        b = rng.dirichlet([1, 1, 1], 40)
        q = np.einsum("nk,nkd->nd", b, verts[faces[fid]])

        _, vids, bary, pts = closest_point_on_mesh(verts, faces, q)
        np.testing.assert_allclose(pts, q, atol=1e-9)
        np.testing.assert_allclose(
            np.einsum("nk,nkd->nd", bary, verts[vids]), q, atol=1e-9)

    def test_beats_closest_vertex(self):
        """For a weight field linear in position, barycentric weights at
        the surface are exact while closest-vertex errs by O(edge len) —
        the fidelity gap VERDICT r4 #8 calls out."""
        from scipy.spatial import cKDTree

        from neuralbody_tpu.utils.surface import barycentric_blend_weights

        verts, faces = self._ellipsoid_mesh()
        W = np.stack([0.5 + verts[:, 0], 0.5 - verts[:, 0]], axis=1)

        rng = np.random.RandomState(2)
        fid = rng.randint(0, len(faces), 60)
        b = rng.dirichlet([1, 1, 1], 60)
        q = np.einsum("nk,nkd->nd", b, verts[faces[fid]])
        w_true = np.stack([0.5 + q[:, 0], 0.5 - q[:, 0]], axis=1)

        w_bary = barycentric_blend_weights(verts, faces, W, q)
        _, nn = cKDTree(verts).query(q, k=1)
        w_vert = W[nn]

        err_bary = np.abs(w_bary - w_true).max()
        err_vert = np.abs(w_vert - w_true).max()
        assert err_bary < 1e-9
        assert err_vert > 0.01  # closest-vertex really is coarser


class TestWarpGridBarycentric:
    """tools/prepare_warping.py with a FACED model takes the closest-face
    barycentric path (reference semantics, VERDICT r4 #8)."""

    def test_zero_pose_identity_warp(self):
        import sys
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import prepare_warping
        from neuralbody_tpu.utils import smpl

        model = smpl.make_synthetic_model(n_verts=200, n_joints=8, seed=1,
                                          faces=True)
        assert len(model["faces"]) > 0
        nj = model["weights"].shape[1]
        ptot, pbounds, tbounds = prepare_warping.warp_grid_for_frame(
            model, np.zeros(nj * 3), (0.08,) * 3)
        # zero pose: all bone transforms are identity -> identity warp
        axes = [np.arange(pbounds[0, a], pbounds[1, a] + 0.08, 0.08)
                for a in range(3)]
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
        np.testing.assert_allclose(ptot, grid, atol=1e-4)
        np.testing.assert_allclose(pbounds, tbounds, atol=1e-6)

    def test_posed_surface_maps_back_to_template(self):
        import sys
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import prepare_warping
        from neuralbody_tpu.ops.blend import pts_to_ppts
        from neuralbody_tpu.utils import smpl
        import jax.numpy as jnp

        model = smpl.make_synthetic_model(n_verts=200, n_joints=8, seed=1,
                                          faces=True)
        nj = model["weights"].shape[1]
        rng = np.random.RandomState(3)
        poses = (rng.randn(nj, 3) * 0.15).ravel()
        poses[:3] = 0

        # posed template vertices, via the same LBS the tool uses
        pverts, _ = smpl.lbs(model, jnp.asarray(poses), jnp.zeros(10))
        pverts = np.asarray(pverts)

        ptot, pbounds, _ = prepare_warping.warp_grid_for_frame(
            model, poses, (0.06,) * 3)
        # look up each posed VERTEX's warped T-pose position by sampling
        # the grid nearest-neighbor; it should land near the template
        axes = [np.arange(pbounds[0, a], pbounds[1, a] + 0.06, 0.06)
                for a in range(3)]
        idx = [np.clip(np.searchsorted(ax, pverts[:, a]), 1, len(ax) - 1)
               for a, ax in enumerate(axes)]
        idx = [np.where(np.abs(ax[i] - pverts[:, a])
                        < np.abs(ax[i - 1] - pverts[:, a]), i, i - 1)
               for a, (ax, i) in enumerate(zip(axes, idx))]
        tpts = ptot[idx[0], idx[1], idx[2]]
        # the sampled grid point is up to half a cell from the vertex; the
        # warp is locally rigid, so the error is O(cell) not O(pose)
        err = np.linalg.norm(tpts - model["v_template"], axis=1)
        assert np.median(err) < 0.09, np.median(err)
