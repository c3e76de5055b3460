"""VoxelGrid + skeleton-plot debug utilities and the mesh visualizer's
voxel debug view (ref: lib/utils/if_nerf/voxels.py:5-196,
lib/utils/vis_utils.py:23-147, lib/visualizers/if_nerf_mesh.py:13-24)."""
import os

import numpy as np
import pytest

from neuralbody_tpu.utils.voxel_grid import VoxelGrid


@pytest.fixture
def block_grid():
    data = np.zeros((8, 8, 8), bool)
    data[2:6, 2:6, 2:6] = True
    return VoxelGrid(data, loc=(1.0, 2.0, 3.0), scale=2.0)


class TestVoxelGrid:
    def test_to_mesh_exposed_faces(self, block_grid):
        verts, quads = block_grid.to_mesh()
        # a solid k^3 block exposes 6*k^2 faces and (k+1)^2*6 - 12*(k+1) + 8
        # shared corner vertices; k=4
        assert quads.shape == (6 * 16, 4)
        assert verts.shape == (5 * 5 * 5 - 3 * 3 * 3, 3)
        # every quad references valid vertices
        assert quads.min() >= 0 and quads.max() < len(verts)
        # vertices live on the block's world-space surface: the block spans
        # grid [2, 6) of 8 => [-0.25, 0.25) pre-scale => loc +/- 0.5
        lo = np.array([1.0, 2.0, 3.0]) - 0.5
        hi = np.array([1.0, 2.0, 3.0]) + 0.5
        assert np.all(verts >= lo - 1e-6) and np.all(verts <= hi + 1e-6)
        # every surface vertex touches at least one face
        assert set(range(len(verts))) == set(np.unique(quads))

    def test_contains_round_trip(self, block_grid):
        # world center of the block is loc; a far corner is outside
        inside = block_grid.contains(np.array([[1.0, 2.0, 3.0]]))
        outside = block_grid.contains(np.array([[1.9, 2.9, 3.9],
                                                [-5.0, 0.0, 0.0]]))
        assert inside.tolist() == [True]
        assert outside.tolist() == [False, False]

    def test_down_sample_any_pool(self, block_grid):
        ds = block_grid.down_sample(2)
        assert ds.resolution == 4
        assert ds.data[1:3, 1:3, 1:3].all()
        assert ds.data.sum() == 8
        # world-space occupancy agrees at the block center
        assert ds.contains(np.array([1.0, 2.0, 3.0]))
        with pytest.raises(ValueError):
            block_grid.down_sample(3)

    def test_from_mesh_duck_typed(self):
        """from_mesh drives the trimesh voxelization protocol; a minimal
        stand-in (trimesh is not installed here) checks the index math."""

        class FakeVox:
            def __init__(self, points):
                self.points = points

            def fill(self):
                return self

        class FakeMesh:
            bounds = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])

            def copy(self):
                return self

            def apply_translation(self, t):
                self._t = t

            def apply_scale(self, s):
                self._s = s

            def voxelized(self, pitch):
                # one occupied voxel at the (scaled) center
                return FakeVox(np.zeros((1, 3)))

        vg = VoxelGrid.from_mesh(FakeMesh(), resolution=8)
        assert vg.resolution == 8
        assert vg.data.sum() == 1
        # center voxel: (0 + 0.5) * 8 - 0.5 = 3.5 -> rounds to 4
        assert vg.data[4, 4, 4]


class TestSkeletonPlots:
    def test_plot_skel_3d_and_2d(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from neuralbody_tpu.utils.vis_skeleton import (plot_skel_2d,
                                                       plot_skel_3d)
        pts = np.random.RandomState(0).randn(24, 3) * 0.3
        ax = plot_skel_3d(pts)
        ax.figure.savefig(tmp_path / "skel3d.png")
        plt.close("all")
        ax2 = plot_skel_2d(pts[:, :2] * 100 + 128)
        ax2.figure.savefig(tmp_path / "skel2d.png")
        plt.close("all")
        assert (tmp_path / "skel3d.png").exists()
        assert (tmp_path / "skel2d.png").exists()

    def test_draw_on_image(self):
        from neuralbody_tpu.utils.vis_skeleton import (draw_bbox_3d,
                                                       draw_skeleton)
        img = np.zeros((64, 64, 3), np.uint8)
        pts = np.random.RandomState(1).rand(24, 2) * 63
        out = draw_skeleton(img, pts)
        corners = np.array([[x, y] for x in (5, 50) for y in (5, 50)
                            for _ in (0,)])
        corners = np.concatenate([corners, corners + 5])
        out = draw_bbox_3d(out, corners)
        assert out.shape == img.shape
        assert out.sum() > 0  # something was drawn


class TestMeshVisualizerVoxelDebug:
    def test_voxel_debug_ply(self, tmp_path):
        from neuralbody_tpu.config import build, make_cfg
        import neuralbody_tpu.visualizers  # noqa: F401
        cfg = make_cfg(opts=["task", "if_nerf", "exp_name", "t"])
        cfg.result_dir = str(tmp_path)
        cfg.mesh_th = 0.5
        cfg.vis_voxel_debug = True
        vis = build("visualizer", "if_nerf_mesh", cfg)

        cube = np.zeros((40, 40, 40), np.float32)
        cube[15:25, 15:25, 15:25] = 1.0  # above mesh_th after pad strip
        output = {"cube": cube,
                  "vertices": np.zeros((3, 3), np.float32),
                  "triangles": np.array([[0, 1, 2]], np.int32)}
        vis.visualize(output, {}, {"frame_index": 7})
        assert os.path.exists(tmp_path / "mesh" / "0007.ply")
        voxel_ply = tmp_path / "mesh" / "0007_voxel.ply"
        assert os.path.exists(voxel_ply)
        # the debug mesh is non-trivial: 6 * 10^2 quads -> 1200 triangles
        text = voxel_ply.read_bytes()
        assert b"element face 1200" in text
