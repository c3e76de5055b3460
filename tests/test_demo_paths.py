"""Demo/visualization path tests: orbit, perform, rotate-SMPL, monocular."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralbody_tpu.config import make_cfg, build
from neuralbody_tpu import datasets, renderer, visualizers  # noqa: F401
from neuralbody_tpu.datasets.loader import collate, make_dataset
from neuralbody_tpu.datasets import render_path
from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.train.step import eval_step

from fake_data import make_fake_zju, make_fake_snapshot

N_VERTS = 400


@pytest.fixture(scope="module")
def zju_root(tmp_path_factory):
    return make_fake_zju(str(tmp_path_factory.mktemp("zju") / "CoreView_999"))


@pytest.fixture(scope="module")
def snap_root(tmp_path_factory):
    return make_fake_snapshot(str(tmp_path_factory.mktemp("snap") / "f9c"))


def base_cfg(root, ann):
    cfg = make_cfg(opts=["task", "if_nerf", "exp_name", "demo_t"])
    cfg.H = cfg.W = 64
    cfg.ratio = 1.0
    cfg.N_rand = 64
    cfg.N_samples = 8
    cfg.num_train_frame = 2
    cfg.num_render_views = 4
    cfg.training_view = [0, 1]
    cfg.voxel_size = [0.02, 0.02, 0.02]
    cfg.nv = N_VERTS
    cfg.tpu.chunk_rays = 256
    cfg.train_dataset.data_root = root
    cfg.train_dataset.human = "CoreView_999"
    cfg.train_dataset.ann_file = ann
    cfg.test_dataset.update(cfg.train_dataset)
    cfg.test_dataset.split = "test"
    return cfg


def render_one(cfg, ds, renderer_name, sample):
    static = ModelStatic(encoder=EncoderStatic(
        out_sh=ds.geo.out_sh, site_caps=ds.geo.site_caps))
    settings = build("renderer", renderer_name, cfg, static)
    params, _ = latent_xyzc.init(
        jax.random.PRNGKey(0), num_train_frame=cfg.num_train_frame,
        nv=N_VERTS)
    device_batch, meta = collate([sample], cfg.tpu.chunk_rays)
    batch = jax.tree.map(jnp.asarray, device_batch)
    ret = eval_step(params, batch, settings)
    return jax.tree.map(np.asarray, ret), device_batch, meta


class TestOrbitPath:
    def test_gen_orbit_path_cameras_look_at_rig(self, zju_root):
        Ks, RTs = render_path.load_cam(f"{zju_root}/annots.npy", ratio=1.0)
        path = render_path.gen_orbit_path(RTs, num_views=8)
        assert len(path) == 8
        for w2c in path:
            assert w2c.shape == (4, 4)
            # valid rigid transform: orthonormal rotation
            R = w2c[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestNovelViewDemo:
    def test_render_orbit_frame(self, zju_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = base_cfg(zju_root, f"{zju_root}/annots.npy")
        cfg.test_dataset_module = "multi_view_demo"
        ds = make_dataset(cfg, "test")
        assert len(ds) == cfg.num_render_views
        s = ds[0]
        assert s["msks"].shape[0] == 2  # training views
        ret, device_batch, meta = render_one(
            cfg, ds, "if_clight_renderer_mmsk", s)
        assert np.isfinite(ret["rgb_map"]).all()

        vis = build("visualizer", "if_nerf_demo", cfg)
        vis.visualize(ret, device_batch, meta)
        frame_dir = f"data/render/{cfg.exp_name}/frame_0000"
        assert len(os.listdir(frame_dir)) == 1


class TestPerformDemo:
    def test_playback_frames(self, zju_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = base_cfg(zju_root, f"{zju_root}/annots.npy")
        cfg.test_dataset_module = "multi_view_perform"
        ds = make_dataset(cfg, "test")
        assert len(ds) == 2  # num frames
        s0, s1 = ds[0], ds[1]
        assert int(s0["latent_index"]) == 0
        assert int(s1["latent_index"]) == 1
        ret, db, meta = render_one(cfg, ds, "if_clight_renderer_mmsk", s1)
        assert np.isfinite(ret["rgb_map"]).all()


class TestRotateSmpl:
    def test_rotation_indices(self, zju_root):
        cfg = base_cfg(zju_root, f"{zju_root}/annots.npy")
        cfg.test_dataset_module = "rotate_smpl"
        ds = make_dataset(cfg, "test")
        assert len(ds) == 144
        s0 = ds[0]
        s36 = ds[36]  # 90 degrees
        assert np.isfinite(s0["ray_o"]).all()
        # rotated geometry differs
        assert not np.array_equal(s0["geom"]["nsite0"], s36["geom"]["nsite0"]) \
            or not np.array_equal(s0["R"], s36["R"])


class TestMonocularDemo:
    def test_snapshot_hull_render(self, snap_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = base_cfg(snap_root, f"{snap_root}/params.npy")
        cfg.test_dataset_module = "monocular_demo"
        ds = make_dataset(cfg, "test")
        assert len(ds) == 144
        s = ds[0]
        assert "R0_snap" in s and s["msks"].shape[0] == 1
        ret, db, meta = render_one(cfg, ds, "if_clight_renderer_msk", s)
        assert np.isfinite(ret["rgb_map"]).all()
