"""Data-layer tests on fabricated mini datasets in reference formats."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralbody_tpu.config import make_cfg
from neuralbody_tpu.datasets import zju_mocap, snapshot  # noqa: F401
from neuralbody_tpu.datasets.loader import collate, make_data_loader, make_dataset
from neuralbody_tpu.datasets import ray_utils, samplers
from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.renderer.renderer import RenderSettings
from neuralbody_tpu.train.step import train_step

from fake_data import make_fake_zju, make_fake_snapshot


N_VERTS = 400


@pytest.fixture(scope="module")
def zju_root(tmp_path_factory):
    return make_fake_zju(str(tmp_path_factory.mktemp("zju") / "CoreView_999"))


@pytest.fixture(scope="module")
def snap_root(tmp_path_factory):
    return make_fake_snapshot(str(tmp_path_factory.mktemp("snap") / "f9c"))


def zju_cfg(root, **over):
    opts = []
    for k, v in over.items():
        opts += [k, str(v)]
    cfg = make_cfg(opts=opts)
    cfg.H = cfg.W = 64
    cfg.ratio = 1.0
    cfg.N_rand = 64
    cfg.num_train_frame = 2
    cfg.training_view = [0, 1]
    cfg.voxel_size = [0.02, 0.02, 0.02]
    cfg.nv = N_VERTS
    cfg.tpu.chunk_rays = 256
    cfg.train_dataset.data_root = root
    cfg.train_dataset.human = "CoreView_999"
    cfg.train_dataset.ann_file = f"{root}/annots.npy"
    cfg.test_dataset.update(cfg.train_dataset)
    cfg.test_dataset.split = "test"
    return cfg


class TestRayUtils:
    def test_rays_through_pixels(self):
        K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
        R = np.eye(3)
        T = np.array([[0.0], [0.0], [2.0]])
        ro, rd = ray_utils.get_rays(64, 64, K, R, T)
        # camera center = -R^T T
        np.testing.assert_allclose(ro[0, 0], [0, 0, -2], atol=1e-6)
        # center pixel looks along +z
        d = rd[32, 32] / np.linalg.norm(rd[32, 32])
        np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)

    def test_near_far_slab(self):
        bounds = np.array([[-1.0, -1, -1], [1, 1, 1]])
        ro = np.array([[0.0, 0, -5], [0, 0, -5]])
        rd = np.array([[0.0, 0, 1], [1.0, 0, 0]])  # hit, miss
        near, far, hit = ray_utils.get_near_far(bounds, ro, rd)
        assert hit.tolist() == [True, False]
        np.testing.assert_allclose(near, [4.0], atol=1e-5)
        np.testing.assert_allclose(far, [6.0], atol=1e-5)


class TestSamplers:
    def test_frame_sampler(self):
        idx = samplers.frame_sampler_indices(120, num_cams=4, interval=10)
        assert idx[:4] == [0, 1, 2, 3]
        assert idx[4:8] == [40, 41, 42, 43]

    def test_host_shard_equal_lengths(self):
        idx = list(range(10))
        shards = [samplers.host_shard(idx, 4, h) for h in range(4)]
        assert len({len(s) for s in shards}) == 1

    def test_epoch_indices_deterministic(self):
        a = samplers.epoch_indices(20, epoch=3)
        b = samplers.epoch_indices(20, epoch=3)
        c = samplers.epoch_indices(20, epoch=4)
        assert a == b and a != c

    def test_image_size_batches(self):
        batches = samplers.image_size_batches(
            list(range(10)), batch_size=4, min_hw=(200, 300),
            max_hw=(400, 600), epoch=1)
        assert len(batches) == 3                 # 4 + 4 + 2 (no drop_last)
        for idxs, (h, w) in batches:
            assert h % 32 == 0 and w % 32 == 0
            assert 200 <= h <= 448 and 300 <= w <= 640
        # origin strategy keeps native size
        ob = samplers.image_size_batches(
            list(range(4)), 2, (200, 300), (400, 600), strategy="origin")
        assert all(hw == (-1, -1) for _, hw in ob)
        # deterministic per (seed, epoch)
        again = samplers.image_size_batches(
            list(range(10)), 4, (200, 300), (400, 600), epoch=1)
        assert [hw for _, hw in again] == [hw for _, hw in batches]


class TestZJUDataset:
    def test_train_sample_shapes(self, zju_root):
        cfg = zju_cfg(zju_root)
        ds = make_dataset(cfg, "train")
        assert len(ds) == 4  # 2 frames x 2 views
        s = ds[0]
        assert s["rgb"].shape == (64, 3)
        assert s["ray_o"].shape == (64, 3)
        assert s["near"].shape == (64,)
        assert s["geom"]["vert_idx"].shape == (N_VERTS,)
        assert s["R"].shape == (3, 3)
        # all train rays hit the AABB
        assert s["mask_at_box"].all()

    def test_test_split_uses_heldout_views_and_padding(self, zju_root):
        cfg = zju_cfg(zju_root)
        ds = make_dataset(cfg, "test")
        s = ds[0]
        n = s["rgb"].shape[0]
        assert n > 0
        batch, meta = collate([s], chunk_rays=256)
        assert batch["rgb"].shape[1] % 256 == 0
        assert batch["ray_mask"][0].sum() == n
        assert "mask_at_box" in meta

    def test_loader_train_batches(self, zju_root):
        cfg = zju_cfg(zju_root)
        cfg.ep_iter = 3
        loader = make_data_loader(cfg, "train")
        batches = list(loader)
        assert len(batches) == 3
        b, meta = batches[0]
        assert b["rgb"].shape == (1, 64, 3)
        assert b["ray_mask"].shape == (1, 64)
        assert b["Th"].shape == (1, 1, 3)

    def test_loader_image_size_batch_sampler(self, zju_root):
        """cfg.train.batch_sampler='image_size' draws bucketed multi-scale
        sizes per batch (ref make_dataset.py:57, samplers.py:10-47); the
        device ray shapes stay static at N_rand."""
        cfg = zju_cfg(zju_root)
        cfg.ep_iter = 12
        cfg.train.batch_sampler = "image_size"
        cfg.train.sampler_meta.min_hw = [32, 32]
        cfg.train.sampler_meta.max_hw = [64, 64]
        loader = make_data_loader(cfg, "train")
        sizes = set()
        for b, meta in loader:
            assert b["rgb"].shape == (1, 64, 3)  # static device shape
            sizes.add(tuple(meta["img_hw"]))
        assert len(sizes) >= 2, sizes  # >=2 distinct bucketed sizes drawn
        for h, w in sizes:
            assert h % 32 == 0 and w % 32 == 0

    def test_novel_pose_window(self, zju_root):
        cfg = zju_cfg(zju_root)
        cfg.test_novel_pose = True
        cfg.num_train_frame = 1
        cfg.num_novel_pose_frame = 1
        ds = make_dataset(cfg, "test")
        s = ds[0]
        # latent pinned to last training frame
        assert int(s["latent_index"]) == 0
        assert int(s["frame_index"]) >= 1

    def test_train_step_on_real_batch(self, zju_root):
        cfg = zju_cfg(zju_root)
        cfg.ep_iter = 2
        ds = make_dataset(cfg, "train")
        loader = make_data_loader(cfg, "train", dataset=ds)

        static = ModelStatic(
            encoder=EncoderStatic(out_sh=ds.geo.out_sh,
                                  site_caps=ds.geo.site_caps))
        settings = RenderSettings(
            model=static, voxel_size=tuple(cfg.voxel_size),
            n_samples=8, chunk_rays=cfg.N_rand)
        params, bn = latent_xyzc.init(
            jax.random.PRNGKey(0), num_train_frame=cfg.num_train_frame,
            nv=N_VERTS)
        tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
        opt = tx.init(params)
        for device_batch, meta in loader:
            batch = jax.tree.map(jnp.asarray, device_batch)
            if "hat_sort" in batch and not settings.hat_rows_caps:
                # static expansion widths for the compact hat-row segments,
                # derived by the loader's first batch (as the Trainer does)
                settings = settings._replace(
                    hat_rows_caps=tuple(loader.hat_state["rows_caps"]))
            params, bn, opt, stats = train_step(
                params, bn, opt, batch, jax.random.PRNGKey(1), settings, tx)
            assert np.isfinite(float(stats["loss"]))


class TestSnapshotDataset:
    def test_train_sample(self, snap_root):
        cfg = zju_cfg(snap_root)
        cfg.train_dataset.ann_file = f"{snap_root}/params.npy"
        cfg.train_dataset_module = "monocular"
        ds = make_dataset(cfg, "train")
        assert len(ds) == 2
        s = ds[0]
        assert s["rgb"].shape == (64, 3)
        assert s["geom"]["nbr0"].shape[0] == 27  # tap-major [27, S]
        assert s["mask_at_box"].all()
