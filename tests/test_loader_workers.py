"""Parallel loader workers: the spawn-based WorkerPool must produce the
exact same batch stream as the in-process thread loader.

The reference parallelizes its input pipeline with
DataLoader(num_workers=16) + per-worker numpy reseeding (ref:
lib/datasets/make_dataset.py:66-67,82-90). Our loader instead makes every
batch a pure function of (dataset, epoch, batch index) — so worker-count
is a pure throughput knob, the stream is bit-identical at any parallelism,
and multi-host replicated loading stays aligned for free.
"""
import numpy as np
import pytest

from neuralbody_tpu.config import make_cfg
from neuralbody_tpu.datasets import zju_mocap  # noqa: F401 (registers)
from neuralbody_tpu.datasets.loader import (
    DataLoader, WorkerPool, make_data_loader, make_dataset)

from fake_data import make_fake_zju
from test_datasets import zju_cfg


@pytest.fixture(scope="module")
def zju_root(tmp_path_factory):
    return make_fake_zju(str(tmp_path_factory.mktemp("zju") / "CoreView_999"))


def _assert_batches_equal(a, b, bi):
    (da, ma), (db, mb) = a, b
    assert sorted(da) == sorted(db), f"batch {bi} device keys differ"
    for k in da:
        if k == "geom":
            assert sorted(da[k]) == sorted(db[k])
            for n in da[k]:
                np.testing.assert_array_equal(
                    da[k][n], db[k][n], err_msg=f"batch {bi} geom {n}")
        else:
            np.testing.assert_array_equal(
                np.asarray(da[k]), np.asarray(db[k]),
                err_msg=f"batch {bi} key {k}")


@pytest.mark.slow
def test_worker_pool_matches_thread_loader(zju_root):
    cfg = zju_cfg(zju_root)
    cfg.ep_iter = 6
    cfg.perturb = 1
    dataset = make_dataset(cfg, "train")

    pool = WorkerPool(dataset, num_workers=2)
    try:
        for epoch in (0, 1):  # 2 epochs: pool + geom cache live across them
            hs_thread, hs_pool = {}, {}
            thread_loader = make_data_loader(
                cfg, "train", dataset=dataset, epoch=epoch,
                hat_state=hs_thread)
            pool_loader = make_data_loader(
                cfg, "train", dataset=dataset, epoch=epoch,
                hat_state=hs_pool, pool=pool)
            thread_batches = list(thread_loader)
            pool_batches = list(pool_loader)
            assert len(thread_batches) == len(pool_batches) == 6
            assert hs_thread == hs_pool  # identical derived static sizes
            for bi, (a, b) in enumerate(zip(thread_batches, pool_batches)):
                _assert_batches_equal(a, b, bi)
        # ship-once protocol: after two epochs over 2 frames, the parent
        # cache holds exactly the dataset's distinct frame geometries
        assert len(pool.geom_cache) == 2
    finally:
        pool.shutdown()


def test_loader_stream_is_index_pure(zju_root):
    """The stream depends only on (epoch, batch index): re-iterating an
    epoch reproduces it bit-exactly (the multi-host replicated-batch
    invariant, and what makes worker count a pure throughput knob)."""
    cfg = zju_cfg(zju_root)
    cfg.ep_iter = 3
    cfg.perturb = 1
    dataset = make_dataset(cfg, "train")
    hs = {}
    a = list(make_data_loader(cfg, "train", dataset=dataset, epoch=0,
                              hat_state=hs))
    b = list(make_data_loader(cfg, "train", dataset=dataset, epoch=0,
                              hat_state=hs))
    for bi, (x, y) in enumerate(zip(a, b)):
        _assert_batches_equal(x, y, bi)


def test_host_shard_decorrelates(zju_root):
    """data_sharding=host: hosts draw from their own frame shards with
    decorrelated RNG streams (ref DistributedSampler, samplers.py:75-132)."""
    cfg = zju_cfg(zju_root)
    cfg.ep_iter = 2
    cfg.train.data_sharding = "host"
    dataset = make_dataset(cfg, "train")
    h0 = list(make_data_loader(cfg, "train", dataset=dataset, epoch=0,
                               num_hosts=2, host_id=0, hat_state={}))
    h1 = list(make_data_loader(cfg, "train", dataset=dataset, epoch=0,
                               num_hosts=2, host_id=1, hat_state={}))
    assert len(h0) == len(h1) == 2  # aligned step counts
    # different shards -> different ray pixels
    assert not np.array_equal(h0[0][0]["ray_o"], h1[0][0]["ray_o"])
