"""Integration tests: Trainer epoch loop, checkpoint/resume, evaluation."""
import os

import numpy as np
import jax
import pytest

from neuralbody_tpu.config import make_cfg
from fake_data import make_fake_zju

N_VERTS = 400


@pytest.fixture(scope="module")
def zju_root(tmp_path_factory):
    return make_fake_zju(str(tmp_path_factory.mktemp("zju") / "CoreView_999"))


@pytest.fixture()
def cfg(zju_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # data/ outputs land in tmp
    cfg = make_cfg(opts=["task", "if_nerf", "exp_name", "t"])
    cfg.H = cfg.W = 64
    cfg.ratio = 1.0
    cfg.N_rand = 64
    cfg.N_samples = 8
    cfg.num_train_frame = 2
    cfg.training_view = [0, 1]
    cfg.voxel_size = [0.02, 0.02, 0.02]
    cfg.nv = N_VERTS
    cfg.tpu.chunk_rays = 256
    cfg.ep_iter = 2
    cfg.train.epoch = 2
    cfg.save_ep = 1
    cfg.save_latest_ep = 1
    cfg.eval_ep = 100  # off during fit
    cfg.log_interval = 1
    cfg.test.frame_sampler_interval = 1
    cfg.train_dataset.data_root = zju_root
    cfg.train_dataset.human = "CoreView_999"
    cfg.train_dataset.ann_file = f"{zju_root}/annots.npy"
    cfg.test_dataset.update(cfg.train_dataset)
    cfg.test_dataset.split = "test"
    return cfg


class TestTrainer:
    def test_fit_checkpoints_and_validate(self, cfg):
        from neuralbody_tpu.train.trainer import Trainer

        trainer = Trainer(cfg)
        trainer.fit()

        ckpts = os.listdir(cfg.trained_model_dir)
        assert "latest.ckpt" in ckpts
        assert any(c[0].isdigit() for c in ckpts)

        metrics = trainer.validate()
        assert np.isfinite(metrics["psnr"])
        assert 0 <= metrics["ssim"] <= 1
        # comparison images written
        comp = os.path.join(cfg.result_dir, "comparison")
        assert len(os.listdir(comp)) > 0

        # eval state persists across validate() calls: a second validation
        # must trigger ZERO new eval-step compiles (the per-ray-count cache
        # in ShardedEval is hoisted out of validate; VERDICT r3 #5)
        import neuralbody_tpu.parallel.train as ptrain
        calls = {"n": 0}
        orig = ptrain.make_sharded_eval_step

        def counting(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        ptrain.make_sharded_eval_step = counting
        try:
            trainer.validate()
        finally:
            ptrain.make_sharded_eval_step = orig
        assert calls["n"] == 0

    def test_resume_continues_epoch(self, cfg):
        from neuralbody_tpu.train.trainer import Trainer

        t1 = Trainer(cfg)
        t1.fit()
        step_after = t1.recorder.step

        t2 = Trainer(cfg)
        begin = t2.resume()
        assert begin == cfg.train.epoch
        assert t2.recorder.step == step_after
        # params actually restored (differ from fresh init)
        fresh = Trainer(cfg)
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            t2.params, fresh.params)
        assert max(jax.tree.leaves(diffs)) > 0


class TestCheckpointPrune:
    def test_prune_keeps_20(self, cfg, tmp_path):
        from neuralbody_tpu.train.checkpoint import save_checkpoint
        import jax.numpy as jnp

        model_dir = str(tmp_path / "ckpts")
        params = {"w": jnp.zeros(3)}
        for ep in range(25):
            save_checkpoint(model_dir, ep, params, {}, {}, keep=20)
        numbered = [f for f in os.listdir(model_dir) if f != "latest.ckpt"]
        assert len(numbered) == 20
        assert "0.ckpt" not in numbered
        assert "24.ckpt" in numbered


class TestLRSchedules:
    def test_warmup_multi_step(self):
        from neuralbody_tpu.config.node import CfgNode
        from neuralbody_tpu.train.optimizer import make_lr_schedule
        cfg = make_cfg(opts=["task", "if_nerf", "exp_name", "t"])
        cfg.ep_iter = 10
        cfg.train.lr = 1e-3
        cfg.train.scheduler = CfgNode({
            "type": "warmup_multi_step", "milestones": [20, 40],
            "gamma": 0.1, "warmup_factor": 1.0 / 3, "warmup_iters": 5,
            "warmup_method": "linear"})
        sch = make_lr_schedule(cfg)
        # epoch 0: warmup factor 1/3 (ref lr_scheduler.py:41-43 at alpha=0)
        assert np.isclose(float(sch(0)), 1e-3 / 3)
        # past warmup, before milestones: base lr
        assert np.isclose(float(sch(10 * 10)), 1e-3)
        # after first milestone: gamma decay
        assert np.isclose(float(sch(25 * 10)), 1e-4)
        assert np.isclose(float(sch(45 * 10)), 1e-5)
