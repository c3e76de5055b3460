"""Evaluator batch handling + recorder image records (VERDICT r4 #7)."""
import numpy as np

from neuralbody_tpu.config import make_cfg


def _cfg(tmp_path):
    cfg = make_cfg(opts=["task", "if_nerf", "exp_name", "t"])
    cfg.result_dir = str(tmp_path / "result")
    cfg.record_dir = str(tmp_path / "record")
    return cfg


class TestEvaluatorBatch:
    def _batch(self, rng, B, H=8, W=8, n_valid=(20, 11)):
        N = 32
        masks, rgb, pred, ray_mask = [], [], [], []
        for b in range(B):
            m = np.zeros(H * W, bool)
            m[rng.choice(H * W, n_valid[b], replace=False)] = True
            masks.append(m)
            r = np.zeros(N, np.float32)
            r[:n_valid[b]] = 1
            ray_mask.append(r)
            rgb.append(rng.rand(N, 3).astype(np.float32))
            pred.append(rgb[-1] + 0.01 * rng.randn(N, 3).astype(np.float32))
        output = {"rgb_map": np.stack(pred)}
        device_batch = {"ray_mask": np.stack(ray_mask), "rgb": np.stack(rgb)}
        meta = {
            "img_hw": [(H, W)] * B if B > 1 else (H, W),
            "mask_at_box": masks if B > 1 else masks[0],
            "frame_index": list(range(B)) if B > 1 else 0,
            "cam_ind": [0] * B if B > 1 else 0,
        }
        return output, device_batch, meta

    def test_b2_scores_every_element(self, rng, tmp_path):
        from neuralbody_tpu.evaluators.if_nerf import Evaluator

        ev = Evaluator(_cfg(tmp_path))
        ev.evaluate(*self._batch(rng, B=2))
        assert len(ev.psnr) == 2 and len(ev.ssim) == 2
        assert all(np.isfinite(p) for p in ev.psnr)
        assert ev.last_images is not None

    def test_b1_meta_unwrapped(self, rng, tmp_path):
        from neuralbody_tpu.evaluators.if_nerf import Evaluator

        ev = Evaluator(_cfg(tmp_path))
        ev.evaluate(*self._batch(rng, B=1))
        assert len(ev.psnr) == 1


class _SpyWriter:
    def __init__(self):
        self.scalars, self.images = [], []

    def add_scalar(self, tag, v, step):
        self.scalars.append((tag, float(v), step))

    def add_image(self, tag, img, step, dataformats=None):
        assert dataformats == "HWC" and img.ndim == 3
        self.images.append((tag, img.shape, step))


class TestRecorderImages:
    def test_images_flushed_once(self, rng, tmp_path):
        from neuralbody_tpu.train.recorder import Recorder

        rec = Recorder(_cfg(tmp_path))
        rec._writer = _SpyWriter()
        rec.update({"loss": 0.5})
        rec.update_image_stats({"pred_vs_gt": rng.rand(8, 16, 3)})
        rec.record("val", scalars={"psnr": 30.0})
        assert ("val/psnr", 30.0, 0) in rec._writer.scalars
        # explicit-scalars record must NOT leak smoothed train scalars
        assert not any(t == "val/loss" for t, _, _ in rec._writer.scalars)
        assert rec._writer.images == [("val/pred_vs_gt", (8, 16, 3), 0)]
        rec.record("val")  # staged images are write-once
        assert len(rec._writer.images) == 1
