"""Validate the full experiment config suite loads and resolves plugins."""
import glob
import os

import pytest

from neuralbody_tpu.config import make_cfg, resolve
from neuralbody_tpu import datasets, evaluators, models, renderer, visualizers  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs/**/*.yaml"),
                               recursive=True))


def test_suite_is_complete():
    # 65 translated reference configs + default + 2 fixed custom templates
    assert len(ALL_CONFIGS) >= 67


@pytest.mark.parametrize("path", ALL_CONFIGS,
                         ids=[os.path.relpath(p, REPO) for p in ALL_CONFIGS])
def test_config_loads_and_resolves(path, monkeypatch):
    monkeypatch.chdir(REPO)  # parent_cfg paths are repo-relative
    cfg = make_cfg(path)
    for kind, key in [("network", "network_module"),
                      ("renderer", "renderer_module"),
                      ("dataset", "train_dataset_module"),
                      ("dataset", "test_dataset_module"),
                      ("evaluator", "evaluator_module"),
                      ("visualizer", "visualizer_module")]:
        name = cfg.get(key)
        if name in (None, ""):
            continue
        resolve(kind, name)


@pytest.mark.parametrize("mode", ["vis_novel_view", "vis_novel_pose",
                                  "vis_rotate_smpl", "vis_mesh"])
def test_313_mode_overlays(mode, monkeypatch):
    monkeypatch.chdir(REPO)
    cfg = make_cfg("configs/zju_mocap_exp/latent_xyzc_313.yaml",
                   opts=[mode, "True"])
    resolve("renderer", cfg.renderer_module)
    resolve("dataset", cfg.test_dataset_module)
    resolve("visualizer", cfg.visualizer_module)
