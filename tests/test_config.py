"""Tests for the config system: merge layers, overlays, CLI opts, registry."""
import os
import textwrap

import pytest

from neuralbody_tpu.config import (
    CfgNode, default_cfg, make_cfg, register, resolve,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


class TestCfgNode:
    def test_attr_access(self):
        c = CfgNode({"a": 1, "b": {"c": 2}})
        assert c.a == 1
        assert c.b.c == 2
        c.b.d = 3
        assert c["b"]["d"] == 3

    def test_merge_recursive(self):
        c = CfgNode({"train": {"lr": 1e-4, "epoch": 10}})
        c.merge_from_other({"train": {"lr": 5e-4}})
        assert c.train.lr == 5e-4
        assert c.train.epoch == 10

    def test_merge_from_list_parses_types(self):
        c = CfgNode({"train": {"lr": 1e-4}, "flag": False})
        c.merge_from_list(["train.lr", "5e-4", "flag", "True",
                           "views", "[0, 6]"])
        assert c.train.lr == pytest.approx(5e-4)
        assert c.flag is True
        assert c.views == [0, 6]

    def test_yaml_roundtrip(self, tmp_path):
        c = CfgNode({"a": 1, "b": {"c": [1, 2, 3]}})
        p = tmp_path / "c.yaml"
        p.write_text(c.dump_yaml())
        c2 = CfgNode.load_yaml(str(p))
        assert c2.to_dict() == c.to_dict()


class TestMakeCfg:
    def test_defaults(self):
        cfg = make_cfg()
        assert cfg.N_rand == 1024
        assert cfg.voxel_size == [0.005, 0.005, 0.005]

    def test_parent_merge_and_overlay(self, tmp_path):
        parent = _write(tmp_path, "parent.yaml", """
            exp_name: parent_exp
            N_samples: 32
        """)
        child = _write(tmp_path, "child.yaml", f"""
            parent_cfg: {parent}
            exp_name: child_exp
            novel_view_cfg:
                renderer_module: if_clight_renderer_mmsk
        """)
        cfg = make_cfg(child)
        assert cfg.exp_name == "child_exp"
        assert cfg.N_samples == 32
        assert cfg.renderer_module == "if_clight_renderer"

        cfg = make_cfg(child, opts=["vis_novel_view", "True"])
        assert cfg.renderer_module == "if_clight_renderer_mmsk"

    def test_cli_opts_beat_overlay(self, tmp_path):
        child = _write(tmp_path, "c.yaml", """
            novel_view_cfg:
                ratio: 0.5
        """)
        cfg = make_cfg(child, opts=["vis_novel_view", "True", "ratio", "0.25"])
        assert cfg.ratio == 0.25

    def test_derived_dirs(self):
        cfg = make_cfg(opts=["task", "if_nerf", "exp_name", "xyzc_313"])
        assert cfg.trained_model_dir.endswith(os.path.join("if_nerf", "xyzc_313"))


class TestRegistry:
    def test_register_resolve(self):
        @register("thing", "widget")
        class Widget:
            pass

        assert resolve("thing", "widget") is Widget
        # reference-style dotted paths resolve by tail
        assert resolve("thing", "lib.things.widget") is Widget

    def test_missing_raises(self):
        with pytest.raises(KeyError):
            resolve("thing", "nope")
