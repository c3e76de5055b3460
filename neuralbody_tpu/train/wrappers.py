"""Trainer wrappers: loss assembly per network family.

The reference couples each network to its loss via NetworkWrapper plugins
(ref: lib/train/trainers/{if_nerf_clight,nerf,tpose}.py:8-37 — renderer +
masked MSE, with an optional coarse rgb0 term for the NeRF baseline). Here
each registered trainer returns a loss function with the harness signature
``loss_fn(params, batch, settings, key) -> (loss, (ret, new_bn, stats))``;
the render function itself is recovered from the static settings type
(renderer/dispatch.py), so all three families share the generic loss in
train/step.py (which already includes the rgb0 auxiliary term when the
renderer emits it).
"""
from __future__ import annotations

from ..config import register
from .step import loss_fn, masked_mse  # noqa: F401  (re-export)


@register("trainer", "if_nerf_clight")
def make_clight_trainer(cfg):
    return loss_fn


@register("trainer", "nerf")
def make_nerf_trainer(cfg):
    return loss_fn


@register("trainer", "tpose")
def make_tpose_trainer(cfg):
    return loss_fn
