"""Trainer wrappers: loss assembly per network family.

The reference couples each network to its loss via NetworkWrapper plugins
(ref: lib/train/trainers/{if_nerf_clight,nerf,tpose}.py:8-37 — renderer +
masked MSE, with an optional coarse rgb0 term for the NeRF baseline). Here
each registered trainer returns (loss_fn, render_fn) pairs the harness and
the jitted steps consume.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import register
from .step import masked_mse


@register("trainer", "if_nerf_clight")
def make_clight_trainer(cfg):
    from ..renderer.renderer import render_rays

    def loss_fn(params, batch, settings, key):
        ret, new_bn = render_rays(params, batch, settings, key=key,
                                  train=True)
        img_loss = masked_mse(ret["rgb_map"], batch["rgb"],
                              batch["ray_mask"])
        stats = {"img_loss": img_loss,
                 "psnr": -10.0 * jnp.log10(img_loss)}
        return img_loss, (ret, new_bn, stats)

    return loss_fn, render_rays


@register("trainer", "nerf")
def make_nerf_trainer(cfg):
    from ..renderer.volume_renderer import render_nerf_rays
    from .step import nerf_loss_fn

    def loss_fn(params, batch, settings, key):
        loss, (ret, stats) = nerf_loss_fn(params, batch, settings, key)
        return loss, (ret, {}, stats)

    return loss_fn, render_nerf_rays


@register("trainer", "tpose")
def make_tpose_trainer(cfg):
    from ..renderer.tpose_renderer import render_tpose_rays

    def loss_fn(params, batch, settings, key):
        ret, new_bn = render_tpose_rays(params, batch, settings, key=key,
                                        train=True)
        img_loss = masked_mse(ret["rgb_map"], batch["rgb"],
                              batch["ray_mask"])
        stats = {"img_loss": img_loss,
                 "psnr": -10.0 * jnp.log10(img_loss)}
        return img_loss, (ret, new_bn, stats)

    return loss_fn, render_tpose_rays
