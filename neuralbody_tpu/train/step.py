"""Jitted training / evaluation step.

The reference couples loss to the renderer via NetworkWrapper
(ref: lib/train/trainers/if_nerf_clight.py:8-37): MSE between rendered and
ground-truth pixels over rays inside the body AABB. Here the whole step —
encode, render, loss, backward, clip, Adam update, BN running-stat EMA —
is one pjit-able pure function; padded rays are excluded by ray_mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models.sparse_conv_net import update_running_stats
from ..renderer.dispatch import get_render_fn
from ..renderer.renderer import RenderSettings


def masked_mse(pred, target, mask):
    """Mean squared error over valid rays (mask [B, R])."""
    m = mask[..., None]
    se = ((pred - target) ** 2) * m
    return jnp.sum(se) / jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)


def merge_bn_stats(bn_stats, new_bn):
    """EMA-merge fresh batch statistics into the running BN state.

    Families without BatchNorm (the NeRF baseline) return an empty new_bn;
    the running state passes through unchanged.
    """
    if not new_bn:
        return bn_stats
    return {"xyzc_net": update_running_stats(bn_stats["xyzc_net"], new_bn)}


def loss_fn(params, batch, settings, key):
    """Family-generic training loss: render via settings-type dispatch,
    masked MSE on valid rays, plus the NeRF baseline's auxiliary coarse
    term when the renderer emits rgb0 (ref: lib/train/trainers/nerf.py:24-33,
    if_nerf_clight.py:24-27)."""
    render = get_render_fn(settings)
    ret, new_bn = render(params, batch, settings, key=key, train=True)
    img_loss = masked_mse(ret["rgb_map"], batch["rgb"], batch["ray_mask"])
    loss = img_loss
    scalar_stats = {"img_loss": img_loss}
    if "rgb0" in ret:
        img_loss0 = masked_mse(ret["rgb0"], batch["rgb"], batch["ray_mask"])
        loss = loss + img_loss0
        scalar_stats["img_loss0"] = img_loss0
    if "plan_overflow" in ret:
        # device-planned hat batches: nonzero means the static plan caps
        # (n_groups / rows_caps / seg_caps) were exceeded and rows were
        # clipped — raise the hat_state headroom (ops/device_plan.py)
        scalar_stats["plan_overflow"] = jnp.max(ret["plan_overflow"])
    scalar_stats["psnr"] = -10.0 * jnp.log10(img_loss)
    return loss, (ret, new_bn, scalar_stats)


@partial(jax.jit, static_argnames=("settings", "tx", "loss"),
         donate_argnames=("params", "opt_state"))
def train_step(params, bn_stats, opt_state, batch, key, settings,
               tx: optax.GradientTransformation, loss=None):
    """One optimization step. Returns (params, bn_stats, opt_state, stats)."""
    return _one_train_step(params, bn_stats, opt_state, batch, key,
                           settings, tx, loss=loss)


@partial(jax.jit, static_argnames=("settings",))
def eval_step(params, batch, settings):
    """Deterministic forward render (perturb off; ref run.py:50).

    Family-generic: the render function is recovered from the static
    settings type at trace time (renderer/dispatch.py)."""
    ret, _ = get_render_fn(settings)(params, batch, settings, key=None,
                                     train=False)
    return ret


def _one_train_step(params, bn_stats, opt_state, batch, key, settings, tx,
                    loss=None):
    loss = loss_fn if loss is None else loss
    (loss_val, (_, new_bn, scalar_stats)), grads = jax.value_and_grad(
        loss, has_aux=True
    )(params, batch, settings, key)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    bn_stats = merge_bn_stats(bn_stats, new_bn)
    scalar_stats["loss"] = loss_val
    return params, bn_stats, opt_state, scalar_stats


@partial(jax.jit, static_argnames=("settings", "tx", "loss"),
         donate_argnames=("params", "bn_stats", "opt_state"))
def train_step_scan_banked(params, bn_stats, opt_state, batches, keys,
                           geom_bank, settings, tx, loss=None):
    """train_step_scan with geometry selected from a device-resident bank.

    batches carry int32 geom_rows [G, B] instead of stacked geom arrays —
    the production path: frame geometry (~15 MB/frame) lives in HBM
    (parallel/geom.py GeomBank) and is never re-shipped per batch; each
    scan iteration takes its frames from the bank by index (large
    contiguous slices, HBM-bandwidth).
    """
    def body(carry, xs):
        params, bn_stats, opt_state = carry
        batch, key = xs
        batch = dict(batch)
        rows = batch.pop("geom_rows")
        batch["geom"] = {n: jnp.take(v, rows, axis=0)
                         for n, v in geom_bank.items()}
        params, bn_stats, opt_state, stats = _one_train_step(
            params, bn_stats, opt_state, batch, key, settings, tx, loss=loss)
        return (params, bn_stats, opt_state), stats

    (params, bn_stats, opt_state), stats = jax.lax.scan(
        body, (params, bn_stats, opt_state), (batches, keys))
    return params, bn_stats, opt_state, stats


@partial(jax.jit, static_argnames=("settings", "tx", "loss"),
         donate_argnames=("params", "bn_stats", "opt_state"))
def train_step_scan(params, bn_stats, opt_state, batches, keys,
                    settings, tx, loss=None):
    """Run G optimization steps in ONE dispatch via lax.scan.

    Host dispatch of a step with ~250 pytree leaves costs >1 ms — more than
    the 0.55 ms of actual fwd+bwd compute at the reference working point.
    Scanning G pre-stacked batches through the device amortizes that to
    ~nothing (the TPU-native answer to per-step Python overhead).

    batches: batch pytree with a leading scan axis G; keys: [G, 2].
    Returns stats stacked over the G steps.
    """
    def body(carry, xs):
        params, bn_stats, opt_state = carry
        batch, key = xs
        params, bn_stats, opt_state, stats = _one_train_step(
            params, bn_stats, opt_state, batch, key, settings, tx, loss=loss)
        return (params, bn_stats, opt_state), stats

    (params, bn_stats, opt_state), stats = jax.lax.scan(
        body, (params, bn_stats, opt_state), (batches, keys))
    return params, bn_stats, opt_state, stats


# ---------------------------------------------------------------------------
# NeRF-baseline steps (coarse+fine with auxiliary coarse loss,
# ref: lib/train/trainers/nerf.py)
# ---------------------------------------------------------------------------

def nerf_loss_fn(params, batch, settings, key):
    loss, (ret, _, scalar_stats) = loss_fn(params, batch, settings, key)
    return loss, (ret, scalar_stats)


@partial(jax.jit, static_argnames=("settings", "tx"),
         donate_argnames=("params", "opt_state"))
def nerf_train_step(params, opt_state, batch, key, settings, tx):
    (loss, (_, scalar_stats)), grads = jax.value_and_grad(
        nerf_loss_fn, has_aux=True)(params, batch, settings, key)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    scalar_stats["loss"] = loss
    return params, opt_state, scalar_stats


@partial(jax.jit, static_argnames=("settings",))
def nerf_eval_step(params, batch, settings):
    from ..renderer.volume_renderer import render_nerf_rays
    ret, _ = render_nerf_rays(params, batch, settings, key=None, train=False)
    return ret


@partial(jax.jit, static_argnames=("layout", "settings", "tx", "loss"),
         donate_argnames=("params", "bn_stats", "opt_state"))
def train_step_scan_packed(params, bn_stats, opt_state, packed, keys,
                           geom_bank, layout, settings, tx, loss=None):
    """train_step_scan_banked with the dispatch payload as ONE buffer.

    On the tunneled TPU, device-buffer creation costs ~12 ms of RPC
    latency per array regardless of size (tools/probes/fresh_gap.py), so
    the host packs the whole stacked group into a single uint8 buffer
    (parallel/pack.py) and the step unpacks it here with static slices +
    bitcasts — XLA folds those into the consumers.
    """
    from ..parallel.pack import unpack

    batches = unpack(packed, layout)
    return train_step_scan_banked(
        params, bn_stats, opt_state, batches, keys, geom_bank,
        settings, tx, loss=loss)
