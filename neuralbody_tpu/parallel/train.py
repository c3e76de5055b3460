"""Sharded training step construction.

Builds a jitted train step with explicit in/out shardings over a Mesh:
rays sharded on the data axis, params/optimizer state replicated. The
gradient all-reduce is GSPMD-inserted (rides ICI within a slice, DCN
across), replacing the reference's DDP backward all-reduce
(ref: trainer.py:51).
"""
from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh

from ..renderer.dispatch import get_render_fn
from ..renderer.renderer import RenderSettings
from ..train.step import _one_train_step
from .mesh import batch_shardings, replicated


def make_sharded_eval_step(mesh: Mesh, settings, example_batch: dict):
    """Deterministic eval render with rays sharded over the mesh.

    Parallelizes the reference's single-GPU whole-image eval loop
    (ref: if_clight_renderer.py:106-117): a 512^2 eval image's ~260k
    padded rays split across all chips; the feature volume is encoded
    replicated per chip, ray chunks stream through lax.map per shard.
    Eval batches are padded to chunk_rays multiples (datasets/loader.py
    collate), which covers any power-of-two device count.
    """
    rep = replicated(mesh)
    b_shardings = batch_shardings(mesh, example_batch)
    render = get_render_fn(settings)

    def step(params, batch):
        ret, _ = render(params, batch, settings, key=None, train=False)
        return ret

    return jax.jit(step, in_shardings=(rep, b_shardings),
                   out_shardings=rep)


class ShardedEval:
    """Callable eval renderer over a mesh, caching one compiled step per
    padded ray count (eval batches pad the variable hit-ray count to
    chunk_rays multiples; shapes recur across frames)."""

    def __init__(self, mesh: Mesh, settings):
        self.mesh = mesh
        self.settings = settings
        self._steps = {}

    def __call__(self, params, device_batch: dict):
        from .mesh import shard_batch
        n_rays = device_batch["ray_o"].shape[1]
        if n_rays not in self._steps:
            self._steps[n_rays] = make_sharded_eval_step(
                self.mesh, self.settings, device_batch)
        batch = shard_batch(self.mesh, device_batch)
        return self._steps[n_rays](params, batch)


def make_sharded_train_step(mesh: Mesh, settings: RenderSettings,
                            tx: optax.GradientTransformation,
                            example_batch: dict, loss=None,
                            mode: str = "rays"):
    """Returns train_step(params, bn_stats, opt_state, batch, key).

    mode="rays": one global batch, rays sharded. mode="batch": frames
    sharded over devices (DDP weak scaling; see parallel/mesh.py)."""
    rep = replicated(mesh)
    b_shardings = batch_shardings(mesh, example_batch, mode=mode)

    def step(params, bn_stats, opt_state, batch, key):
        return _one_train_step(params, bn_stats, opt_state, batch, key,
                               settings, tx, loss=loss)

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, b_shardings, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 2),
    )


def make_sharded_scan_step(mesh: Mesh, settings: RenderSettings,
                           tx: optax.GradientTransformation,
                           example_batch: dict, loss=None,
                           mode: str = "rays"):
    """G train steps per dispatch (lax.scan) with ray-axis sharding.

    Host dispatch of a ~250-leaf step costs more than the step's compute at
    the reference working point; scanning stacked batches amortizes it
    (measured 5.4x on v5e). Batches carry a leading scan axis G; shardings
    are the per-step ones with that extra replicated dim.
    """
    rep = replicated(mesh)
    scan_shardings = batch_shardings(mesh, example_batch, stacked=True,
                                     mode=mode)

    def step(params, bn_stats, opt_state, batches, keys):
        def body(carry, xs):
            params, bn_stats, opt_state = carry
            batch, key = xs
            params, bn_stats, opt_state, stats = _one_train_step(
                params, bn_stats, opt_state, batch, key, settings, tx,
                loss=loss)
            return (params, bn_stats, opt_state), stats

        (params, bn_stats, opt_state), stats = jax.lax.scan(
            body, (params, bn_stats, opt_state), (batches, keys))
        return params, bn_stats, opt_state, stats

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, scan_shardings, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1, 2),
    )


def make_sharded_scan_step_banked(mesh: Mesh, settings: RenderSettings,
                                  tx: optax.GradientTransformation,
                                  example_batch: dict, loss=None):
    """Scan step whose geometry comes from an HBM-resident GeomBank.

    example_batch carries int32 geom_rows [G, B] instead of geom arrays;
    the bank pytree is passed per call (replicated) and indexed inside the
    scan body — frame tables are never re-shipped from the host
    (parallel/geom.py). Single-process path; multi-host uses the plain
    scan step with host-attached geometry.
    """
    import jax.numpy as jnp

    rep = replicated(mesh)
    scan_shardings = batch_shardings(mesh, example_batch, stacked=True)

    def step(params, bn_stats, opt_state, batches, keys, bank):
        def body(carry, xs):
            params, bn_stats, opt_state = carry
            batch, key = xs
            batch = dict(batch)
            rows = batch.pop("geom_rows")
            batch["geom"] = {n: jnp.take(v, rows, axis=0)
                             for n, v in bank.items()}
            params, bn_stats, opt_state, stats = _one_train_step(
                params, bn_stats, opt_state, batch, key, settings, tx,
                loss=loss)
            return (params, bn_stats, opt_state), stats

        (params, bn_stats, opt_state), stats = jax.lax.scan(
            body, (params, bn_stats, opt_state), (batches, keys))
        return params, bn_stats, opt_state, stats

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, scan_shardings, rep, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1, 2),
    )
