"""Device mesh and sharding layout.

TPU-native replacement for the reference's NCCL DistributedDataParallel
(ref: train_net.py:93-98, lib/train/trainers/trainer.py:13-18): a 1-D
jax.sharding.Mesh over all chips with the ray/batch axis sharded and
parameters replicated. XLA GSPMD inserts the gradient psum over ICI and
overlaps it with the backward pass — no hand-written collectives.

The model has no attention and its feature volume is small (<=352ch over a
~96^3 effective grid), so volumes are replicated per chip and only the ray
dimension is sharded (SURVEY.md §5 long-context note).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """[B, R, ...] (or stacked [G, B, R, ...]): shard the ray axis."""
    spec = P(None, None, DATA_AXIS) if stacked else P(None, DATA_AXIS)
    return NamedSharding(mesh, spec)


def batch_sharded(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """[B, ...] (or stacked [G, B, ...]): shard the batch (frame) axis."""
    spec = P(None, DATA_AXIS) if stacked else P(DATA_AXIS)
    return NamedSharding(mesh, spec)


def group_sharded(mesh: Mesh, stacked: bool = False,
                  flat: bool = False) -> NamedSharding:
    """Hat-plan arrays: shard the GROUP axis.

    [B, ngrp, S] seg/row tables (flat=False) or [B, ngrp*P] hat_sort
    (flat=True; P-aligned because ngrp divides the shard count). Without
    this, the hat decode replicates per device under ray sharding: the
    global pts[hat_sort] gather forces an all-gather of the sharded ray
    points and every device then computes ALL groups (measured ~6x step
    blowup on the 8-virtual-device CPU mesh, tools/probes/
    cpu_mesh_scaling.py). Group sharding keeps the gather's INDICES
    sharded instead, so the grouped interpolation + decode partition over
    chips and only the small raw de-sort needs cross-chip traffic.
    """
    spec = (P(None, None, DATA_AXIS) if stacked else P(None, DATA_AXIS)
            ) if flat else (
        P(None, None, DATA_AXIS, None) if stacked
        else P(None, DATA_AXIS, None))
    return NamedSharding(mesh, spec)


def batch_shardings(mesh: Mesh, batch: dict, stacked: bool = False,
                    mode: str = "rays") -> dict:
    """Sharding pytree for a canonical batch.

    mode="rays" (default): rays sharded, everything else replicated —
    every chip encodes the full feature volume, as every reference GPU
    does under DDP; one global batch is shared by all hosts.

    mode="batch": EVERY per-frame array (geom included) is sharded on the
    leading batch axis — the reference's DDP weak-scaling recipe
    (ref samplers.py:75-132): global batch = n_devices x per-device frames,
    each chip encodes only its own frames. Requires B % n_devices == 0.
    """
    rep = replicated(mesh)
    if mode == "batch":
        shard = batch_sharded(mesh, stacked)
        return {
            k: (jax.tree.map(lambda _: shard, v) if isinstance(v, dict)
                else shard)
            for k, v in batch.items()
        }
    ray_keys = {"ray_o", "ray_d", "near", "far", "rgb", "ray_mask", "pts",
                "z_vals", "z_frac"}
    shard = ray_sharded(mesh, stacked)
    # hat-plan arrays shard on the group axis when it divides the mesh
    # (loader pads n_groups to a multiple of 8); otherwise replicate
    hat_tbl = {f"hat_seg_a{l}" for l in (1, 2, 3, 4)} | {
        f"hat_seg_cum{l}" for l in (1, 2, 3, 4)} | {
        f"hat_rows{l}" for l in (1, 2, 3, 4)}
    proto = batch.get("hat_seg_a1", batch.get("hat_rows1"))
    n_shards = int(np.prod(mesh.devices.shape))
    groups_ok = (proto is not None
                 and np.shape(proto)[-2] % n_shards == 0)

    def spec(k):
        if k in ray_keys:
            return shard
        if groups_ok and k in hat_tbl:
            return group_sharded(mesh, stacked)
        if groups_ok and k == "hat_sort":
            return group_sharded(mesh, stacked, flat=True)
        return rep

    return {
        k: (jax.tree.map(lambda _: rep, v) if isinstance(v, dict)
            else spec(k))
        for k, v in batch.items()
    }


def _put_global(x, s):
    """Place a host array under a sharding that may span processes.

    Multi-host: every host holds the same full global batch (loaders are
    epoch-deterministic; parallel/bootstrap.py) and materializes only its
    addressable shards via the callback."""
    x = np.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])
    return jax.device_put(x, s)


def _put_local_shard(x, s):
    """Assemble a global array from per-process LOCAL shards (mode="batch"
    under multi-host: each host loads only its own frames)."""
    x = np.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(s, x)
    return jax.device_put(x, s)


def shard_batch(mesh: Mesh, batch: dict, stacked: bool = False,
                mode: str = "rays") -> dict:
    """Device-put a host batch with the canonical shardings.

    mode="batch": `batch` holds each process's LOCAL frames; the returned
    arrays are global with B = num_processes x local B.
    """
    shardings = batch_shardings(mesh, batch, stacked, mode)
    put = _put_local_shard if mode == "batch" else _put_global
    return jax.tree.map(
        put, batch, shardings,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def replicate_state(mesh: Mesh, tree):
    """Commit a host-side state pytree (params/opt) replicated over the
    mesh — required under multi-host so every process contributes its
    addressable replicas of the same global value."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: _put_global(x, rep), tree)
