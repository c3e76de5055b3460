"""Single-buffer dispatch payloads: pack the batch tree into one array.

WHY: on the tunneled TPU, creating a device buffer costs ~12 ms of RPC
latency PER ARRAY regardless of size (tools/probes/fresh_gap.py: a
16-leaf 4.5 MB tree ships in 384 ms, the same bytes as ONE buffer in
202 ms). A fresh dispatch group is ~8-16 leaves, so per-leaf latency —
not bandwidth, not host CPU — dominates the production fresh path's gap
to the device ceiling. Packing the whole group into one uint8 buffer
pays the latency once; the jitted step unpacks with static slices +
bitcasts (free — XLA folds them into the consumers' layouts).

The layout is a hashable static spec derived once per (shapes, dtypes)
configuration — the same compile-once discipline as every other static
in this framework.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LeafSpec(NamedTuple):
    key: str
    dtype: str
    shape: tuple
    offset: int      # bytes, aligned to the dtype's itemsize
    nbytes: int


class PackLayout(NamedTuple):
    leaves: tuple      # tuple[LeafSpec]
    total: int         # buffer bytes


def make_layout(tree: dict) -> PackLayout:
    """Static layout for a flat dict of numpy/jax arrays (no nesting).

    Leaves are ordered by descending itemsize so every offset is
    naturally aligned without padding; ties break by key for determinism.
    """
    items = sorted(
        ((k, np.asarray(v)) for k, v in tree.items()),
        key=lambda kv: (-kv[1].dtype.itemsize, kv[0]))
    leaves, off = [], 0
    for k, v in items:
        assert off % v.dtype.itemsize == 0, (k, off, v.dtype)
        leaves.append(LeafSpec(k, v.dtype.str, tuple(v.shape), off,
                               v.nbytes))
        off += v.nbytes
    return PackLayout(tuple(leaves), off)


def pack(tree: dict, layout: PackLayout) -> np.ndarray:
    """Host side: one uint8 buffer (a few memcpys; ~0.1 ms/MB)."""
    buf = np.empty((layout.total,), np.uint8)
    for sp in layout.leaves:
        a = np.ascontiguousarray(np.asarray(tree[sp.key]))
        buf[sp.offset:sp.offset + sp.nbytes] = a.view(np.uint8).ravel()
    return buf


def unpack(buf, layout: PackLayout) -> dict:
    """Device side (in-jit): static slices + bitcasts back to the tree."""
    out = {}
    for sp in layout.leaves:
        dt = np.dtype(sp.dtype)
        raw = jax.lax.slice(buf, (sp.offset,), (sp.offset + sp.nbytes,))
        if dt.itemsize == 1:
            arr = raw.view(dt) if hasattr(raw, "view") else raw
            arr = jax.lax.bitcast_convert_type(raw, dt)
        else:
            arr = jax.lax.bitcast_convert_type(
                raw.reshape(-1, dt.itemsize), dt)
        out[sp.key] = arr.reshape(sp.shape)
    return out
