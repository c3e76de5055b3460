"""On-device hat-batch planning: the host planner's grouping, inside jit.

WHY: the fresh training path is host->TPU TRANSFER-bound, not compute- or
host-CPU-bound (tools/probes/fresh_gap.py: device-resident distinct
batches run at the 26 ms/step broadcast ceiling, while shipping the
0.6 MB/batch hat payload costs ~48 ms/batch at the tunnel's effective
12-22 MB/s). Planning on device shrinks the per-batch payload to the
irreducible rays+rgb (~60 KB) and frees the host planner's ~5 ms/batch.

The planning primitives are cheap on TPU (tools/probes/device_plan_ops.py,
v5e): argsort of 65k keys 0.06 ms, 10k-query searchsorted ~1.1 ms,
histogram+cumsum ~1 ms — a full 4-level plan adds ~4-5 ms/step of device
work in place of ~45 ms/batch of transfer.

Mirrors ops/hat_interp.plan_hat_groups (2D (d, h) tiles) with identical
group semantics: stable tile-sort, per-tile chunks padded to group_size
with repeats of the tile's first point, per-(group, d-slice) site-row
segments over the code-sorted site table. Equivalence contract: the hat
render from a device plan equals the site-interp render at the same z
samples (tests/test_device_plan.py) — grouping is a partition of points,
so ANY valid plan renders identically after the de-sort.

Static shapes come from the same loader-derived hat_state as the host
planner (n_groups, rows_caps, seg_caps); overflow cannot raise inside jit,
so plans report a float overflow flag (0/1) that the trainer surfaces as
a stat — a nonzero value means the statics need more headroom.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DevicePlanSpec(NamedTuple):
    """Hashable static spec (lives in RenderSettings.hat_plan)."""
    out_sh: tuple         # full-res (D, H, W)
    site_caps: tuple      # 5 ints (index 1..4 used)
    group_size: int       # P
    tile: tuple           # (td, th) in level-1 cells (2D tiles only)
    n_groups: int         # static group count
    rows_caps: tuple      # per-level expansion widths (4)
    seg_caps: tuple       # per-level d-slice capacities (4)

    def level_sh(self, lvl):
        return tuple(s // (2 ** lvl) for s in self.out_sh)


def spec_from_state(hat_state, encoder_static, group_size=128,
                    tile=(4, 8)):
    """DevicePlanSpec from the loader-derived hat statics + EncoderStatic
    (the same handoff the host path uses for hat_rows_caps)."""
    return DevicePlanSpec(
        out_sh=tuple(encoder_static.out_sh),
        site_caps=tuple(encoder_static.site_caps),
        group_size=int(group_size), tile=tuple(tile[:2]),
        n_groups=int(hat_state["n_groups"]),
        rows_caps=tuple(hat_state["rows_caps"]),
        seg_caps=tuple(hat_state["seg_caps"]))


def _level_scale(out_sh, lvl):
    sh_l = np.array([s // (2 ** lvl) for s in out_sh], np.float64)
    return ((sh_l - 1.0) / np.asarray(out_sh, np.float64)).astype(
        np.float32)


def plan_hat_device(dhw, geom, spec: DevicePlanSpec):
    """Full-res voxel coords [N, 3] -> hat plan, all on device.

    geom: single-frame device geometry (sites{l} [capS, 3] code-sorted
    with huge-coord padding, nsite{l} scalars).

    Returns (perm [n_groups*P] i32, rows {l: [n_groups, capR_l] i32},
    overflow f32 scalar).
    """
    N = dhw.shape[0]
    P = spec.group_size
    td, th = spec.tile
    D1, H1, W1 = spec.level_sh(1)
    n_td = -(-D1 // td)
    n_th = -(-H1 // th)
    n_tiles = n_td * n_th

    s1 = jnp.asarray(_level_scale(spec.out_sh, 1))
    pos1 = dhw * s1
    dc = jnp.clip(jnp.floor(pos1[:, 0]).astype(jnp.int32), 0, D1 - 1)
    hc = jnp.clip(jnp.floor(pos1[:, 1]).astype(jnp.int32), 0, H1 - 1)
    tile_id = (dc // td) * n_th + hc // th                      # [N]

    # stable tile-sort (the host's np.argsort(kind="stable"))
    order = jnp.argsort(tile_id, stable=True).astype(jnp.int32)  # [N]

    h = jnp.zeros((n_tiles,), jnp.int32).at[tile_id].add(1)
    starts = jnp.cumsum(h) - h                                   # excl
    padded = -(-h // P) * P
    offs = jnp.cumsum(padded) - padded                           # excl
    total = offs[-1] + padded[-1]

    slots = jnp.arange(spec.n_groups * P, dtype=jnp.int32)
    # tile of each slot: dense compare (n_tiles is a few hundred)
    tile_of = (offs[None, :] <= slots[:, None]).sum(1) - 1       # [S]
    tile_of = jnp.clip(tile_of, 0, n_tiles - 1)
    rel = slots - offs[tile_of]
    src = jnp.where(rel < h[tile_of], rel, 0)
    valid = slots < total
    perm = jnp.where(valid, order[starts[tile_of] + src], 0)     # [S]

    grp_dhw = dhw[perm].reshape(spec.n_groups, P, 3)
    g_min = grp_dhw.min(axis=1)
    g_max = grp_dhw.max(axis=1)

    from .hat_interp import expand_segments

    rows = {}
    overflow = (total > spec.n_groups * P).astype(jnp.float32)
    for li, lvl in enumerate((1, 2, 3, 4)):
        sl = jnp.asarray(_level_scale(spec.out_sh, lvl))
        Dl, Hl, Wl = spec.level_sh(lvl)
        lo = jnp.floor(g_min * sl).astype(jnp.int32)
        hi = jnp.floor(g_max * sl).astype(jnp.int32) + 1
        d_lo = jnp.clip(lo[:, 0], 0, Dl - 1)
        d_hi = jnp.clip(hi[:, 0], 0, Dl - 1)
        h_lo = jnp.clip(lo[:, 1], 0, Hl - 1)
        h_hi = jnp.clip(hi[:, 1], 0, Hl - 1)

        nseg = spec.seg_caps[li]
        ds = d_lo[:, None] + jnp.arange(nseg, dtype=jnp.int32)[None, :]
        dvalid = ds <= d_hi[:, None]
        dsc = jnp.minimum(ds, d_hi[:, None])
        if f"rowcum{lvl}" in geom:
            # per-(d, h) slice offsets precomputed per frame
            # (build_frame_geometry): segment bounds are pure gathers
            rowcum = geom[f"rowcum{lvl}"]                   # [Dl*Hl + 1]
            seg_a = rowcum[dsc * Hl + h_lo[:, None]]
            seg_b = rowcum[dsc * Hl + h_hi[:, None] + 1]
        else:
            # fallback (pre-rowcum cached geometry): binary search over
            # the code-sorted site keys
            sites = geom[f"sites{lvl}"]                    # [capS, 3]
            ns = geom[f"nsite{lvl}"].astype(jnp.int32)
            # padded rows (coord 2^30 would overflow i32 keys) get an
            # explicit past-the-end sentinel so the table stays sorted
            sc = jnp.clip(sites, 0, max(Dl, Hl, Wl) - 1)
            key = (sc[:, 0] * Hl + sc[:, 1]) * Wl + sc[:, 2]
            key = jnp.where(jnp.arange(key.shape[0]) < ns, key,
                            jnp.int32(2 ** 30))
            q_lo = (dsc * Hl + h_lo[:, None]) * Wl          # [G, nseg]
            q_hi = (dsc * Hl + h_hi[:, None] + 1) * Wl
            seg_a = jnp.searchsorted(key, q_lo.ravel()).astype(
                jnp.int32).reshape(q_lo.shape)
            seg_b = jnp.searchsorted(key, q_hi.ravel()).astype(
                jnp.int32).reshape(q_hi.shape)
        lens = jnp.where(dvalid, seg_b - seg_a, 0)
        seg_cum = jnp.cumsum(lens, axis=1)

        overflow = jnp.maximum(
            overflow,
            (seg_cum[:, -1].max() > spec.rows_caps[li]).astype(jnp.float32))
        overflow = jnp.maximum(
            overflow,
            ((d_hi - d_lo + 1).max() > nseg).astype(jnp.float32))

        rows[lvl] = expand_segments(seg_a, seg_cum, spec.rows_caps[li],
                                    spec.site_caps[lvl])
    return perm, rows, overflow
