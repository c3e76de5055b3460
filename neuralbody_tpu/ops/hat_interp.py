"""Grouped hat-basis trilinear interpolation (the training hot path).

Replaces per-sample gather/scatter interpolation with MXU matmuls.

Trilinear interpolation with zeros padding is exactly an evaluation of the
hat (tent) basis anchored at the occupied cells:

    out[p] = sum_over_sites  prod_axis max(0, 1 - |pos(p) - coord(site)|)
             * feats[site]

because the product is nonzero only for the <=8 corner cells of p, where it
equals the trilinear weight, and absent (empty) cells contribute zero — the
reference's zeros-padded align_corners grid_sample semantics
(ref: lib/networks/latent_xyzc.py:62-72). See tests/test_hat_interp.py for
the equivalence contract against dense grid_sample.

TPU mapping (why this wins): XLA TPU gathers/scatters run at a few ns/row,
so the naive 8-corner interpolation costs ~35 ms/step at the reference
working point (profiled: 15 ms of index-volume lookups + 20 ms of backward
scatter-adds). Here the HOST groups ray samples by (d, h) cell and emits,
per (level, group), the explicit list of site rows whose hat support can
touch the group. The DEVICE then does one small row-gather per level plus a
batched [P, R] x [R, C] matmul per group — forward AND backward are matmuls
(the backward scatter shrinks to the per-group row lists, ~30x fewer bytes).

Host side (numpy, runs in the data loader): stratified z sampling, point
sorting, per-group row SEGMENTS (start + cumulative length over the
code-sorted site table — ~6-12x fewer host->TPU bytes than expanded
lists). Device side (JAX): segment expansion, the de-sort permutation
(scatter-min over hat_sort), and the hat contraction. Both sides are pure
functions of the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# host: planning (numpy; steady-state path dispatches to the C++ planner)
# ---------------------------------------------------------------------------

_NATIVE = None


def _native_ok():
    """The C++ planner builds lazily on first use; any failure (no g++,
    read-only checkout) permanently falls back to numpy. The fallback is a
    large host-side perf regression (~40 ms/batch vs ~3), so it warns once
    with the underlying exception rather than degrading invisibly."""
    global _NATIVE
    if _NATIVE is None:
        from . import hat_planner_native
        try:
            hat_planner_native._load()
            _NATIVE = True
        except Exception as e:  # noqa: BLE001 — any load failure degrades
            import warnings
            warnings.warn(
                f"native hat planner unavailable ({e!r}); falling back to "
                "the ~10x slower numpy planner for this process")
            _NATIVE = False
    return _NATIVE


def stratified_z_np(near, far, n_samples, rng=None):
    """Host-side stratified depth sampling, matching ops.ray_ops semantics.

    near/far: [R]. Returns z_vals [R, S] float32. rng=None -> midpoints
    (deterministic eval, perturb=0; ref run.py:50).
    """
    t = np.linspace(0.0, 1.0, n_samples, dtype=np.float32)
    z = near[:, None] * (1.0 - t) + far[:, None] * t
    if rng is not None:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = np.concatenate([mids, z[:, -1:]], axis=1)
        lower = np.concatenate([z[:, :1], mids], axis=1)
        z = lower + (upper - lower) * rng.uniform(
            size=z.shape).astype(np.float32)
    return z.astype(np.float32)


def _level_scale(out_sh, lvl):
    """(size_l - 1) / out_sh per axis — the reference normalization chain
    (divide by out_sh, NOT out_sh-1; latent_xyzc.py:49-60) composed with
    align_corners unnormalization at the level grid."""
    sh_l = np.array([s // (2 ** lvl) for s in out_sh], np.float64)
    return ((sh_l - 1.0) / np.asarray(out_sh, np.float64)).astype(np.float32)


def plan_hat_groups(dhw_pts, geom, out_sh, site_caps, group_size=128,
                    tile=(4, 8), rows_caps=None, n_groups=None,
                    seg_caps=None, levels=(1, 2, 3, 4)):
    """Bucket points into spatial tiles, chunk each tile into point groups,
    and build per-(level, group) site-row SEGMENTS.

    Tiles are fixed (d, h) rectangles of level-1 cells; groups never
    straddle a tile, so every group's row list is bounded by the tile
    footprint + 1-cell hat halo regardless of how ray samples cluster
    (count-only grouping lets sparse-region groups span the whole grid and
    blows up the static row caps ~6x).

    The row lists are emitted as (start, cumulative-length) segment pairs,
    NOT expanded index lists: each group's touched rows are contiguous runs
    of the code-sorted site table (one run per d-slice for 2D tiles, per
    (d, h) pair for 3D), so segments compress the dominant host->TPU
    payload ~6-12x; the device expands them back with a vectorized
    searchsorted (expand_segments). Expanded lists are recoverable with
    expand_segments_np (tests).

    Args:
      dhw_pts: [N, 3] float32 continuous full-res voxel coords of all ray
        samples (SMPL frame; see latent_xyzc.get_dhw_vox).
      geom: single-frame geometry dict (numpy; sites{l}, nsite{l}).
      out_sh: full-res grid shape (tuple of 3).
      site_caps: per-level static site capacities.
      group_size: points per group (P); tiles are padded to multiples of P
        with repeats of an in-tile point (never referenced after de-sort:
        first occurrence wins).
      tile: (d, h) or (d, h, w) tile extent in level-1 cells.
      rows_caps: per-level static TOTAL-row capacities (the device
        expansion width), or None to derive (max over groups, rounded to 32).
      n_groups: static group count (padded with inert groups), or None to
        use this batch's count.
      seg_caps: per-level static segment-count capacities, or None to
        derive (max over groups, rounded to 8).

    Returns dict:
      perm        [n_groups*P]       sorted-point -> original index
      seg_a{l}    [ngrp, segcap_l]   segment start rows (padding 0)
      seg_cum{l}  [ngrp, segcap_l]   inclusive cumulative segment lengths
                                     (padding repeats the group total)
      rows_caps, seg_caps, n_groups  the static sizes used
    """
    if (rows_caps is not None and n_groups is not None
            and seg_caps is not None and tuple(levels) == (1, 2, 3, 4)
            and _native_ok()):
        from .hat_planner_native import plan_hat_segments_native
        plan = plan_hat_segments_native(
            dhw_pts, geom, out_sh, site_caps, group_size, tile,
            rows_caps, seg_caps, n_groups)
        if plan is not None:
            return plan
        # overflow: fall through to numpy for the informative error

    N = dhw_pts.shape[0]
    P = group_size
    s1 = _level_scale(out_sh, 1)
    pos1 = dhw_pts * s1
    D1, H1, W1 = (s // 2 for s in out_sh)
    dc = np.clip(np.floor(pos1[:, 0]).astype(np.int64), 0, D1 - 1)
    hc = np.clip(np.floor(pos1[:, 1]).astype(np.int64), 0, H1 - 1)
    n_th = -(-H1 // tile[1])
    tile_id = (dc // tile[0]) * n_th + hc // tile[1]
    if len(tile) > 2:
        # 3D tiles: bucketing w too shrinks each group's site-row lists
        # from full-w (d, h) stripes to the local w window (the 2D lists
        # were 57-83% padding at the reference working point)
        wc = np.clip(np.floor(pos1[:, 2]).astype(np.int64), 0, W1 - 1)
        n_tw = -(-W1 // tile[2])
        tile_id = tile_id * n_tw + wc // tile[2]

    order = np.argsort(tile_id, kind="stable").astype(np.int32)
    tids = tile_id[order]
    starts = np.flatnonzero(np.r_[True, tids[1:] != tids[:-1]])
    counts = np.diff(np.r_[starts, len(tids)])
    # pad each tile's chunk to a multiple of P with repeats of its first
    # point (vectorized; a per-tile Python loop costs ~ms at 65k points)
    padded = -(-counts // P) * P
    total = int(padded.sum())
    pos = np.arange(total, dtype=np.int64)
    tile_of = np.repeat(np.arange(len(counts)), padded)
    rel = pos - np.repeat(np.cumsum(padded) - padded, padded)
    src = np.where(rel < counts[tile_of], rel, 0)
    perm = (order[starts[tile_of] + src].astype(np.int32) if total
            else np.zeros((0,), np.int32))
    used_groups = len(perm) // P
    if n_groups is None:
        n_groups = used_groups
    if used_groups > n_groups:
        raise ValueError(
            f"hat group overflow: batch needs {used_groups} groups but the "
            f"static count is {n_groups}; raise cfg.tpu.hat_static_margin")
    # inert padding groups: repeat point 0, zero-length segment lists
    perm = np.concatenate(
        [perm, np.zeros(((n_groups - used_groups) * P,), np.int32)])

    ngrp = n_groups
    sorted_dhw = dhw_pts[perm]                       # [ngrp*P, 3]
    grp_dhw = sorted_dhw.reshape(ngrp, P, 3)
    # per-group full-res extents ONCE; the per-level scale is positive per
    # axis, so min/max commute with it (a per-level [ngrp, P, 3] multiply +
    # reduce costs ~6 ms/level at the reference working point)
    g_min = grp_dhw.min(axis=1)                      # [ngrp, 3]
    g_max = grp_dhw.max(axis=1)

    out = {"perm": perm}
    used_caps, used_seg_caps = [], []
    for li, lvl in enumerate(levels):
        sl = _level_scale(out_sh, lvl)
        sh_l = tuple(s // (2 ** lvl) for s in out_sh)
        Dl, Hl, Wl = sh_l
        # touched corner cells per group: [floor(min), floor(max)+1]
        lo = np.floor(g_min * sl).astype(np.int64)            # [ngrp, 3]
        hi = np.floor(g_max * sl).astype(np.int64) + 1
        d_lo = np.clip(lo[:, 0], 0, Dl - 1)
        d_hi = np.clip(hi[:, 0], 0, Dl - 1)
        h_lo = np.clip(lo[:, 1], 0, Hl - 1)
        h_hi = np.clip(hi[:, 1], 0, Hl - 1)

        ns = int(geom[f"nsite{lvl}"])
        sites = geom[f"sites{lvl}"][:ns].astype(np.int64)     # sorted by code
        key = (sites[:, 0] * Hl + sites[:, 1]) * Wl + sites[:, 2]

        # per-group segments, fully vectorized: one searchsorted over all
        # slice bounds, then a flat "multi-arange" scatter into the padded
        # rows array (the previous per-group Python loop cost ~10 ms/batch/
        # level). 2D tiles -> one (d, h-range, all-w) segment per d-slice
        # (contiguous in the (d,h,w)-sorted site table); 3D tiles -> one
        # (d, h, w-range) segment per (d, h) pair.
        nd = int((d_hi - d_lo).max()) + 1 if ngrp else 1
        ds = d_lo[:, None] + np.arange(nd, dtype=np.int64)[None, :]
        dvalid = ds <= d_hi[:, None]
        dsc = np.minimum(ds, d_hi[:, None])
        if len(tile) > 2:
            w_lo = np.clip(lo[:, 2], 0, Wl - 1)
            w_hi = np.clip(hi[:, 2], 0, Wl - 1)
            nh = int((h_hi - h_lo).max()) + 1 if ngrp else 1
            hs = h_lo[:, None] + np.arange(nh, dtype=np.int64)[None, :]
            hvalid = hs <= h_hi[:, None]
            hsc = np.minimum(hs, h_hi[:, None])
            base = (dsc[:, :, None] * Hl + hsc[:, None, :]) * Wl
            q_lo = base + w_lo[:, None, None]
            q_hi = base + w_hi[:, None, None] + 1
            seg_valid = dvalid[:, :, None] & hvalid[:, None, :]
        else:
            q_lo = ((dsc * Hl + h_lo[:, None]) * Wl)[:, :, None]
            q_hi = ((dsc * Hl + h_hi[:, None] + 1) * Wl)[:, :, None]
            seg_valid = dvalid[:, :, None]
        nseg = q_lo.shape[1] * q_lo.shape[2]
        seg_a = np.searchsorted(key, q_lo.ravel()).reshape(ngrp, nseg)
        seg_b = np.searchsorted(key, q_hi.ravel()).reshape(ngrp, nseg)
        lens = np.where(seg_valid.reshape(ngrp, nseg), seg_b - seg_a, 0)
        gl = lens.sum(axis=1)

        need = int(gl.max()) if ngrp else 0
        cap = (rows_caps[li] if rows_caps is not None
               else max(64, -(-need // 32) * 32))
        if need > cap:
            raise ValueError(
                f"hat rows overflow at level {lvl}: group needs {need} rows "
                f"but cap is {cap}; raise cfg.tpu.hat_static_margin")
        used_caps.append(cap)

        # compact the per-group segment lists (drop empties, keep order)
        nz = lens > 0
        n_used = nz.sum(axis=1)
        seg_need = int(n_used.max()) if ngrp else 0
        scap = (seg_caps[li] if seg_caps is not None
                else max(4, -(-seg_need // 8) * 8))
        if seg_need > scap:
            raise ValueError(
                f"hat segs overflow at level {lvl}: group needs {seg_need} "
                f"segments but cap is {scap}; raise cfg.tpu.hat_static_margin")
        used_seg_caps.append(scap)
        sa = np.zeros((ngrp, scap), np.int32)
        sl = np.zeros((ngrp, scap), np.int64)
        g_idx, s_idx = np.nonzero(nz)
        pos_in_g = (np.cumsum(nz, axis=1) - 1)[g_idx, s_idx]
        sa[g_idx, pos_in_g] = seg_a[g_idx, s_idx].astype(np.int32)
        sl[g_idx, pos_in_g] = lens[g_idx, s_idx]
        out[f"seg_a{lvl}"] = sa
        out[f"seg_cum{lvl}"] = np.cumsum(sl, axis=1).astype(np.int32)
    out["rows_caps"] = tuple(used_caps)
    out["seg_caps"] = tuple(used_seg_caps)
    out["n_groups"] = n_groups
    return out


def expand_segments_np(seg_a, seg_cum, cap, sentinel):
    """Expand (start, cum-length) segments back to padded row lists.

    Numpy mirror of the device-side expand_segments; tests use it to state
    the segment encoding's contract (bit-equal to the pre-segment planner's
    expanded rows)."""
    seg_a = np.asarray(seg_a, np.int64)
    seg_cum = np.asarray(seg_cum, np.int64)
    ngrp, S = seg_a.shape
    j = np.arange(cap, dtype=np.int64)
    s = (seg_cum[:, None, :] <= j[None, :, None]).sum(-1)    # [ngrp, cap]
    sc = np.minimum(s, S - 1)
    prev = np.where(
        s > 0, np.take_along_axis(seg_cum, np.maximum(s - 1, 0), axis=1), 0)
    rows = np.take_along_axis(seg_a, sc, axis=1) + (j[None, :] - prev)
    valid = j[None, :] < seg_cum[:, -1:]
    return np.where(valid, rows, sentinel).astype(np.int32)


def prepare_hat_batch(batch, out_sh, site_caps, voxel_size, n_samples,
                      group_size=128, tile=(4, 8), rows_caps=None,
                      n_groups=None, seg_caps=None, rng=None,
                      quantize_z=False):
    """Augment a numpy batch with host-planned hat-interpolation fields.

    Adds (per batch element, stacked):
      z_vals   [B, R, S]        host-sampled depths (rng=None -> perturb off)
      hat_sort [B, ngrp*P]      sorted slot -> original sample index
                                (uint16 when R*S <= 65536)
      hat_seg_a{l}   [B, ngrp, segcap_l]  row-segment starts (uint16)
      hat_seg_cum{l} [B, ngrp, segcap_l]  inclusive cumulative lengths

    quantize_z=True ships z as uint16 slab fractions ("z_frac"; the
    device reconstructs near + (far-near) * q/65535) instead of f32
    z_vals — half the largest payload leaf (262 KB -> 131 KB/batch at the
    reference working point; the host->TPU link is the fresh-path
    bottleneck). The HOST plans with the DECODED values, so group
    assignment and row lists match the device's reconstructed points
    exactly. Quantization granularity is slab/65535 (~0.05 mm on ZJU
    bodies) — two orders below the 5 mm voxel, and pure sampling jitter
    under the stratified-perturb training regime.
    The device reconstructs everything else: sorted world points / view
    dirs from (ray_o, ray_d, z_vals, hat_sort), the expanded row lists
    from the segments (expand_segments), and the de-sort permutation from
    hat_sort (inverse_perm) — shipping those cost 3.8 MB (points) + 1.05 MB
    (expanded rows) + 0.26 MB (perm) per batch, and the host->TPU link is
    the production bottleneck (tools/probes/fresh_breakdown.py).

    Returns (batch, hat_static) where hat_static = {rows_caps, seg_caps,
    n_groups, group_size, tile} — the static sizes must be reused across
    steps for a single compile (same pattern as site_caps); rows_caps is
    also the device expansion width (RenderSettings.hat_rows_caps).
    """
    B, R = batch["ray_o"].shape[:2]
    vs = np.asarray(voxel_size, np.float32)
    rev = [2, 1, 0]
    sort_dt = np.uint16 if R * n_samples <= 65536 else np.int32

    zs, zqs, sorts, seg_acc = [], [], [], None
    for b in range(B):
        z = stratified_z_np(batch["near"][b], batch["far"][b], n_samples, rng)
        if quantize_z:
            near = batch["near"][b][:, None].astype(np.float32)
            far = batch["far"][b][:, None].astype(np.float32)
            slab = np.maximum(far - near, 1e-12)
            q = np.clip(np.rint((z - near) / slab * 65535.0),
                        0, 65535).astype(np.uint16)
            # decode exactly as the device will: plan with these values
            z = near + (far - near) * (
                q.astype(np.float32) * np.float32(1.0 / 65535.0))
            zqs.append(q)
        pts = (batch["ray_o"][b][:, None, :]
               + batch["ray_d"][b][:, None, :] * z[..., None])   # [R, S, 3]
        pts = pts.reshape(-1, 3)
        Rm = batch["R"][b]
        Th = batch["Th"][b].reshape(1, 3)
        ppts = (pts - Th) @ Rm
        dhw = (ppts[:, rev] - batch["bounds"][b][0][rev]) / vs

        geom_b = {k: v[b] for k, v in batch["geom"].items()}
        plan = plan_hat_groups(dhw, geom_b, out_sh, site_caps,
                               group_size=group_size, tile=tile,
                               rows_caps=rows_caps, n_groups=n_groups,
                               seg_caps=seg_caps)
        rows_caps = plan["rows_caps"]
        seg_caps = plan["seg_caps"]
        n_groups = plan["n_groups"]

        zs.append(z)
        sorts.append(plan["perm"].astype(sort_dt, copy=False))
        if seg_acc is None:
            seg_acc = {k: [] for k in plan if k.startswith("seg_")
                       and k != "seg_caps"}
        for k in seg_acc:
            # starts index the site table (< site_caps <= 65535); cums are
            # bounded by the total-rows cap
            seg_acc[k].append(plan[k].astype(np.uint16, copy=False)
                              if max(site_caps) <= 65535
                              and max(rows_caps) <= 65535
                              else plan[k])

    def _stack(xs):  # copy-free for the B=1 reference recipe
        return np.asarray(xs[0])[None] if len(xs) == 1 else np.stack(xs)

    batch = dict(batch)
    if quantize_z:
        batch["z_frac"] = _stack(zqs)
    else:
        batch["z_vals"] = _stack(zs).astype(np.float32, copy=False)
    batch["hat_sort"] = _stack(sorts)
    for k, v in seg_acc.items():
        batch[f"hat_{k}"] = _stack(v)
    hat_static = {"rows_caps": rows_caps, "seg_caps": seg_caps,
                  "n_groups": n_groups, "group_size": group_size,
                  "tile": tuple(tile)}
    return batch, hat_static


def decode_z_np(z_frac, near, far):
    """u16 slab fractions -> f32 depths (numpy mirror of the device
    decode in render_rays_hat; bit-identical to the planner's values)."""
    near = np.asarray(near, np.float32)[:, None]
    far = np.asarray(far, np.float32)[:, None]
    return near + (far - near) * (
        np.asarray(z_frac).astype(np.float32) * np.float32(1.0 / 65535.0))


def sorted_pts_np(batch, b, n_samples):
    """Host-side reconstruction of the sorted group points/dirs (what the
    device computes in render_rays_hat) — used by tests and probes."""
    z = (decode_z_np(batch["z_frac"][b], batch["near"][b], batch["far"][b])
         if "z_frac" in batch else batch["z_vals"][b])
    pts = (batch["ray_o"][b][:, None, :]
           + batch["ray_d"][b][:, None, :] * z[..., None]).reshape(-1, 3)
    srt = np.asarray(batch["hat_sort"][b]).astype(np.int64)
    ngrp = batch["hat_seg_a1"].shape[-2]
    P = srt.shape[0] // ngrp
    vd = batch["ray_d"][b] / np.maximum(
        np.linalg.norm(batch["ray_d"][b], axis=-1, keepdims=True), 1e-8)
    return (pts[srt].reshape(-1, P, 3),
            vd[srt // n_samples].reshape(-1, P, 3))


# ---------------------------------------------------------------------------
# device: the hat contraction (JAX)
# ---------------------------------------------------------------------------


def expand_segments(seg_a, seg_cum, cap, sentinel):
    """Expand compact (start, cum-length) row segments to [ngrp, cap] lists.

    seg_a/seg_cum: [ngrp, S] int32 (see plan_hat_groups). cap is the static
    expansion width (rows_caps[l]); slots past a group's total get the
    sentinel row (zero feature, far-away coord).

    S is tiny (<= ~32), so the segment of each output slot is found with a
    dense compare-and-select over the segment axis — [ngrp, cap, S] VPU
    compares, NO gathers. (The obvious searchsorted/take_along_axis
    formulation lowers to per-element scalar gathers on TPU and cost
    22 ms/step at the reference working point — 8x the whole contraction.)
    Bit-equal to the host expansion (expand_segments_np)."""
    ngrp, S = seg_a.shape
    j = jnp.arange(cap, dtype=seg_cum.dtype)
    prev = jnp.concatenate(
        [jnp.zeros_like(seg_cum[:, :1]), seg_cum[:, :-1]], axis=1)
    # slot j lies in segment k iff prev_k <= j < cum_k; segments are
    # disjoint half-open runs, so the masked sum selects exactly one
    in_seg = ((prev[:, None, :] <= j[None, :, None])
              & (j[None, :, None] < seg_cum[:, None, :]))  # [ngrp, cap, S]
    row_of = seg_a[:, None, :] + (j[None, :, None] - prev[:, None, :])
    rows = jnp.sum(jnp.where(in_seg, row_of, 0), axis=-1)
    return jnp.where(j[None, :] < seg_cum[:, -1:], rows, sentinel)


def inverse_perm(perm, n):
    """De-sort indices from the sort permutation: inv[i] = first slot j
    with perm[j] == i (padding slots repeat real points; first-occurrence
    matches the host planner's convention). One int scatter-min — cheaper
    than shipping the 256 KB/batch inverse from the host."""
    slots = perm.shape[0]
    return jnp.full((n,), slots, jnp.int32).at[perm].min(
        jnp.arange(slots, dtype=jnp.int32))


def hat_interp_level(feats, sites, rows, pos, use_pallas=False):
    """One level's interpolation for all groups.

    Args:
      feats: [capS, C] site features (padded rows zero). bf16 feats switch
        the contraction to single-pass bf16 MXU matmuls (f32 accumulation);
        f32 feats use Precision.HIGHEST for exact-parity contracts
        (tests/test_hat_interp.py).
      sites: [capS, 3] int site coords (padded rows hold a huge sentinel).
      rows:  [ngrp, capR] row lists (sentinel capS -> zero feature row and
             far-away coord -> hat weight exactly 0).
      pos:   [ngrp, P, 3] level-grid continuous positions.
      use_pallas: fuse the weight build + contraction in VMEM
        (ops/pallas_hat.py; TPU + bf16 only — f32/CPU keep the XLA path).

    Returns [ngrp, P, C] float32.
    """
    fpad = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
    spad = jnp.concatenate(
        [sites.astype(jnp.float32),
         jnp.full((1, 3), 1e9, jnp.float32)], axis=0)
    rf = fpad[rows]                                  # [ngrp, capR, C]
    rc = spad[rows]                                  # [ngrp, capR, 3]
    # NOTE (ADVICE r4): default_backend() is a trace-time proxy for the
    # lowering target — jitting to an explicit non-default CPU device
    # while a TPU is default would wrongly take the Pallas branch. Known
    # limitation, accepted: use_pallas defaults to False and is only
    # enabled by the TPU bench/train path, which always lowers to the
    # default backend.
    if (use_pallas and feats.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"):
        from .pallas_hat import hat_contract_fused
        return hat_contract_fused(rf, rc, pos)
    diff = jnp.abs(pos[:, :, None, :] - rc[:, None, :, :])
    hat = jnp.prod(jnp.maximum(0.0, 1.0 - diff), axis=-1)   # [ngrp, P, capR]
    if feats.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            hat.astype(jnp.bfloat16), rf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    # f32-accurate contraction (hat weights are exact trilinear weights)
    return jax.lax.dot_general(
        hat, rf, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)


def hat_interpolate(site_feats, geom, rows, dhw_grouped, static):
    """Multi-scale feature interpolation via grouped hat matmuls.

    Args:
      site_feats: list of per-level site features [capS_l, C_l] (levels 1-4).
      geom: single-element frame geometry (sites{l} tables on device).
      rows: dict {lvl: [ngrp, capR_l]} row lists.
      dhw_grouped: [ngrp, P, 3] full-res voxel coords in sorted group order.
      static: ModelStatic (for out_sh).

    Returns [ngrp, P, 352].
    """
    outs = []
    out_sh = jnp.asarray(static.out_sh, jnp.float32)
    use_pallas = bool(getattr(static.encoder, "use_pallas", False))
    for lvl, feats in zip((1, 2, 3, 4), site_feats):
        sh_l = jnp.asarray(
            [s // (2 ** lvl) for s in static.out_sh], jnp.float32)
        pos = dhw_grouped * ((sh_l - 1.0) / out_sh)
        outs.append(
            hat_interp_level(feats, geom[f"sites{lvl}"], rows[lvl], pos,
                             use_pallas=use_pallas))
    return jnp.concatenate(outs, axis=-1)
