"""TPU-native sparse 3D convolution engine.

Replaces the reference's spconv 1.2.1 C++/CUDA dependency (ref:
lib/networks/latent_xyzc.py:2,36-37,208-274) with a design that maps onto the
TPU MXU:

  host  (numpy, cacheable per frame): "rulebook" construction — active-site
        lists per resolution level and gather index tables for submanifold
        and strided convolutions (the analog of spconv's rulebook builder).
  device (JAX/XLA): static-shape gather -> [S, 27*Cin] @ [27*Cin, Cout]
        matmul -> masked batch-norm -> relu, plus scatter into dense volumes
        at the `.dense()` materialization points.

Semantics parity with spconv:
  * SubMConv3d(k=3, bias=False): outputs only at input active sites; halo
    contributions killed (we never create them).
  * SparseConv3d(k=3, s=2, p=1, bias=False): output sites are all sites
    receiving at least one active input tap; with bias=False this equals a
    dense strided conv on the zero-filled grid.
  * BatchNorm1d over the active-site list, not the dense grid (ref:
    latent_xyzc.py:215).
  * .dense(): zero-filled scatter (duplicate input vertices are sum-combined
    at voxelization; see voxelize_vertices).

All index tables are padded to static capacities so XLA compiles once per
sequence.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

# 27 kernel taps in (kd, kh, kw) lexicographic order; tap k touches input
# coordinate  p + k - 1  (submanifold)  or  2p + k - 1  (stride-2, pad 1).
KERNEL_OFFSETS = np.array(
    list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.int32
)  # [27, 3]


# ---------------------------------------------------------------------------
# Host-side rulebook construction (numpy, vectorized)
# ---------------------------------------------------------------------------

def _hash_coords(coords: np.ndarray, sh) -> np.ndarray:
    return (coords[..., 0].astype(np.int64) * sh[1] + coords[..., 1]) * sh[2] \
        + coords[..., 2]


class _SiteLookup:
    """coord -> site-row index map via sorted linearized codes."""

    def __init__(self, sites: np.ndarray, sh):
        self.sh = np.asarray(sh, dtype=np.int64)
        codes = _hash_coords(sites, sh)
        self.order = np.argsort(codes)
        self.sorted_codes = codes[self.order]

    def __call__(self, query: np.ndarray) -> np.ndarray:
        """query: [..., 3] int coords -> row index into sites, or -1."""
        inb = np.all((query >= 0) & (query < self.sh), axis=-1)
        qc = _hash_coords(np.clip(query, 0, None), self.sh)
        pos = np.searchsorted(self.sorted_codes, qc)
        pos_c = np.minimum(pos, len(self.sorted_codes) - 1)
        found = inb & (self.sorted_codes[pos_c] == qc)
        return np.where(found, self.order[pos_c], -1).astype(np.int32)


def dedup_sites(coords: np.ndarray, sh) -> tuple[np.ndarray, np.ndarray]:
    """Unique voxel coords (sorted by linear code) + inverse map per input."""
    codes = _hash_coords(coords, sh)
    _, first, inverse = np.unique(codes, return_index=True, return_inverse=True)
    return coords[first].astype(np.int32), inverse.astype(np.int32)


def subm_table(sites: np.ndarray, lookup: _SiteLookup) -> np.ndarray:
    """[S, 27] gather table for a submanifold 3x3x3 conv (identity site set)."""
    query = sites[:, None, :] + KERNEL_OFFSETS[None]          # [S, 27, 3]
    return lookup(query)


def downsample_sites(sites: np.ndarray, sh) -> np.ndarray:
    """Output active sites of SparseConv3d(k=3, s=2, p=1) on `sites`.

    Input coord c feeds output p iff 2p = c + 1 - k for some k in {0,1,2}
    per dim, i.e. p in {(c-1)/2, c/2, (c+1)/2} ∩ Z, clipped to [0, sh/2).
    """
    out_sh = np.asarray(sh, dtype=np.int64) // 2
    cands = []
    for off in itertools.product((-1, 0, 1), repeat=3):
        c = sites + np.array(off, dtype=np.int32)
        ok = np.all(c % 2 == 0, axis=-1)
        p = c[ok] // 2
        p = p[np.all((p >= 0) & (p < out_sh), axis=-1)]
        cands.append(p)
    cands = np.concatenate(cands, axis=0)
    if len(cands) == 0:
        return np.zeros((0, 3), np.int32)
    out, _ = dedup_sites(cands, out_sh)
    return out


def down_table(out_sites: np.ndarray, in_lookup: _SiteLookup) -> np.ndarray:
    """[S_out, 27] gather table into the input level for the strided conv."""
    query = 2 * out_sites[:, None, :] + KERNEL_OFFSETS[None]
    return in_lookup(query)


def up_table(in_sites: np.ndarray, out_lookup: _SiteLookup) -> np.ndarray:
    """[S_in, 27] transpose table for the strided conv's backward.

    Entry (q, k) is the output site p with 2p + off_k = q (or -1): the
    gradient w.r.t. input site q gathers cotangents from these output rows,
    turning the backward scatter into a gather (TPU scatters with colliding
    indices serialize; gathers don't).
    """
    num = in_sites[:, None, :] - KERNEL_OFFSETS[None]      # [S, 27, 3]
    even = np.all(num % 2 == 0, axis=-1)
    p = num // 2
    idx = out_lookup(p)
    return np.where(even, idx, -1).astype(np.int32)


def xtri_aug_tables(nbr: np.ndarray, cap: int, fix_cap: int) -> dict:
    """w-triple packing tables from a [S, 27] subm table (-1 = missing).

    The packed conv gathers ONE row per (dd, dh) column instead of three:
    xtri[q] = [x[w-left(q)] | x[q] | x[w-right(q)]]. Columns whose center
    (dd, dh, 0) neighbor is missing but a (dd, dh, +-1) neighbor exists
    read an AUGMENTED row [x[augl] | 0 | x[augr]] appended to the xtri
    table — fixups ride the same gather, no scatter.

    Why this shape: TPU gather cost is max(rows * 3.2 ns, bytes / 58 GB/s)
    (tools/probes/gather_rate.py), so halving rows only pays when bytes
    drop too — pair with bf16 activations.

    Returns (sentinels noted):
      lnbr/rnbr [cap]    w-neighbor rows (cap = zero row of xpad)
      nbr9 [9, cap]      xtri-row index per column (cap+fix_cap = zero row)
      augl/augr [fix_cap] aug-row sources (cap = zero row of xpad)
      n_aug []           actual aug rows used
    """
    S = nbr.shape[0]
    lnbr = np.where(nbr[:, 12] < 0, cap, nbr[:, 12]).astype(np.int32)
    rnbr = np.where(nbr[:, 14] < 0, cap, nbr[:, 14]).astype(np.int32)

    sent9 = cap + fix_cap
    nbr9 = np.full((9, cap), sent9, np.int32)
    augl = np.full((fix_cap,), cap, np.int32)
    augr = np.full((fix_cap,), cap, np.int32)
    n_aug = 0
    for t in range(9):
        center = nbr[:, t * 3 + 1]
        left = nbr[:, t * 3]
        right = nbr[:, t * 3 + 2]
        col = np.where(center < 0, sent9, center).astype(np.int32)
        fix = (center < 0) & ((left >= 0) | (right >= 0))
        idx = np.flatnonzero(fix)
        if len(idx):
            if n_aug + len(idx) > fix_cap:
                raise ValueError(
                    f"xtri aug overflow: needs >{fix_cap} rows; raise "
                    f"the sequence fix caps (compute_fix_caps)")
            rows = cap + n_aug + np.arange(len(idx), dtype=np.int32)
            col[idx] = rows
            augl[n_aug:n_aug + len(idx)] = np.where(
                left[idx] < 0, cap, left[idx])
            augr[n_aug:n_aug + len(idx)] = np.where(
                right[idx] < 0, cap, right[idx])
            n_aug += len(idx)
        nbr9[t, :S] = col
    return {"lnbr": _pad_rows(lnbr, cap, cap), "rnbr": _pad_rows(rnbr, cap, cap),
            "nbr9": nbr9, "augl": augl, "augr": augr,
            "n_aug": np.int32(n_aug)}


def compute_fix_caps(frames_coords, out_sh, site_caps,
                     round_to: int = 64) -> list[int]:
    """Max per-level xtri aug-row counts over frames (static capacities)."""
    out_sh = np.asarray(out_sh, dtype=np.int64)
    caps = [0] * 5
    for coords in frames_coords:
        sites, _ = dedup_sites(coords.astype(np.int32), out_sh)
        sh = out_sh.copy()
        for lvl in range(5):
            nbr = subm_table(sites, _SiteLookup(sites, sh))
            center = nbr[:, 1::3]
            side = (nbr[:, 0::3] >= 0) | (nbr[:, 2::3] >= 0)
            caps[lvl] = max(caps[lvl], int(((center < 0) & side).sum()))
            if lvl < 4:
                sites = downsample_sites(sites, sh)
                sh = sh // 2
    return [max(round_to, -(-c // round_to) * round_to) for c in caps]


def _pad_rows(a: np.ndarray, cap: int, fill) -> np.ndarray:
    if len(a) > cap:
        raise ValueError(
            f"site count {len(a)} exceeds static capacity {cap}; raise "
            f"tpu.site_caps for this sequence"
        )
    pad = np.full((cap - len(a),) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def measure_site_counts(vertex_coords: np.ndarray, out_sh) -> list[int]:
    """Actual per-level active-site counts for one frame (for cap sizing)."""
    out_sh = np.asarray(out_sh, dtype=np.int64)
    sites, _ = dedup_sites(vertex_coords.astype(np.int32), out_sh)
    counts = []
    sh = out_sh.copy()
    for lvl in range(5):
        counts.append(len(sites))
        if lvl < 4:
            sites = downsample_sites(sites, sh)
            sh = sh // 2
    return counts


def compute_site_caps(frames_coords, out_sh, round_to: int = 256) -> list[int]:
    """Max per-level site counts over frames, rounded up (static capacities)."""
    caps = [0] * 5
    for coords in frames_coords:
        for l, c in enumerate(measure_site_counts(coords, out_sh)):
            caps[l] = max(caps[l], c)
    return [max(round_to, -(-c // round_to) * round_to) for c in caps]


def build_frame_geometry(vertex_coords: np.ndarray, out_sh, site_caps,
                         fix_caps=None):
    """Build all static-shape index tables for one frame.

    Args:
      vertex_coords: [nv, 3] int voxel coords (dhw) of the SMPL vertices
        (ref voxelization: lib/datasets/light_stage/multi_view_dataset.py:107-111).
      out_sh: static full-resolution grid shape (dhw), multiple of 32.
      site_caps: list of 5 static per-level site capacities.

    Returns:
      dict of int32 numpy arrays (a pytree ready for device transfer):
        vert_idx   [nv]        vertex -> level-0 site row
        sites{l}   [S_l, 3]    l in 1..4 (scatter targets for .dense())
        nbr{l}     [27, S_l]   submanifold gather tables (tap-major)
        down{l}    [27, S_{l+1}] strided-conv gather tables, l in 0..3
        up{l}      [27, S_l]   transpose tables for the strided backward
        nsite{l}   []          actual site count per level
      Missing/padded gather entries point at row S_l (a zero row appended on
      device); padded scatter coords are out-of-bounds for scatter-drop.
    """
    out_sh = np.asarray(out_sh, dtype=np.int64)
    geom = {}

    sites, inverse = dedup_sites(vertex_coords.astype(np.int32), out_sh)
    level_sites = []
    sh = out_sh.copy()
    for lvl in range(5):
        cap = site_caps[lvl]
        lookup = _SiteLookup(sites, sh)
        if lvl == 0:
            geom["vert_idx"] = np.where(
                inverse >= 0, inverse, cap
            ).astype(np.int32)
        nbr_raw = subm_table(sites, lookup)          # [S, 27], -1 missing
        # w-triple packed tables for the xtri subm conv (the production
        # path); fix_caps=None sizes the aug block exactly for this frame
        if fix_caps is None:
            center = nbr_raw[:, 1::3]
            side = (nbr_raw[:, 0::3] >= 0) | (nbr_raw[:, 2::3] >= 0)
            fcap = max(64, -(-int(((center < 0) & side).sum()) // 64) * 64)
        else:
            fcap = fix_caps[lvl]
        for n, v in xtri_aug_tables(nbr_raw, cap, fcap).items():
            geom[f"x{n}{lvl}"] = v
        nbr = np.where(nbr_raw < 0, cap, nbr_raw)
        # device tables are TAP-MAJOR [27, S] (see gather_taps)
        geom[f"nbr{lvl}"] = np.ascontiguousarray(_pad_rows(nbr, cap, cap).T)
        geom[f"nsite{lvl}"] = np.int32(len(sites))
        # scatter coords for .dense(); sentinel = out-of-bounds row
        geom[f"sites{lvl}"] = _pad_rows(
            sites, cap, np.int32(2 ** 30)
        )
        if lvl >= 1:
            # host-built int32 site-index volume (device scatter of the
            # same thing serializes and costs ~25 ms/step on TPU)
            ivol = np.full(tuple(sh), cap, np.int32)
            ivol[sites[:, 0], sites[:, 1], sites[:, 2]] = np.arange(
                len(sites), dtype=np.int32)
            geom[f"ivol{lvl}"] = ivol
            # per-(d, h) slice row offsets into the code-sorted site
            # table: rowcum[d*H + h] = #sites in slices before (d, h) ==
            # searchsorted(keys, (d*H + h)*W). Turns the device planner's
            # per-level segment searchsorted into pure gathers
            # (ops/device_plan.py). [D*H + 1] i32, ~100 KB/frame total.
            Dl, Hl = int(sh[0]), int(sh[1])
            cnt = np.bincount(sites[:, 0].astype(np.int64) * Hl
                              + sites[:, 1], minlength=Dl * Hl)
            geom[f"rowcum{lvl}"] = np.concatenate(
                [[0], np.cumsum(cnt)]).astype(np.int32)
        level_sites.append(sites)

        if lvl < 4:
            nxt = downsample_sites(sites, sh)
            dtab = down_table(nxt, lookup)
            dtab = np.where(dtab < 0, cap, dtab)
            geom[f"down{lvl}"] = np.ascontiguousarray(
                _pad_rows(dtab, site_caps[lvl + 1], cap).T)
            # transpose (up) table for the scatter-free backward
            out_lookup = _SiteLookup(nxt, sh // 2)
            utab = up_table(sites, out_lookup)
            cap_out = site_caps[lvl + 1]
            utab = np.where(utab < 0, cap_out, utab)
            geom[f"up{lvl}"] = np.ascontiguousarray(
                _pad_rows(utab, cap, cap_out).T)
            sites = nxt
            sh = sh // 2

    return geom


# ---------------------------------------------------------------------------
# Device-side compute (JAX)
# ---------------------------------------------------------------------------

def site_mask(nsite, cap, dtype=jnp.float32):
    """[cap] validity mask from an actual site count."""
    return (jnp.arange(cap) < nsite).astype(dtype)


def scatter_vertex_codes(codes, vert_idx, cap):
    """Sum per-vertex codes into their level-0 site rows.

    codes: [nv, C]; vert_idx: [nv] or [B, nv] (rows in [0, cap], cap =
    dump row). Duplicate-voxel vertices are sum-combined so every vertex
    code receives gradient (the reference feeds duplicates to spconv
    unspecified; sum is the principled TPU-native choice). Batched
    indices flatten to one scatter (batched scatters hit slow TPU paths,
    like batched gathers)."""
    C = codes.shape[-1]
    if vert_idx.ndim == 1:
        out = jnp.zeros((cap + 1, C), codes.dtype)
        out = out.at[vert_idx].add(codes)
        return out[:cap]
    B, nv = vert_idx.shape
    offs = (jnp.arange(B, dtype=vert_idx.dtype) * (cap + 1))[:, None]
    flat_idx = (vert_idx + offs).reshape(-1)
    out = jnp.zeros((B * (cap + 1), C), codes.dtype)
    out = out.at[flat_idx].add(jnp.broadcast_to(codes, (B, nv, C))
                               .reshape(B * nv, C))
    return out.reshape(B, cap + 1, C)[:, :cap]


def gather_taps(feats, table):
    """feats [S, C] or [B, S, C] (+ implicit zero row per batch) gathered
    by TAP-MAJOR table [27, S_out] / [B, 27, S_out].

    Returns [27, S_out, C] / [B, 27, S_out, C]. Index S (== len(feats))
    reads the zero row. Tap-major layout matters: the gather output then
    feeds a batched matmul directly, whereas site-major [S_out, 27, C]
    forces an XLA relayout copy before the contraction (~1.8x slower per
    conv layer on a v5e; tools/probes/conv_formulations).

    Batched inputs are FLATTENED to one 2D row gather with per-batch row
    offsets: a vmapped gather lowers to operand_batching_dims, which
    misses the TPU fast row-gather path (measured ~2.5x slower in situ).
    """
    if feats.ndim == 2:
        fpad = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
        return fpad[table]
    B, S, C = feats.shape
    fpad = jnp.concatenate(
        [feats, jnp.zeros((B, 1, C), feats.dtype)], axis=1)
    flat = fpad.reshape(B * (S + 1), C)
    offs = (jnp.arange(B, dtype=table.dtype) * (S + 1)).reshape(B, 1, 1)
    return flat[table + offs]                           # [B, 27, S', C]


def _mxu_operand(x):
    """bf16 stays bf16 on TPU (MXU-native, f32 accumulation via
    preferred_element_type); the CPU backend lacks BF16xBF16=F32 dots, so
    tests upcast — numerically identical (bf16 products are exact in f32).
    """
    if x.dtype == jnp.bfloat16 and jax.default_backend() != "tpu":
        return x.astype(jnp.float32)
    return x


def sparse_conv_matmul(gathered, w):
    """[(B,) 27, S, Cin] x [27, Cin, Cout] -> [(B,) S, Cout] on the MXU.

    Batched matmul over the tap axis, then a tap-sum — the layout-friendly
    contraction for TPU (see gather_taps).
    """
    w = w.astype(gathered.dtype)  # bf16 multiply, f32 accumulate
    gathered = _mxu_operand(gathered)
    w = _mxu_operand(w)
    if gathered.ndim == 3:
        per_tap = jax.lax.dot_general(
            gathered, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                               # [27, S, Cout]
        return jnp.sum(per_tap, axis=0)
    per_tap = jnp.einsum("bksc,kcd->bksd", gathered, w,
                         preferred_element_type=jnp.float32)
    return jnp.sum(per_tap, axis=1)


# -- scatter-free conv primitives (custom VJP) ------------------------------
#
# Autodiff of gather_taps produces scatter-adds with colliding indices,
# which XLA serializes on TPU. These custom VJPs express every backward as
# gathers of the COTANGENT only — the input x is never re-gathered:
#   subm:  dL/dx = conv(g) with the kernel tap-flipped and transposed
#          (off_{26-k} = -off_k under the lexicographic enumeration).
#          dL/dW via the transpose identity
#            dW[k] = sum_s gy[s] x[nbr[s,k]]^T = sum_q x[q] gy[nbr[q,26-k]]^T
#          (nbr[s,k] = q  <=>  nbr[q,26-k] = s on the shared site set), so
#          the gy gather computed for dx is reused and x needs no gather.
#   down:  dL/dx gathers output cotangents through the host-built up-table;
#          dW[k] = sum_q x[q] gy[up[q,k]]^T reuses that same gather
#          (down_tbl[s,k] = q  <=>  up_tbl[q,k] = s).
# Profiling: each avoided re-gather costs 0.2-1.4 ms on a v5e at the
# reference working point; this halves the backward's gather traffic.

@jax.custom_vjp
def subm_conv(x, w, nbr):
    """Submanifold conv: x [(B,) S, Cin], w [27, Cin, Cout],
    nbr [(B,) 27, S]."""
    return sparse_conv_matmul(gather_taps(x, nbr), w)


def _subm_fwd(x, w, nbr):
    return subm_conv(x, w, nbr), (x, w, nbr)


def _subm_bwd(res, gy):
    x, w, nbr = res
    gyg = gather_taps(gy.astype(x.dtype), nbr)          # [(B,) 27, S, Cout]
    w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)       # [27, Cout, Cin]
    dx = sparse_conv_matmul(gyg, w_t).astype(x.dtype)
    # dW needs the tap-flipped gathered cotangents (tap k of the flipped
    # tensor is gy[nbr[26-k]], the site one off_k step away); flipping the
    # small [27, Cin, Cout] RESULT instead of the big gather avoids a copy.
    xo, go = _mxu_operand(x), _mxu_operand(gyg)
    if x.ndim == 2:
        dw = jnp.flip(jnp.einsum("sc,ksd->kcd", xo, go,
                                 preferred_element_type=jnp.float32), axis=0)
    else:
        dw = jnp.flip(jnp.einsum("bsc,bksd->kcd", xo, go,
                                 preferred_element_type=jnp.float32), axis=0)
    return dx, dw.astype(w.dtype), None


subm_conv.defvjp(_subm_fwd, _subm_bwd)


# -- w-triple packed submanifold conv ---------------------------------------
#
# Gathers ONE 3C-wide row per (dd, dh) column instead of three C-wide rows
# (tables from xtri_aug_tables): 11*S + 2*F rows per conv instead of 27*S.
# TPU gathers cost max(rows * 3.2 ns, bytes / 58 GB/s) — the row-term win
# here composes with bf16's bytes-term win (tools/probes/gather_rate.py).
# Backward is scatter-free: both dx and dW reuse ONE packed gather of the
# cotangent (same tables; the tap-flip identity off_{26-k} = -off_k maps
# onto the packed layout as a reshape + flip).


def _batch_rows(table, n_rows):
    """Add per-batch row offsets for flattened batched gathers."""
    B = table.shape[0]
    offs = jnp.arange(B, dtype=table.dtype) * n_rows
    return table + offs.reshape((B,) + (1,) * (table.ndim - 1))


def xtri_gather(x, lnbr, rnbr, nbr9, augl, augr):
    """Packed neighborhood gather.

    x [(B,) cap, C]; lnbr/rnbr [(B,) cap]; nbr9 [(B,) 9, cap];
    augl/augr [(B,) F]. Returns [(B,) 9, cap, 3C] where slot j of column t
    holds x at offset (dd_t, dh_t, j-1) — fixup rows included.
    """
    if x.ndim == 2:
        cap, C = x.shape
        xpad = jnp.concatenate([x, jnp.zeros((1, C), x.dtype)])
        base = jnp.concatenate([xpad[lnbr], x, xpad[rnbr]], axis=-1)
        al = xpad[augl]
        aug = jnp.concatenate([al, jnp.zeros_like(al), xpad[augr]], axis=-1)
        tri = jnp.concatenate(
            [base, aug, jnp.zeros((1, 3 * C), x.dtype)], axis=0)
        return tri[nbr9]
    B, cap, C = x.shape
    xpad = jnp.concatenate([x, jnp.zeros((B, 1, C), x.dtype)], axis=1)
    flat = xpad.reshape(B * (cap + 1), C)
    xl = flat[_batch_rows(lnbr, cap + 1)]
    xr = flat[_batch_rows(rnbr, cap + 1)]
    base = jnp.concatenate([xl, x, xr], axis=-1)          # [B, cap, 3C]
    al = flat[_batch_rows(augl, cap + 1)]
    ar = flat[_batch_rows(augr, cap + 1)]
    aug = jnp.concatenate([al, jnp.zeros_like(al), ar], axis=-1)
    F = augl.shape[-1]
    tri = jnp.concatenate(
        [base, aug, jnp.zeros((B, 1, 3 * C), x.dtype)], axis=1)
    tri_flat = tri.reshape(B * (cap + F + 1), 3 * C)
    return tri_flat[_batch_rows(nbr9, cap + F + 1)]       # [B, 9, cap, 3C]


def xtri_matmul(g9, w):
    """[(B,) 9, S, 3Cin] x w [27, Cin, Cout] -> [(B,) S, Cout].

    w reshaped to [9, 3Cin, Cout] matches the packed slot order (taps are
    (dd, dh, dw) lexicographic with dw fastest, KERNEL_OFFSETS)."""
    cin, cout = w.shape[1], w.shape[2]
    w9 = _mxu_operand(w.reshape(9, 3 * cin, cout).astype(g9.dtype))
    g9 = _mxu_operand(g9)
    if g9.ndim == 3:
        per = jax.lax.dot_general(
            g9, w9, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(per, axis=0)
    per = jnp.einsum("bkse,ked->bksd", g9, w9,
                     preferred_element_type=jnp.float32)
    return jnp.sum(per, axis=1)


@jax.custom_vjp
def subm_conv_xtri(x, w, lnbr, rnbr, nbr9, augl, augr):
    """Packed submanifold conv: x [(B,) cap, Cin] -> [(B,) cap, Cout]."""
    return xtri_matmul(xtri_gather(x, lnbr, rnbr, nbr9, augl, augr), w)


def _subm_xtri_fwd(x, w, lnbr, rnbr, nbr9, augl, augr):
    return (subm_conv_xtri(x, w, lnbr, rnbr, nbr9, augl, augr),
            (x, w, lnbr, rnbr, nbr9, augl, augr))


def _subm_xtri_bwd(res, gy):
    x, w, lnbr, rnbr, nbr9, augl, augr = res
    gy = gy.astype(x.dtype)
    gyg9 = xtri_gather(gy, lnbr, rnbr, nbr9, augl, augr)
    w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)          # [27, Cout, Cin]
    dx = xtri_matmul(gyg9, w_t).astype(x.dtype)
    cin, cout = w.shape[1], w.shape[2]
    xo, go = _mxu_operand(x), _mxu_operand(gyg9)
    if x.ndim == 2:
        d = jnp.einsum("sc,kse->kce", xo, go,
                       preferred_element_type=jnp.float32)
    else:
        d = jnp.einsum("bsc,bkse->kce", xo, go,
                       preferred_element_type=jnp.float32)
    d27 = d.reshape(9, cin, 3, cout).transpose(0, 2, 1, 3) \
           .reshape(27, cin, cout)
    dw = jnp.flip(d27, axis=0).astype(w.dtype)
    return dx, dw, None, None, None, None, None


subm_conv_xtri.defvjp(_subm_xtri_fwd, _subm_xtri_bwd)


@jax.custom_vjp
def down_conv(x, w, down_tbl, up_tbl):
    """Stride-2 conv: x [S_in, Cin] -> [S_out, Cout]; tables [27, S_*]."""
    return sparse_conv_matmul(gather_taps(x, down_tbl), w)


def _down_fwd(x, w, down_tbl, up_tbl):
    return down_conv(x, w, down_tbl, up_tbl), (x, w, down_tbl, up_tbl)


def _down_bwd(res, gy):
    x, w, down_tbl, up_tbl = res
    gup = gather_taps(gy.astype(x.dtype), up_tbl)       # [(B,) 27, S_in, Cout]
    w_t = w.transpose(0, 2, 1)                          # [27, Cout, Cin]
    dx = sparse_conv_matmul(gup, w_t).astype(x.dtype)
    xo, go = _mxu_operand(x), _mxu_operand(gup)
    if x.ndim == 2:
        dw = jnp.einsum("sc,ksd->kcd", xo, go,
                        preferred_element_type=jnp.float32)
    else:
        dw = jnp.einsum("bsc,bksd->kcd", xo, go,
                        preferred_element_type=jnp.float32)
    return dx, dw.astype(w.dtype), None, None


down_conv.defvjp(_down_fwd, _down_bwd)


def masked_batch_norm(x, mask, scale, bias, eps=1e-3):
    """BatchNorm over active sites only (ref: latent_xyzc.py:215).

    x: [..., S, C]; mask: [..., S]. Statistics are over all leading dims and
    S, weighted by mask — matches torch BatchNorm1d over the concatenated
    active-site list of the whole batch. Returns normalized x (zeroed at
    padded rows) plus batch (mean, var) for running-stat updates, where the
    returned var is UNBIASED (n/(n-1)) to match what torch BatchNorm1d
    stores in running_var — normalization itself uses the biased var.
    """
    m = mask[..., None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / n
    var = jnp.sum(((x - mean) ** 2) * m, axis=tuple(range(x.ndim - 1))) / n
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y * m, (mean, var * (n / jnp.maximum(n - 1.0, 1.0)))


def scatter_dense(feats, sites, out_sh_lvl):
    """Site features -> zero-filled dense volume [D, H, W, C] (.dense()).

    Padded rows carry out-of-bounds coords and are dropped by the scatter.
    """
    C = feats.shape[-1]
    vol = jnp.zeros((*out_sh_lvl, C), feats.dtype)
    return vol.at[sites[:, 0], sites[:, 1], sites[:, 2]].add(
        feats, mode="drop"
    )


def scatter_index_volume(sites, out_sh_lvl, cap):
    """Site coords -> dense int32 volume of site-row indices.

    Empty voxels hold `cap` (the zero row of a [cap+1, C] padded feature
    table). Rebuilding this per step is one small int scatter; it carries no
    gradient — the key to the memory-light interpolation path (site features
    never materialize as dense float volumes during training).
    """
    vol = jnp.full(out_sh_lvl, cap, jnp.int32)
    rows = jnp.arange(sites.shape[0], dtype=jnp.int32)
    return vol.at[sites[:, 0], sites[:, 1], sites[:, 2]].set(
        rows, mode="drop")


def site_trilinear_sample(feats, index_vol, dhw_vox, out_sh, cap):
    """Trilinear interpolation of SITE features through an index volume.

    Numerically identical to zeros-padded align_corners grid_sample of the
    densified volume (the reference semantics, latent_xyzc.py:62-72), but
    backward is a scatter into [cap, C] instead of a dense volume.

    Args:
      feats: [cap, C] level site features (padded rows zero).
      index_vol: [D_l, H_l, W_l] int32 from scatter_index_volume.
      dhw_vox: [N, 3] continuous FULL-RES voxel coords (dhw order).
      out_sh: full-res grid shape (static tuple).
      cap: static site capacity (zero-row index).

    Returns [N, C].
    """
    Dl, Hl, Wl = index_vol.shape
    # reference normalization: gc = dhw/out_sh*2-1, then align_corners
    # unnormalize by (size_l - 1)  =>  pos = dhw/out_sh * (size_l - 1)
    scale = jnp.array([(Dl - 1), (Hl - 1), (Wl - 1)], dhw_vox.dtype) / \
        jnp.array(out_sh, dhw_vox.dtype)
    pos = dhw_vox * scale
    f0 = jnp.floor(pos)
    t = pos - f0
    i0 = f0.astype(jnp.int32)

    fpad = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
    flat_idx = index_vol.reshape(-1)
    sizes = jnp.array([Dl, Hl, Wl], jnp.int32)

    out = 0.0
    for cd in (0, 1):
        for ch in (0, 1):
            for cw in (0, 1):
                c = i0 + jnp.array([cd, ch, cw], jnp.int32)
                w = (jnp.where(jnp.array([cd, ch, cw]) == 1, t, 1.0 - t)
                     ).prod(axis=-1)
                valid = jnp.all((c >= 0) & (c < sizes), axis=-1)
                cc = jnp.clip(c, 0, sizes - 1)
                lin = (cc[:, 0] * Hl + cc[:, 1]) * Wl + cc[:, 2]
                rows = jnp.where(valid, flat_idx[lin], cap)
                out = out + fpad[rows] * (w * valid)[:, None]
    return out
