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


def build_frame_geometry(vertex_coords: np.ndarray, out_sh, site_caps):
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
        nbr = subm_table(sites, lookup)
        nbr = np.where(nbr < 0, cap, nbr)
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


def sparse_conv_matmul(gathered, w):
    """[(B,) 27, S, Cin] x [27, Cin, Cout] -> [(B,) S, Cout] on the MXU.

    Batched matmul over the tap axis, then a tap-sum — the layout-friendly
    contraction for TPU (see gather_taps).
    """
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
    gyg = gather_taps(gy, nbr)                          # [(B,) 27, S, Cout]
    w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)       # [27, Cout, Cin]
    dx = sparse_conv_matmul(gyg, w_t)
    # dW needs the tap-flipped gathered cotangents (tap k of the flipped
    # tensor is gy[nbr[26-k]], the site one off_k step away); flipping the
    # small [27, Cin, Cout] RESULT instead of the big gather avoids a copy.
    if x.ndim == 2:
        dw = jnp.flip(jnp.einsum("sc,ksd->kcd", x, gyg), axis=0)
    else:
        dw = jnp.flip(jnp.einsum("bsc,bksd->kcd", x, gyg), axis=0)
    return dx, dw, None


subm_conv.defvjp(_subm_fwd, _subm_bwd)


@jax.custom_vjp
def down_conv(x, w, down_tbl, up_tbl):
    """Stride-2 conv: x [S_in, Cin] -> [S_out, Cout]; tables [27, S_*]."""
    return sparse_conv_matmul(gather_taps(x, down_tbl), w)


def _down_fwd(x, w, down_tbl, up_tbl):
    return down_conv(x, w, down_tbl, up_tbl), (x, w, down_tbl, up_tbl)


def _down_bwd(res, gy):
    x, w, down_tbl, up_tbl = res
    gup = gather_taps(gy, up_tbl)                       # [(B,) 27, S_in, Cout]
    w_t = w.transpose(0, 2, 1)                          # [27, Cout, Cin]
    dx = sparse_conv_matmul(gup, w_t)
    if x.ndim == 2:
        dw = jnp.einsum("sc,ksd->kcd", x, gup)
    else:
        dw = jnp.einsum("bsc,bksd->kcd", x, gup)
    return dx, dw, None, None


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
