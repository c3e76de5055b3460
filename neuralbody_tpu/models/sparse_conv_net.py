"""SparseConvNet: latent-code diffusion over the posed body volume.

TPU-native re-design of the reference encoder (ref: lib/networks/
latent_xyzc.py:166-274): double/triple submanifold conv blocks with
stride-2 downsamples, emitting 4 multi-scale dense feature volumes
(32/64/128/128 channels at strides 2/4/8/16), each conv bias-free followed
by active-site BatchNorm (eps=1e-3, momentum=0.01) and ReLU.

Functional style: `init(key)` returns a params pytree + batch-stats pytree;
`apply(params, codes, geom, static)` returns the 4 volumes. All shapes are
static per sequence (site capacities + out_sh).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sparse_conv import (
    down_conv, masked_batch_norm, scatter_dense, site_mask, subm_conv,
    subm_conv_xtri,
)

# (name, kind, n_convs, cin, cout); kind 'subm' keeps the site set,
# 'down' moves to the next (half-res) level. Mirrors ref latent_xyzc.py:170-182.
ARCH = [
    ("conv0", "subm", 2, 16, 16),
    ("down0", "down", 1, 16, 32),
    ("conv1", "subm", 2, 32, 32),      # -> net1 (stride 2)
    ("down1", "down", 1, 32, 64),
    ("conv2", "subm", 3, 64, 64),      # -> net2 (stride 4)
    ("down2", "down", 1, 64, 128),
    ("conv3", "subm", 3, 128, 128),    # -> net3 (stride 8)
    ("down3", "down", 1, 128, 128),
    ("conv4", "subm", 3, 128, 128),    # -> net4 (stride 16)
]
DENSE_AFTER = {"conv1": 1, "conv2": 2, "conv3": 3, "conv4": 4}
VOLUME_CHANNELS = (32, 64, 128, 128)
BN_EPS = 1e-3
BN_MOMENTUM = 0.01


class EncoderStatic(NamedTuple):
    """Hashable static spec: full-res grid shape + per-level site capacities.

    compute_dtype="bfloat16" stores conv activations (the gathered bytes)
    in bf16 with f32 matmul accumulation and f32 BatchNorm — TPU gathers
    are bytes-bound past ~3 ns/row (CLAUDE.md cost model), so this halves
    the encoder's dominant cost. Parity vs f32 is ~1e-2 relative (bf16 has
    8 mantissa bits); gate via cfg.tpu.compute_dtype.
    """
    out_sh: tuple    # (D, H, W), multiples of 32
    site_caps: tuple  # 5 ints
    compute_dtype: str = "float32"
    # fuse the hat contraction's weight build + matmul in a Pallas kernel
    # (ops/pallas_hat.py; consulted only on the TPU bf16 hat path —
    # cfg.tpu.use_pallas)
    use_pallas: bool = False

    def level_sh(self, lvl: int) -> tuple:
        return tuple(s // (2 ** lvl) for s in self.out_sh)


def _conv_init(key, cin, cout, k=27):
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in)), fan_in = 27*cin (torch conv default)
    bound = 1.0 / jnp.sqrt(float(k * cin))
    return jax.random.uniform(key, (k, cin, cout), minval=-bound, maxval=bound)


def init(key):
    params, stats = {}, {}
    for name, _, n, cin, cout in ARCH:
        keys = jax.random.split(key, n + 1)
        key = keys[0]
        layers = []
        bn_layers = []
        c_in = cin
        for i in range(n):
            layers.append({
                "w": _conv_init(keys[i + 1], c_in, cout),
                "bn_scale": jnp.ones((cout,)),
                "bn_bias": jnp.zeros((cout,)),
            })
            bn_layers.append({
                "mean": jnp.zeros((cout,)),
                "var": jnp.ones((cout,)),
            })
            c_in = cout
        params[name] = layers
        stats[name] = bn_layers
    return params, stats


def _conv_bn_relu(layer, feats, table, mask, up_table=None, xtri=None):
    """One (conv -> masked BN -> relu) layer over batched site lists.

    feats [B, S_in, C_in], table [B, S_out, 27] -> [B, S_out, C_out].
    BN statistics are joint over the batch's active sites. Convs use the
    scatter-free custom-VJP primitives (up_table given => strided conv;
    xtri given => w-triple packed submanifold conv).
    """
    # batch-native conv ops: a vmapped gather lowers to a batched gather
    # (operand_batching_dims) which misses the TPU fast row-gather path
    # (~2.5x slower in situ); the primitives flatten batch into rows
    if xtri is not None:
        y = subm_conv_xtri(feats, layer["w"], *xtri)
    elif up_table is None:
        y = subm_conv(feats, layer["w"], table)
    else:
        y = down_conv(feats, layer["w"], table, up_table)
    y, bn_batch = masked_batch_norm(
        y, mask, layer["bn_scale"], layer["bn_bias"], eps=BN_EPS
    )
    return jax.nn.relu(y) * mask[..., None], bn_batch


def apply_sites(params, codes, geom, static: EncoderStatic):
    """Run the encoder, returning SITE-LIST features (no densification).

    Args:
      params: pytree from init().
      codes: [B, S0_cap, 16] level-0 site features (scattered vertex codes).
      geom: batched frame-geometry arrays (each [B, ...]); see
        ops.sparse_conv.build_frame_geometry.
      static: EncoderStatic (hashable; jit static arg).

    Returns:
      (site_feats, new_batch_stats): site_feats is a list of 4 per-level
      feature tables [B, S_l, C_l] (levels 1..4, strides 2/4/8/16) — the
      training interpolation path samples these through int32 index volumes
      so no dense float volume is ever materialized in the autodiff graph.
    """
    caps = static.site_caps
    masks = [
        jax.vmap(site_mask, in_axes=(0, None))(geom[f"nsite{l}"], caps[l])
        for l in range(5)
    ]

    def xtri_tabs(lvl):
        if f"xnbr9{lvl}" not in geom:
            return None  # geoms built before the packed tables existed
        return tuple(geom[f"x{n}{lvl}"]
                     for n in ("lnbr", "rnbr", "nbr9", "augl", "augr"))

    dt = (jnp.bfloat16 if static.compute_dtype == "bfloat16"
          else jnp.float32)
    x = codes.astype(dt)
    lvl = 0
    site_feats = []
    new_stats = {}
    for name, kind, n, _, _ in ARCH:
        if kind == "down":
            table = geom[f"down{lvl}"]
            up = geom[f"up{lvl}"]
            lvl += 1
        else:
            table = geom[f"nbr{lvl}"]
            up = None
        layer_stats = []
        for i in range(n):
            is_down = kind == "down" and i == 0
            tbl = table if i == 0 else geom[f"nbr{lvl}"]
            x, bn_batch = _conv_bn_relu(
                params[name][i], x, tbl, masks[lvl],
                up_table=up if is_down else None,
                xtri=None if is_down else xtri_tabs(lvl))
            # conv accumulates f32 (preferred_element_type), BN runs f32;
            # only the STORED activation (= next conv's gathered bytes)
            # drops to compute_dtype
            x = x.astype(dt)
            layer_stats.append({"mean": bn_batch[0], "var": bn_batch[1]})
        new_stats[name] = layer_stats

        if name in DENSE_AFTER:
            site_feats.append(x.astype(jnp.float32))

    return site_feats, new_stats


def densify(site_feats, geom, static: EncoderStatic):
    """Site features -> dense volumes [B, D_l, H_l, W_l, C_l] (.dense())."""
    volumes = []
    for i, x in enumerate(site_feats):
        lvl = i + 1
        lsh = static.level_sh(lvl)
        volumes.append(jax.vmap(scatter_dense, in_axes=(0, 0, None))(
            x, geom[f"sites{lvl}"], lsh))
    return volumes


def index_volumes(geom, static: EncoderStatic):
    """Per-level int32 site-index volumes [B, D_l, H_l, W_l] (no grad).

    Host-built in build_frame_geometry (a device scatter of the same data
    serializes on TPU); falls back to the device scatter for geom dicts
    produced before ivol tables existed."""
    from ..ops.sparse_conv import scatter_index_volume
    vols = []
    for lvl in range(1, 5):
        if f"ivol{lvl}" in geom:
            vols.append(geom[f"ivol{lvl}"])
            continue
        lsh = static.level_sh(lvl)
        cap = static.site_caps[lvl]
        vols.append(jax.vmap(
            scatter_index_volume, in_axes=(0, None, None)
        )(geom[f"sites{lvl}"], lsh, cap))
    return vols


def apply(params, codes, geom, static: EncoderStatic):
    """Encoder returning densified volumes (eval/mesh/parity path)."""
    site_feats, new_stats = apply_sites(params, codes, geom, static)
    return densify(site_feats, geom, static), new_stats


def update_running_stats(stats, new_batch_stats, momentum=BN_MOMENTUM):
    """EMA update of BN running stats (torch momentum semantics)."""
    return jax.tree.map(
        lambda run, batch: (1.0 - momentum) * run + momentum * batch,
        stats, new_batch_stats,
    )
