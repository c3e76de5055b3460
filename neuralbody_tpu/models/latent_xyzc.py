"""Neural Body network: structured latent codes -> density + color field.

TPU-native redesign of the reference Network (ref: lib/networks/
latent_xyzc.py:9-163):

  * 6890x16 learned vertex codes (C1), scattered into the posed voxel grid
  * SparseConvNet diffusion -> 4 multi-scale dense volumes (C2)
  * trilinear multi-scale feature interpolation at ray samples (C4)
  * density/color MLP with per-frame 128-d appearance codes (C5, C6)

Everything is a pure function over a params pytree; points are dense rows
[N, C] feeding the MXU. The world->SMPL transform and the exact reference
grid normalization (dhw / out_sh * 2 - 1, dividing by out_sh rather than
out_sh - 1; ref latent_xyzc.py:49-60) are reproduced for parity.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import register
from ..ops.embedder import positional_encoding
from ..ops.grid_sample import grid_sample_3d
from ..ops.sparse_conv import scatter_vertex_codes
from . import sparse_conv_net
from .nn_utils import dense, dense_init, embedding_init, mxu_dtype

FEATURE_DIM = 352   # 32 + 64 + 128 + 128 concatenated scales


class ModelStatic(NamedTuple):
    """Hashable static model spec (jit static argument)."""
    encoder: sparse_conv_net.EncoderStatic
    xyz_res: int = 10
    view_res: int = 4

    @property
    def out_sh(self):
        return self.encoder.out_sh


def init(key, num_train_frame: int, nv: int = 6890, code_dim: int = 16,
         latent_dim: int = 128, xyz_res: int = 10, view_res: int = 4):
    keys = jax.random.split(key, 12)
    xyz_dim = 3 * (1 + 2 * xyz_res)
    view_dim = 3 * (1 + 2 * view_res)
    enc_params, enc_stats = sparse_conv_net.init(keys[0])
    params = {
        "vertex_code": embedding_init(keys[1], nv, code_dim),
        "frame_latent": embedding_init(keys[2], num_train_frame, latent_dim),
        "xyzc_net": enc_params,
        "fc_0": dense_init(keys[3], FEATURE_DIM, 256),
        "fc_1": dense_init(keys[4], 256, 256),
        "fc_2": dense_init(keys[5], 256, 256),
        "alpha_fc": dense_init(keys[6], 256, 1),
        "feature_fc": dense_init(keys[7], 256, 256),
        "latent_fc": dense_init(keys[8], 256 + latent_dim, 256),
        "view_fc": dense_init(keys[9], 256 + view_dim + xyz_dim, 128),
        "rgb_fc": dense_init(keys[10], 128, 3),
    }
    stats = {"xyzc_net": enc_stats}
    return params, stats


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def encode_sparse_voxels(params, geom, static: ModelStatic, densify=True):
    """Vertex codes -> multi-scale feature volumes (dense or site-list).

    geom: batched frame geometry (see ops.sparse_conv.build_frame_geometry),
    each leaf [B, ...]. Returns (volumes | site_feats, new_bn_stats).
    """
    cap0 = static.encoder.site_caps[0]
    codes = scatter_vertex_codes(params["vertex_code"], geom["vert_idx"],
                                 cap0)
    fn = sparse_conv_net.apply if densify else sparse_conv_net.apply_sites
    return fn(params["xyzc_net"], codes, geom, static.encoder)


# ---------------------------------------------------------------------------
# point decoding
# ---------------------------------------------------------------------------

def pts_to_can_pts(pts, R, Th):
    """World -> SMPL frame: (p - Th) @ R  (ref: latent_xyzc.py:41-47).

    pts [..., 3], R [3, 3], Th [1, 3] or [3].
    """
    return jnp.matmul(pts - jnp.reshape(Th, (1, 3)), R)


def get_grid_coords(ppts, bounds, voxel_size, out_sh):
    """SMPL-frame points -> normalized grid coords (xyz order, [-1, 1]).

    Reproduces the reference normalization exactly, including division by
    out_sh instead of out_sh-1 (ref: latent_xyzc.py:49-60).
    """
    rev = jnp.array([2, 1, 0])
    dhw = ppts[..., rev]
    min_dhw = bounds[0][rev]
    dhw = (dhw - min_dhw) / jnp.asarray(voxel_size, dhw.dtype)
    dhw = dhw / jnp.asarray(out_sh, dhw.dtype) * 2.0 - 1.0
    return dhw[..., rev]


def interpolate_features(grid_coords, volumes):
    """Trilinear sample each scale at shared coords, concat -> [N, 352]."""
    return jnp.concatenate(
        [grid_sample_3d(v, grid_coords) for v in volumes], axis=-1
    )


def get_dhw_vox(ppts, bounds, voxel_size):
    """SMPL-frame points -> continuous full-res voxel coords (dhw order)."""
    rev = jnp.array([2, 1, 0])
    return (ppts[..., rev] - bounds[0][rev]) / jnp.asarray(
        voxel_size, ppts.dtype)


def interpolate_site_features(site_feats, index_vols, dhw_vox, static):
    """Training interpolation path: gather site features through per-level
    int32 index volumes (numerically equals grid_sample of the densified
    volumes; backward is a tiny [S_l, C] scatter instead of dense-volume
    traffic). site_feats/index_vols are per-level, single batch element."""
    from ..ops.sparse_conv import site_trilinear_sample
    outs = []
    for lvl, (feats, ivol) in enumerate(zip(site_feats, index_vols), 1):
        outs.append(site_trilinear_sample(
            feats, ivol, dhw_vox, static.out_sh,
            static.encoder.site_caps[lvl]))
    return jnp.concatenate(outs, axis=-1)


def _density_trunk(params, feat, dt=None):
    net = jax.nn.relu(dense(params["fc_0"], feat, dt))
    net = jax.nn.relu(dense(params["fc_1"], net, dt))
    net = jax.nn.relu(dense(params["fc_2"], net, dt))
    return net


def calculate_density(params, wpts, volumes, frame, static: ModelStatic,
                      voxel_size):
    """wpts [N, 3] -> alpha [N, 1]  (ref: latent_xyzc.py:74-89)."""
    ppts = pts_to_can_pts(wpts, frame["R"], frame["Th"])
    gc = get_grid_coords(ppts, frame["bounds"], voxel_size, static.out_sh)
    feat = interpolate_features(gc, volumes)
    net = _density_trunk(params, feat)
    return dense(params["alpha_fc"], net)


def decode_raw(params, feat, wpts, viewdir, frame, static: ModelStatic):
    """Interpolated features [..., 352] -> raw [..., 4] (rgb logits + sigma).

    The post-interpolation half of the reference decode
    (ref: latent_xyzc.py:99-126); shared by all interpolation paths.
    """
    # decode MLP in the encoder's compute dtype (bf16 on TPU when
    # configured: single-pass MXU matmuls, f32 accumulation)
    dt = mxu_dtype(static.encoder.compute_dtype)
    dt = None if dt == jnp.float32 else dt
    net = _density_trunk(params, feat, dt)
    alpha = dense(params["alpha_fc"], net, dt)

    features = dense(params["feature_fc"], net, dt)
    latent = params["frame_latent"][frame["latent_index"]]
    latent = jnp.broadcast_to(
        latent, features.shape[:-1] + (latent.shape[-1],))
    features = dense(params["latent_fc"],
                     jnp.concatenate([features,
                                      latent.astype(features.dtype)],
                                     axis=-1), dt)

    view_emb = positional_encoding(viewdir, static.view_res)
    xyz_emb = positional_encoding(wpts, static.xyz_res)
    features = jnp.concatenate(
        [features, view_emb.astype(features.dtype),
         xyz_emb.astype(features.dtype)], axis=-1)

    net = jax.nn.relu(dense(params["view_fc"], features, dt))
    rgb = dense(params["rgb_fc"], net, dt)

    return jnp.concatenate([rgb, alpha], axis=-1)


def calculate_density_color(params, wpts, viewdir, volumes, frame,
                            static: ModelStatic, voxel_size,
                            index_vols=None):
    """wpts/viewdir [N, 3] -> raw [N, 4] (rgb logits + sigma)
    (ref: latent_xyzc.py:91-126).

    volumes: dense volumes (index_vols None) or per-level site features
    (index_vols given -> memory-light site-interp path).
    """
    ppts = pts_to_can_pts(wpts, frame["R"], frame["Th"])
    if index_vols is not None:
        dhw = get_dhw_vox(ppts, frame["bounds"], voxel_size)
        feat = interpolate_site_features(volumes, index_vols, dhw, static)
    else:
        gc = get_grid_coords(ppts, frame["bounds"], voxel_size, static.out_sh)
        feat = interpolate_features(gc, volumes)

    return decode_raw(params, feat, wpts, viewdir, frame, static)


@register("model_static", "latent_xyzc")
def make_static(cfg, dataset):
    """Static model spec from the dataset's sequence geometry (static grid
    shape + per-level site capacities; SURVEY.md §7.3 static-shapes rule)."""
    geo = dataset.geo
    return ModelStatic(
        encoder=sparse_conv_net.EncoderStatic(
            out_sh=geo.out_sh, site_caps=geo.site_caps,
            compute_dtype=str(cfg.tpu.compute_dtype),
            use_pallas=bool(cfg.tpu.use_pallas)),
        xyz_res=cfg.xyz_res, view_res=cfg.view_res)


@register("network", "latent_xyzc")
def make(cfg):
    """Factory: returns (init_fn, module) for the config-driven harness."""
    def init_fn(key):
        return init(
            key,
            num_train_frame=cfg.num_train_frame,
            nv=cfg.nv,
            code_dim=cfg.code_dim,
            latent_dim=cfg.latent_dim,
            xyz_res=cfg.xyz_res,
            view_res=cfg.view_res,
        )
    import sys
    return init_fn, sys.modules[__name__]
