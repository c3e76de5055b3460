"""T-pose Neural Body variant (TPAMI extension).

TPU-native version of the reference tpose network (ref: lib/networks/
tpose_xyzc.py:8-140): vertex codes are voxelized in T-POSE space and
diffused there; features reach posed ray samples through a double grid
sample — each T-pose multi-scale volume is first sampled at a dense posed
grid's T-pose coordinates (building a warped feature volume in pose space),
then sampled at the ray points' posed coordinates. Pose generalization
comes from the canonical feature field.

The encoder topology and MLP heads are shared with latent_xyzc.
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
from .latent_xyzc import FEATURE_DIM
from .nn_utils import dense, dense_init, embedding_init


class TposeStatic(NamedTuple):
    encoder: sparse_conv_net.EncoderStatic   # T-pose grid (xyz order)
    ptot_shape: tuple                        # warped posed grid (X, Y, Z)
    xyz_res: int = 10
    view_res: int = 4


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
    return params, {"xyzc_net": enc_stats}


def encode_tpose_voxels(params, geom, static: TposeStatic):
    """T-pose vertex codes -> 4 multi-scale T-pose volumes."""
    cap0 = static.encoder.site_caps[0]
    codes = scatter_vertex_codes(params["vertex_code"], geom["vert_idx"],
                                 cap0)
    return sparse_conv_net.apply(params["xyzc_net"], codes, geom,
                                 static.encoder)


def warp_volumes(volumes, tgrid_coords, ptot_shape):
    """Build warped (posed-space) volumes: sample each T-pose volume at the
    posed grid's T-pose coords (first grid_sample, ref tpose_xyzc.py:91-98).

    volumes: list of [D,H,W,C] (T-pose); tgrid_coords: [X*Y*Z, 3] zyx-order
    normalized coords. Returns list of [X, Y, Z, C].
    """
    X, Y, Z = ptot_shape
    return [
        grid_sample_3d(v, tgrid_coords).reshape(X, Y, Z, v.shape[-1])
        for v in volumes
    ]


def sample_warped(warped, pgrid_coords):
    """Second grid_sample: warped posed volumes at ray-sample coords
    (ref tpose_xyzc.py:95-98). pgrid_coords [N, 3] zyx order -> [N, 352]."""
    return jnp.concatenate(
        [grid_sample_3d(w, pgrid_coords) for w in warped], axis=-1)


def decode(params, feat, wpts, viewdir, latent_index, static: TposeStatic):
    """Shared MLP heads (ref tpose_xyzc.py:42-64)."""
    net = jax.nn.relu(dense(params["fc_0"], feat))
    net = jax.nn.relu(dense(params["fc_1"], net))
    net = jax.nn.relu(dense(params["fc_2"], net))
    alpha = dense(params["alpha_fc"], net)

    features = dense(params["feature_fc"], net)
    latent = params["frame_latent"][latent_index]
    latent = jnp.broadcast_to(latent, (features.shape[0], latent.shape[-1]))
    features = dense(params["latent_fc"],
                     jnp.concatenate([features, latent], axis=-1))

    view_emb = positional_encoding(viewdir, static.view_res)
    xyz_emb = positional_encoding(wpts, static.xyz_res)
    features = jnp.concatenate([features, view_emb, xyz_emb], axis=-1)
    net = jax.nn.relu(dense(params["view_fc"], features))
    rgb = dense(params["rgb_fc"], net)
    return jnp.concatenate([rgb, alpha], axis=-1)


@register("model_static", "tpose_xyzc")
def make_static(cfg, dataset):
    """T-pose statics: the encoder grid lives in T-pose space (the tpose
    dataset's tgeo, NOT the posed-frame geo) and the warped posed grid
    shape is the dataset's static ptot_shape."""
    geo = getattr(dataset, "tgeo", dataset.geo)
    return TposeStatic(
        encoder=sparse_conv_net.EncoderStatic(
            out_sh=geo.out_sh, site_caps=geo.site_caps),
        ptot_shape=tuple(dataset.ptot_shape),
        xyz_res=cfg.xyz_res, view_res=cfg.view_res)


@register("network", "tpose_xyzc")
def make(cfg):
    def init_fn(key):
        return init(key, num_train_frame=cfg.num_train_frame, nv=cfg.nv,
                    code_dim=cfg.code_dim, latent_dim=cfg.latent_dim,
                    xyz_res=cfg.xyz_res, view_res=cfg.view_res)
    import sys
    return init_fn, sys.modules[__name__]
