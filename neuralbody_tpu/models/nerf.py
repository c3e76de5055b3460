"""Vanilla NeRF baseline (coarse + fine) — the reference's nerf/ configs.

TPU-native redesign of the reference NeRF net (ref: lib/networks/nerf.py:
8-158): D=8, W=256, skip at layer 4, viewdir head W/2, separate coarse and
fine MLPs. Points are dense rows [N, C]; there is no netchunk microbatching
— the renderer chunks rays, XLA tiles the matmuls.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import register
from ..ops.embedder import embed_dim, positional_encoding
from .nn_utils import dense, dense_init


class NerfStatic(NamedTuple):
    depth: int = 8
    width: int = 256
    skips: tuple = (4,)
    xyz_res: int = 10
    view_res: int = 4
    use_viewdirs: bool = True


def init_mlp(key, st: NerfStatic):
    input_ch = embed_dim(st.xyz_res)
    input_ch_views = embed_dim(st.view_res)
    keys = jax.random.split(key, st.depth + 4)
    pts_linears = [dense_init(keys[0], input_ch, st.width)]
    for i in range(st.depth - 1):
        cin = st.width + input_ch if i in st.skips else st.width
        pts_linears.append(dense_init(keys[i + 1], cin, st.width))
    return {
        "pts_linears": pts_linears,
        "views_linear": dense_init(
            keys[st.depth], input_ch_views + st.width, st.width // 2),
        "feature_linear": dense_init(keys[st.depth + 1], st.width, st.width),
        "alpha_linear": dense_init(keys[st.depth + 2], st.width, 1),
        "rgb_linear": dense_init(keys[st.depth + 3], st.width // 2, 3),
    }


def init(key, st_coarse: NerfStatic, st_fine: NerfStatic | None = None):
    k1, k2 = jax.random.split(key)
    params = {"coarse": init_mlp(k1, st_coarse)}
    if st_fine is not None:
        params["fine"] = init_mlp(k2, st_fine)
    return params, {}


def apply_density(params, pts, st: NerfStatic):
    """Density-only trunk eval: pts [N, 3] -> alpha [N] (the nerf_mesh
    baseline's forward; ref lib/networks/nerf_mesh.py:45-54 runs only
    pts_linears + alpha head, no viewdir branch)."""
    input_pts = positional_encoding(pts, st.xyz_res)
    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(dense(layer, h))
        if i in st.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)
    return dense(params["alpha_linear"], h)[:, 0]


def apply_mlp(params, pts, viewdirs, st: NerfStatic):
    """pts [N, 3], viewdirs [N, 3] -> raw [N, 4] (rgb logits + sigma)."""
    input_pts = positional_encoding(pts, st.xyz_res)
    input_views = positional_encoding(viewdirs, st.view_res)

    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(dense(layer, h))
        if i in st.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)

    alpha = dense(params["alpha_linear"], h)
    feature = dense(params["feature_linear"], h)
    h = jnp.concatenate([feature, input_views], axis=-1)
    h = jax.nn.relu(dense(params["views_linear"], h))
    rgb = dense(params["rgb_linear"], h)
    return jnp.concatenate([rgb, alpha], axis=-1)


@register("model_static", "nerf")
def make_static(cfg, dataset):
    """The NeRF baseline has no voxel encoder: its statics live entirely in
    the renderer settings (volume_renderer.make_volume_renderer)."""
    return None


@register("network", "nerf")
def make(cfg):
    st = NerfStatic(depth=cfg.netdepth, width=cfg.netwidth,
                    xyz_res=cfg.xyz_res, view_res=cfg.view_res,
                    use_viewdirs=cfg.use_viewdirs)
    st_fine = NerfStatic(depth=cfg.netdepth_fine, width=cfg.netwidth_fine,
                         xyz_res=cfg.xyz_res, view_res=cfg.view_res,
                         use_viewdirs=cfg.use_viewdirs)

    def init_fn(key):
        return init(key, st, st_fine if cfg.N_importance > 0 else None)

    import sys
    return init_fn, sys.modules[__name__]


@register("model_static", "nerf_mesh")
def make_static_mesh(cfg, dataset):
    return None


@register("network", "nerf_mesh")
def make_mesh_net(cfg):
    """Density-only NeRF for mesh extraction (ref: lib/networks/
    nerf_mesh.py:96-138). Same param tree as the nerf family so a trained
    nerf checkpoint loads directly; density comes from the coarse trunk
    (the reference's self.model)."""
    return make(cfg)
