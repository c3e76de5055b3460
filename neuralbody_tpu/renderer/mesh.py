"""Mesh extraction: dense density-grid eval + host-side iso-surface.

Mirrors the reference mesh renderer (ref: lib/networks/renderer/
if_mesh_renderer.py:15-56): evaluate density at grid points inside the
visual hull in fixed-size chunks on device, scatter back into the dense
cube on host, pad by 10, extract the iso-surface at mesh_th.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.mcubes import marching_cubes
from .dispatch import get_density_grid_fn


def extract_mesh(params, batch, meta, settings, cfg):
    """batch['pts'] are padded inside-hull points; meta carries the dense
    grid shape and inside mask. Returns dict(cube, vertices, triangles).
    The density evaluator is family-dispatched on the settings type."""
    pt_chunk = int(cfg.tpu.mesh_pt_chunk)
    density_fn = get_density_grid_fn(settings)
    alpha = np.asarray(density_fn(
        params, batch, settings, pt_chunk=min(
            pt_chunk, batch["pts"].shape[1])))[0]

    inside = np.asarray(meta["inside"]).astype(bool)
    n_valid = int(inside.sum())
    cube = np.zeros(inside.shape, np.float32)
    cube[inside] = alpha[:n_valid]

    cube = np.pad(cube, 10, mode="constant")
    vertices, triangles = marching_cubes(cube, float(cfg.mesh_th))
    # back to world scale (grid index -> meters), matching the commented-out
    # reference transform (if_mesh_renderer.py:49-50)
    voxel = float(cfg.voxel_size[0])
    world_verts = (vertices - 10.0) * voxel + np.asarray(
        meta["grid_min_xyz"], np.float32)
    return {"cube": cube, "vertices": world_verts, "triangles": triangles,
            "grid_vertices": vertices}
