"""Synthetic scene generation for tests, benchmarks, and dry runs.

Builds a human-scale ellipsoid "body" point cloud in SMPL coordinates plus
cameras/rays, shaped exactly like the real data pipeline output, so the whole
train/render path can run without ZJU-MoCap / People-Snapshot data on disk.
"""
from __future__ import annotations

import numpy as np

from ..ops.sparse_conv import build_frame_geometry, compute_site_caps


def ellipsoid_vertices(n=6890, radii=(0.3, 0.9, 0.15), seed=0):
    """Points on an ellipsoid surface (x-width, y-height, z-depth), meters."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * np.asarray(radii)).astype(np.float32)


def voxelize(xyz, voxel_size=0.005, pad_z=0.05):
    """Vertices (SMPL frame) -> voxel coords + padded grid shape.

    Mirrors the reference prepare_input voxelization (ref: lib/datasets/
    light_stage/multi_view_dataset.py:95-117): bounds +- pad on z, coords in
    dhw order, out_sh rounded up to a multiple of 32.
    """
    min_xyz = xyz.min(0).copy()
    max_xyz = xyz.max(0).copy()
    min_xyz[2] -= pad_z
    max_xyz[2] += pad_z
    bounds = np.stack([min_xyz, max_xyz]).astype(np.float32)

    dhw = xyz[:, [2, 1, 0]]
    min_dhw = min_xyz[[2, 1, 0]]
    coord = np.round((dhw - min_dhw) / voxel_size).astype(np.int32)
    out_sh = np.ceil((max_xyz[[2, 1, 0]] - min_dhw) / voxel_size).astype(np.int32)
    out_sh = (out_sh | 31) + 1
    return coord, tuple(int(s) for s in out_sh), bounds


def make_batch(n_rays=1024, n_verts=6890, voxel_size=0.005, seed=0,
               batch_size=1, num_views=0, img_hw=(512, 512),
               hat=False, n_samples=64, hat_perturb=True,
               hat_static=None):
    """A full training batch in canonical framework layout.

    hat=True additionally runs the host hat-interpolation planner
    (ops.hat_interp.prepare_hat_batch) so the batch drives the grouped
    hat-matmul training path; static then also carries hat_rows_caps.

    Returns (batch dict of numpy arrays, static info dict with out_sh and
    site_caps).
    """
    rng = np.random.RandomState(seed)
    xyz = ellipsoid_vertices(n_verts, seed=seed)
    coord, out_sh, bounds = voxelize(xyz, voxel_size)
    caps = compute_site_caps([coord], out_sh)
    geom = build_frame_geometry(coord, out_sh, caps)

    # world frame = SMPL frame rotated/translated a bit
    theta = 0.3
    R = np.array([
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1],
    ], np.float32)
    Th = np.array([[0.1, 0.05, 1.0]], np.float32)
    world_center = (bounds.mean(0) @ R.T) + Th[0]

    # cameras on a ring looking at the body center
    ray_o = np.empty((n_rays, 3), np.float32)
    ray_d = np.empty((n_rays, 3), np.float32)
    phis = rng.uniform(0, 2 * np.pi, n_rays)
    cam = world_center + np.stack(
        [3 * np.cos(phis), rng.uniform(-0.5, 0.5, n_rays), 3 * np.sin(phis)],
        axis=1).astype(np.float32)
    target = world_center + rng.uniform(-0.3, 0.3, (n_rays, 3)).astype(np.float32)
    ray_o[:] = cam
    d = target - cam
    ray_d[:] = d / np.linalg.norm(d, axis=1, keepdims=True)

    # ray-AABB (world) near/far: transform bounds corners to world not needed;
    # use a generous sphere around the body instead (synthetic data)
    dist = np.linalg.norm(world_center - cam, axis=1)
    near = (dist - 1.2).astype(np.float32)
    far = (dist + 1.2).astype(np.float32)

    rgb = (0.5 + 0.5 * np.stack(
        [np.cos(phis), np.sin(2 * phis), np.cos(3 * phis)], axis=1
    )).astype(np.float32)

    def rep(x):
        return np.repeat(np.asarray(x)[None], batch_size, axis=0)

    batch = {
        "geom": {k: rep(v) for k, v in geom.items()},
        "ray_o": rep(ray_o), "ray_d": rep(ray_d),
        "near": rep(near), "far": rep(far),
        "rgb": rep(rgb),
        "ray_mask": np.ones((batch_size, n_rays), np.float32),
        "R": rep(R), "Th": rep(Th),
        "bounds": rep(bounds),
        "latent_index": np.zeros((batch_size,), np.int32),
    }
    if num_views > 0:
        H, W = img_hw
        K = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
                     np.float32)
        RT = np.tile(np.eye(4, dtype=np.float32), (num_views, 1, 1))
        msks = np.ones((num_views, H, W), np.float32)
        batch["Ks"] = rep(np.tile(K, (num_views, 1, 1)))
        batch["RT"] = rep(RT)
        batch["msks"] = rep(msks)

    static = {"out_sh": out_sh, "site_caps": tuple(caps)}
    if hat:
        from ..ops.hat_interp import prepare_hat_batch
        hs = hat_static or {}
        batch, hs = prepare_hat_batch(
            batch, out_sh, tuple(caps), voxel_size, n_samples,
            group_size=hs.get("group_size", 128),
            tile=hs.get("tile", (4, 8)),
            rows_caps=hs.get("rows_caps"),
            n_groups=hs.get("n_groups"),
            rng=np.random.RandomState(seed + 1) if hat_perturb else None)
        static["hat"] = hs
    return batch, static
