"""LBS / pose-space utilities for the T-pose variant.

Functional equivalents of the reference blend utilities (ref:
lib/utils/blend_utils.py:6-83): blend-weight grid sampling with border
padding, and pose-space -> T-pose transforms via per-point blended inverse
bone transforms.
"""
from __future__ import annotations

import jax.numpy as jnp

from .grid_sample import grid_sample_3d


def bounds_grid_sample_blend_weights(pts, bw, bounds):
    """Sample a blend-weight volume at world points.

    pts [N, 3] (pose-space xyz); bw [X, Y, Z, J] indexed by xyz;
    bounds [2, 3]. Normalization divides by the full extent (not extent-1),
    matching the reference (blend_utils.py:34-40). Returns [N, J].
    """
    extent = bounds[1] - bounds[0]
    gc = (pts - bounds[0]) / extent * 2.0 - 1.0
    # bw volume spatial dims are (X, Y, Z); our sampler's coord[0] indexes
    # the LAST spatial dim, so flip xyz -> zyx (ref's [..., [2, 1, 0]])
    return grid_sample_3d(bw, gc[:, ::-1], padding_mode="border")


def ppts_to_pts(ppts, bw, A):
    """Pose space -> T pose: subtract the blended translation, then apply
    the inverse blended rotation (ref: blend_utils.py:73-83).

    ppts [N, 3]; bw [N, J]; A [J, 4, 4] skinning transforms.
    """
    J = A.shape[0]
    T = jnp.einsum("nj,jab->nab", bw, A.reshape(J, 4, 4))
    pts = ppts - T[:, :3, 3]
    R_inv = jnp.linalg.inv(T[:, :3, :3])
    return jnp.einsum("nab,nb->na", R_inv, pts)


def pts_to_ppts(pts, bw, A):
    """T pose -> pose space (forward skinning of points)."""
    J = A.shape[0]
    T = jnp.einsum("nj,jab->nab", bw, A.reshape(J, 4, 4))
    return jnp.einsum("nab,nb->na", T[:, :3, :3], pts) + T[:, :3, 3]
