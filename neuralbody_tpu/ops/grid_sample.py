"""Trilinear volume sampling with PyTorch grid_sample semantics.

Matches F.grid_sample(volume, grid, padding_mode='zeros', align_corners=True)
as used by the reference feature interpolation (ref: lib/networks/
latent_xyzc.py:62-72): align_corners=True maps grid coordinate -1 to voxel 0
and +1 to voxel (size-1); corners falling outside the volume contribute zero.

Volumes here are stored channels-last [D, H, W, C] (TPU lane-friendly), and
coordinates are xyz in [-1, 1] with x indexing W, y -> H, z -> D, exactly like
torch's grid layout.

Fully differentiable: gradients flow to the volume (scatter-add via the gather
transpose) and to the coordinates (through the trilinear weights).
"""
import jax.numpy as jnp


def grid_sample_3d(volume, coords, padding_mode="zeros"):
    """Sample a volume at continuous normalized coordinates.

    Args:
      volume: [D, H, W, C] feature volume.
      coords: [N, 3] xyz coordinates in [-1, 1].
      padding_mode: 'zeros' (out-of-range corners contribute 0) or 'border'
        (coords clamped to the edge, matching torch padding_mode='border' as
        used for blend-weight grids, ref: lib/utils/blend_utils.py:45-48).

    Returns:
      [N, C] trilinearly interpolated features.
    """
    D, H, W, C = volume.shape
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]

    # align_corners=True unnormalization
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)
    fz = (z + 1.0) * 0.5 * (D - 1)

    if padding_mode == "border":
        fx = jnp.clip(fx, 0.0, W - 1)
        fy = jnp.clip(fy, 0.0, H - 1)
        fz = jnp.clip(fz, 0.0, D - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    tx = fx - x0
    ty = fy - y0
    tz = fz - z0

    ix0, iy0, iz0 = x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32)
    ix1, iy1, iz1 = ix0 + 1, iy0 + 1, iz0 + 1

    flat = volume.reshape(D * H * W, C)

    def corner(iz, iy, ix, w):
        valid = (
            (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
        )
        izc = jnp.clip(iz, 0, D - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        ixc = jnp.clip(ix, 0, W - 1)
        idx = (izc * H + iyc) * W + ixc
        vals = jnp.take(flat, idx, axis=0)          # [N, C]
        return vals * (w * valid)[:, None]

    w000 = (1 - tx) * (1 - ty) * (1 - tz)
    w100 = tx * (1 - ty) * (1 - tz)
    w010 = (1 - tx) * ty * (1 - tz)
    w110 = tx * ty * (1 - tz)
    w001 = (1 - tx) * (1 - ty) * tz
    w101 = tx * (1 - ty) * tz
    w011 = (1 - tx) * ty * tz
    w111 = tx * ty * tz

    out = (
        corner(iz0, iy0, ix0, w000)
        + corner(iz0, iy0, ix1, w100)
        + corner(iz0, iy1, ix0, w010)
        + corner(iz0, iy1, ix1, w110)
        + corner(iz1, iy0, ix0, w001)
        + corner(iz1, iy0, ix1, w101)
        + corner(iz1, iy1, ix0, w011)
        + corner(iz1, iy1, ix1, w111)
    )
    return out


def multiscale_grid_sample(volumes, coords):
    """Concatenate samples from multiple feature volumes at shared coords.

    The reference samples 4 multi-scale volumes with the SAME normalized
    coordinates (normalized by the full-resolution out_sh; ref:
    latent_xyzc.py:49-72) and concatenates to a 352-channel feature.
    """
    return jnp.concatenate([grid_sample_3d(v, coords) for v in volumes], axis=-1)
