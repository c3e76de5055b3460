"""NeRF volume-rendering quadrature.

Functional equivalent of the reference raw2outputs
(ref: lib/networks/renderer/nerf_net_utils.py:6-51):
alpha = 1 - exp(-relu(sigma) * delta), exclusive-cumprod transmittance,
weighted sums for rgb/depth/disp/acc, optional white background.
"""
import jax
import jax.numpy as jnp


def raw2outputs(raw, z_vals, rays_d, raw_noise_std=0.0, white_bkgd=False,
                noise_key=None):
    """Composite per-sample raw predictions into per-ray maps.

    Args:
      raw:    [R, S, 4] rgb logits + density.
      z_vals: [R, S] sample depths along each ray.
      rays_d: [R, 3] (unnormalized) ray directions.

    Returns:
      dict(rgb_map [R,3], disp_map [R], acc_map [R], weights [R,S],
           depth_map [R]).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])

    sigma = raw[..., 3]
    if raw_noise_std > 0.0 and noise_key is not None:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)

    # exclusive cumulative product of (1 - alpha) -> transmittance
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    # NaN-safe: the reference divides depth/acc which is 0/0 on empty rays
    # (nerf_net_utils.py:44-45 NaNs there too; disp is never consumed).
    disp_map = 1.0 / jnp.maximum(
        1e-10 * jnp.ones_like(depth_map),
        depth_map / jnp.maximum(acc_map, 1e-10),
    )

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {
        "rgb_map": rgb_map,
        "disp_map": disp_map,
        "acc_map": acc_map,
        "weights": weights,
        "depth_map": depth_map,
    }
