"""Device-side ray sampling utilities.

Stratified depth sampling along rays, equivalent to the reference
get_sampling_points (ref: lib/networks/renderer/if_clight_renderer.py:11-27)
but functional (explicit PRNG key) and jit-friendly.
"""
import jax
import jax.numpy as jnp


def stratified_z_vals(near, far, n_samples, key=None, perturb=False,
                      lindisp=False):
    """near/far: [..., R] -> z_vals [..., R, S]."""
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if lindisp:
        z_vals = 1.0 / (
            1.0 / near[..., None] * (1.0 - t_vals) + 1.0 / far[..., None] * t_vals
        )
    else:
        z_vals = near[..., None] * (1.0 - t_vals) + far[..., None] * t_vals

    if perturb and key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand

    return z_vals


def sample_along_rays(ray_o, ray_d, near, far, n_samples, key=None,
                      perturb=False, lindisp=False):
    """Returns world-space points [..., R, S, 3] and z_vals [..., R, S]."""
    z_vals = stratified_z_vals(near, far, n_samples, key, perturb, lindisp)
    pts = ray_o[..., None, :] + ray_d[..., None, :] * z_vals[..., None]
    return pts, z_vals
