"""Inverse-CDF hierarchical (importance) sampling.

TPU-native replacement for the reference sample_pdf, which depends on the
CUDA torchsearchsorted extension (ref: lib/networks/renderer/
nerf_net_utils.py:55-90). jnp.searchsorted vectorizes on TPU directly.
"""
import jax
import jax.numpy as jnp


def sample_pdf(bins, weights, n_samples, key=None, det=False):
    """Draw samples from the piecewise-constant PDF defined by weights.

    Args:
      bins:    [R, B] bin edges (z_vals midpoints).
      weights: [R, B-1] unnormalized bin weights.
      n_samples: number of importance samples per ray.
      key: PRNG key (required when det=False).
      det: deterministic (linspace) samples instead of uniform random.

    Returns:
      [R, n_samples] sample positions.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, B]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
