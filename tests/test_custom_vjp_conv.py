"""Scatter-free custom-VJP convs: gradients match plain autodiff exactly."""
import numpy as np
import jax
import jax.numpy as jnp

from neuralbody_tpu.ops.sparse_conv import (
    _SiteLookup, dedup_sites, down_conv, down_table, downsample_sites,
    gather_taps, sparse_conv_matmul, subm_conv, subm_table, up_table,
)


def _plain_subm(x, w, nbr):
    return sparse_conv_matmul(gather_taps(x, nbr), w)


def _plain_down(x, w, tbl):
    return sparse_conv_matmul(gather_taps(x, tbl), w)


def _sites(rng, n, sh):
    s, _ = dedup_sites(
        np.stack([rng.randint(0, d, n) for d in sh], 1).astype(np.int32), sh)
    return s


class TestSubmVjp:
    def test_grads_match_autodiff(self, rng):
        sh = (10, 12, 14)
        cin, cout = 8, 16
        sites = _sites(rng, 80, sh)
        S = len(sites)
        nbr = subm_table(sites, _SiteLookup(sites, sh))
        nbr = jnp.array(np.where(nbr < 0, S, nbr).T)
        x = jnp.array(rng.randn(S, cin).astype(np.float32))
        w = jnp.array(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        g = jnp.array(rng.randn(S, cout).astype(np.float32))

        def loss_custom(x, w):
            return jnp.sum(subm_conv(x, w, nbr) * g)

        def loss_plain(x, w):
            return jnp.sum(_plain_subm(x, w, nbr) * g)

        np.testing.assert_allclose(
            np.asarray(subm_conv(x, w, nbr)),
            np.asarray(_plain_subm(x, w, nbr)), rtol=1e-5)
        gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, w)
        gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p),
                                   rtol=1e-4, atol=1e-5)


class TestDownVjp:
    def test_grads_match_autodiff(self, rng):
        sh = (8, 12, 16)
        cin, cout = 6, 10
        sites = _sites(rng, 90, sh)
        S = len(sites)
        lookup = _SiteLookup(sites, sh)
        out_sites = downsample_sites(sites, sh)
        So = len(out_sites)
        dtab = down_table(out_sites, lookup)
        dtab = jnp.array(np.where(dtab < 0, S, dtab).T)
        utab = up_table(sites, _SiteLookup(out_sites, np.array(sh) // 2))
        utab = jnp.array(np.where(utab < 0, So, utab).T)

        x = jnp.array(rng.randn(S, cin).astype(np.float32))
        w = jnp.array(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        g = jnp.array(rng.randn(So, cout).astype(np.float32))

        def loss_custom(x, w):
            return jnp.sum(down_conv(x, w, dtab, utab) * g)

        def loss_plain(x, w):
            return jnp.sum(_plain_down(x, w, dtab) * g)

        np.testing.assert_allclose(
            np.asarray(down_conv(x, w, dtab, utab)),
            np.asarray(_plain_down(x, w, dtab)), rtol=1e-5)
        gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, w)
        gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p),
                                   rtol=1e-4, atol=1e-5)
