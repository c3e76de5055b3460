"""Contract: the fused Pallas hat contraction (interpret mode on CPU)
matches the XLA formulation in ops/hat_interp.py — forward values and the
d_rf cotangent (the only gradient the op carries; pos/rc are ray geometry).
On real TPU the same kernel ran with max err 0 vs XLA
(tools/probes/pallas_hat_fused.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralbody_tpu.ops.pallas_hat import hat_contract_fused

NGRP, P, CAPR, C = 4, 16, 32, 8


def _xla_level(rf, rc, pos):
    # the bf16 branch of ops/hat_interp.py:hat_interp_level, post-gather
    diff = jnp.abs(pos[:, :, None, :] - rc[:, None, :, :])
    hat = jnp.prod(jnp.maximum(0.0, 1.0 - diff), axis=-1)
    return jax.lax.dot_general(
        hat.astype(jnp.bfloat16), rf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    rf = jnp.asarray(rng.randn(NGRP, CAPR, C).astype(np.float32)
                     ).astype(jnp.bfloat16)
    pos = jnp.asarray(rng.uniform(0, 6, (NGRP, P, 3)).astype(np.float32))
    rc = np.floor(rng.uniform(0, 6, (NGRP, CAPR, 3))).astype(np.float32)
    rc[:, -3:] = 1e9  # sentinel (padded) rows, as the gather produces
    return rf, jnp.asarray(rc), pos


def test_forward_matches_xla(data):
    rf, rc, pos = data
    y_pal = jax.jit(lambda *a: hat_contract_fused(*a, interpret=True))(
        rf, rc, pos)
    y_xla = jax.jit(_xla_level)(rf, rc, pos)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                               atol=1e-5, rtol=1e-5)
    # sentinel rows contribute exactly zero: zeroing their features is a
    # no-op on the output
    rf0 = rf.at[:, -3:].set(0)
    y0 = jax.jit(lambda *a: hat_contract_fused(*a, interpret=True))(
        rf0, rc, pos)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y0))


def test_grad_matches_xla(data):
    rf, rc, pos = data

    def loss_pal(rf32):
        y = hat_contract_fused(rf32.astype(jnp.bfloat16), rc, pos,
                               interpret=True)
        return jnp.sum(y * y)

    def loss_xla(rf32):
        y = _xla_level(rf32.astype(jnp.bfloat16), rc, pos)
        return jnp.sum(y * y)

    rf32 = rf.astype(jnp.float32)
    g_pal = jax.jit(jax.grad(loss_pal))(rf32)
    g_xla = jax.jit(jax.grad(loss_xla))(rf32)
    # both backwards contract a bf16-rounded hat against the f32 cotangent
    # with f32 accumulation (the pallas bwd no longer rounds g to bf16,
    # ADVICE r4) -> near-f32 agreement
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               atol=2e-4, rtol=2e-4)


def test_no_grad_through_geometry(data):
    rf, rc, pos = data

    def loss(p):
        return jnp.sum(hat_contract_fused(rf, rc, p, interpret=True))

    g = jax.jit(jax.grad(loss))(pos)
    assert float(jnp.abs(g).max()) == 0.0
