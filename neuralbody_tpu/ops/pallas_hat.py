"""Fused Pallas kernel for the grouped hat contraction (TPU hot path).

The XLA formulation of one hat-interpolation level (ops/hat_interp.py:
hat_interp_level) materializes the [ngrp, P, capR] hat-weight tensor in HBM
between the VPU weight fusion and the MXU contraction. This kernel computes
the weights tile-by-tile in VMEM and feeds the MXU directly, so the weight
tensor never touches HBM — measured ~2x on the contraction at the reference
working point (tools/probes/pallas_hat_fused.py: L1 0.75 -> 0.36 ms,
L2 0.71 -> 0.34, RTT-corrected; exact parity, max err 0).

Scope: the post-gather contraction only. The row gathers rf = feats[rows],
rc = sites[rows] stay in XLA — Pallas vector gathers are unsupported on
this stack ("Cannot do int indexing on TPU", CLAUDE.md).

Backward: the hat weights depend only on ray geometry (pos) and site
coords (rc), neither of which carries parameter gradients — the only
cotangent needed is d_rf = w^T @ g, computed by a second kernel that
recomputes the weights in VMEM (same trick as the forward; residuals are
just the inputs). Gradients w.r.t. rcT/posT are structural zeros.

Used by hat_interp_level when EncoderStatic.use_pallas is set, the feature
dtype is bfloat16 (the production config), and the backend is TPU; the XLA
path remains the reference implementation and the CPU/f32 fallback.
(ref semantics: zeros-padded align_corners grid_sample,
lib/networks/latent_xyzc.py:62-72 — see ops/hat_interp.py.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _hat_w(posT, rcT):
    """[P, capR] trilinear hat weights from axis-major [3, P] / [3, capR]."""
    w = jnp.ones((), jnp.float32)
    for a in range(3):
        d = jnp.abs(posT[a, :][:, None] - rcT[a, :][None, :])
        w = w * jnp.maximum(0.0, 1.0 - d)
    return w


def _fwd_kernel(posT_ref, rcT_ref, rf_ref, o_ref):
    w = _hat_w(posT_ref[0], rcT_ref[0])
    o_ref[0] = jnp.dot(w.astype(jnp.bfloat16), rf_ref[0],
                       preferred_element_type=jnp.float32)


def _bwd_kernel(posT_ref, rcT_ref, g_ref, drf_ref):
    # g stays f32 (ADVICE r4): the XLA backward contracts the f32
    # cotangent; rounding it to bf16 here lost gradient precision (tests
    # needed 2e-2 tolerance). Only the hat weights drop to bf16, matching
    # the forward's operand precision.
    w = _hat_w(posT_ref[0], rcT_ref[0])
    # bf16-round w (the forward's operand precision), then promote for an
    # f32 dot — exactly the XLA mixed bf16xf32 backward contraction.
    drf_ref[0] = jnp.dot(w.astype(jnp.bfloat16).T.astype(jnp.float32),
                         g_ref[0],
                         preferred_element_type=jnp.float32
                         ).astype(drf_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_op(interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def call(kernel, out_dtype, posT, rcT, x):
        ngrp, _, P = posT.shape
        capR = rcT.shape[2]
        C = x.shape[2]
        out_rows = capR if kernel is _bwd_kernel else P
        return pl.pallas_call(
            kernel,
            grid=(ngrp,),
            in_specs=[
                pl.BlockSpec((1, 3, P), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, capR), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, x.shape[1], C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, out_rows, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ngrp, out_rows, C), out_dtype),
            interpret=interpret,
        )(posT, rcT, x)

    @jax.custom_vjp
    def op(rf, rcT, posT):
        return call(_fwd_kernel, jnp.float32, posT, rcT, rf)

    def fwd(rf, rcT, posT):
        # rf[:0]: zero-size dtype carrier (dtypes aren't valid residuals)
        return op(rf, rcT, posT), (rf[:0], rcT, posT)

    def bwd(res, g):
        rf0, rcT, posT = res
        drf = call(_bwd_kernel, rf0.dtype, posT, rcT, g)
        return drf, jnp.zeros_like(rcT), jnp.zeros_like(posT)

    op.defvjp(fwd, bwd)
    return op


def hat_contract_fused(rf, rc, pos, interpret: bool = False):
    """out[g] = hatweights(pos[g], rc[g]) @ rf[g], fused in VMEM.

    Args:
      rf:  [ngrp, capR, C] bfloat16 gathered site features (padded rows 0).
      rc:  [ngrp, capR, 3] float32 gathered site coords (padding 1e9 ->
           weight exactly 0, matching the XLA path's sentinel).
      pos: [ngrp, P, 3] float32 level-grid positions.
      interpret: run in Pallas interpret mode (CPU tests).

    Returns [ngrp, P, C] float32. Differentiable w.r.t. rf only: rc/pos
    pass through stop_gradient (ADVICE r4) so a future differentiable-
    geometry caller (e.g. pose optimization) gets the standard symbolic-
    zero treatment at THIS boundary instead of the custom VJP's silent
    structural zeros diverging from the XLA path's nonzero geometry grads.
    """
    op = _make_op(bool(interpret))
    rc = jax.lax.stop_gradient(rc)
    pos = jax.lax.stop_gradient(pos)
    return op(rf, jnp.swapaxes(rc, 1, 2), jnp.swapaxes(pos, 1, 2))
