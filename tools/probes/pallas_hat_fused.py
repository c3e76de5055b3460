"""Pallas fused hat-weight+contraction kernel vs the XLA formulation.

The hat interpolation's device cost per level is: two row gathers
(rf=feats[rows], rc=sites[rows] — stays in XLA; Pallas vector gathers are
unsupported on this stack, CLAUDE.md), the hat weight build
w = prod_axis max(0, 1-|pos-rc|)  -> [ngrp, P, capR]  (VPU, HBM-materialized
between XLA fusions), and the grouped contraction w @ rf (MXU). The fused
kernel computes w tile-by-tile in VMEM and feeds the MXU directly — the
[ngrp, P, capR] weight tensor never touches HBM.

Usage: python tools/probes/pallas_hat_fused.py [fwd|bwd] [interpret]
Times both formulations per level at the reference working point via scan
chains (one scalar fetch; CLAUDE.md RTT rules). Self-limiting; no timeout.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# reference working point (2D (4,8) tiles, P=128): ngrp x (capR_l, C_l)
NGRP, P = 658, 128
LEVELS = [(1024, 32), (640, 64), (320, 128), (128, 128)]


def scan_time(name, step, init, n=12):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), ()), c, None, length=n)[0]
    t0 = time.perf_counter()
    out = run(init)
    _ = float(jax.tree.leaves(out)[0].sum())
    print(f"{name} compile {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(init)
        _ = float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) / n * 1000:.3f} ms/iter", flush=True)
    return min(ts) / n


def xla_level(rf, rc, pos):
    """The current ops/hat_interp.py:hat_interp_level contraction (post-
    gather): bf16 rf, f32 rc/pos."""
    diff = jnp.abs(pos[:, :, None, :] - rc[:, None, :, :])
    hat = jnp.prod(jnp.maximum(0.0, 1.0 - diff), axis=-1)
    return jax.lax.dot_general(
        hat.astype(jnp.bfloat16), rf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def make_pallas_level(interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(posT_ref, rcT_ref, rf_ref, o_ref):
        # posT [1, 3, P], rcT [1, 3, capR] — axis-major so the broadcast
        # subtract runs lane-parallel over capR
        w = jnp.ones((), jnp.float32)
        for a in range(3):
            d = jnp.abs(posT_ref[0, a, :][:, None]
                        - rcT_ref[0, a, :][None, :])
            w = w * jnp.maximum(0.0, 1.0 - d)          # [P, capR]
        o_ref[0] = jnp.dot(w.astype(jnp.bfloat16), rf_ref[0],
                           preferred_element_type=jnp.float32)

    def op(rf, rcT, posT):
        ngrp, capR, C = rf.shape
        return pl.pallas_call(
            kernel,
            grid=(ngrp,),
            in_specs=[
                pl.BlockSpec((1, 3, P), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, capR), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, capR, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ngrp, P, C), jnp.float32),
            interpret=interpret,
        )(posT, rcT, rf)

    return op


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    interpret = "interpret" in sys.argv[1:]
    rng = np.random.RandomState(0)
    op = make_pallas_level(interpret)

    for capR, C in LEVELS:
        rf = jnp.asarray(rng.randn(NGRP, capR, C).astype(np.float32)
                         ).astype(jnp.bfloat16)
        # positions/coords in a [0, 32)^3 box so hats overlap realistically
        pos = jnp.asarray(rng.uniform(0, 32, (NGRP, P, 3)).astype(np.float32))
        rc = jnp.asarray(rng.uniform(0, 32, (NGRP, capR, 3)).astype(np.float32))
        posT = jnp.swapaxes(pos, 1, 2)
        rcT = jnp.swapaxes(rc, 1, 2)

        y_ref = jax.jit(xla_level)(rf, rc, pos)
        try:
            y_pal = jax.jit(op)(rf, rcT, posT)
        except Exception as e:
            print(f"L(capR={capR},C={C}) pallas FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        err = float(jnp.abs(y_pal - y_ref).max())
        print(f"L(capR={capR},C={C}) max err {err:.2e}", flush=True)

        if mode == "fwd":
            init = jnp.zeros((NGRP, P, C), jnp.float32)
            scan_time(f"  xla    capR={capR} C={C}",
                      lambda c, rf=rf, rc=rc, pos=pos:
                      xla_level(rf, rc, pos + 1e-12 * c[0, 0, 0]), init)
            scan_time(f"  pallas capR={capR} C={C}",
                      lambda c, rf=rf, rcT=rcT, posT=posT:
                      op(rf, rcT, posT + 1e-12 * c[0, 0, 0]), init)
        else:
            def xloss(rf, rc=rc, pos=pos):
                return jnp.sum(xla_level(rf.astype(jnp.bfloat16),
                                         rc, pos) ** 2)

            def ploss(rf, rcT=rcT, posT=posT):
                return jnp.sum(op(rf.astype(jnp.bfloat16), rcT, posT) ** 2)
            scan_time(f"  xla+bwd    capR={capR} C={C}",
                      lambda c: jax.grad(xloss)(c),
                      rf.astype(jnp.float32))
            try:
                scan_time(f"  pallas+bwd capR={capR} C={C}",
                          lambda c: jax.grad(ploss)(c),
                          rf.astype(jnp.float32))
            except Exception as e:
                print(f"  pallas bwd FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
