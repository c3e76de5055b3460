"""Microbenchmark: Pallas VMEM gather+matmul vs XLA gather for sparse conv.

Shapes: table [S+1, C] gathered by nbr [S, 27] then [S, 27C] @ [27C, Cout].
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, C, COUT = 16128, 32, 32
BLK = 512


def xla_conv(table, nbr, w):
    g = table[nbr]                                  # [S, 27, C]
    return jnp.dot(g.reshape(S, 27 * C), w.reshape(27 * C, COUT),
                   preferred_element_type=jnp.float32)


def pallas_conv(table, nbr, w):
    def kernel(tab_ref, nbr_ref, w_ref, out_ref):
        rows = nbr_ref[...]                         # [BLK, 27] int32
        g = tab_ref[rows.reshape(-1)]               # [BLK*27, C]
        g = g.reshape(BLK, 27 * C)
        out_ref[...] = jnp.dot(g, w_ref[...],
                               preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(S // BLK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # full table resident
            pl.BlockSpec((BLK, 27), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full weight
        ],
        out_specs=pl.BlockSpec((BLK, COUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, COUT), jnp.float32),
    )(table, nbr, w)


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(S + 1, C).astype(np.float32))
    nbr = jnp.asarray(rng.randint(0, S + 1, (S, 27)).astype(np.int32))
    w = jnp.asarray(rng.randn(27, C, COUT).astype(np.float32) * 0.1)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"

    def timed(name, f):
        t0 = time.perf_counter()
        out = f(table, nbr, w)
        ok = float(jnp.sum(out))
        print(f"{name} compile+first {time.perf_counter()-t0:.1f}s "
              f"(sum {ok:.1f})", flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(table, nbr, w)
            _ = float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1000:.3f} ms", flush=True)
        return out

    outs = {}
    if which in ("xla", "both"):
        outs["xla"] = timed("xla gather+matmul", jax.jit(xla_conv))
    if which in ("pallas", "both"):
        outs["pallas"] = timed("pallas gather+matmul", jax.jit(pallas_conv))
    if len(outs) == 2:
        err = float(jnp.abs(outs["xla"] - outs["pallas"]).max())
        print(f"max abs diff: {err:.2e}")


if __name__ == "__main__":
    main()
