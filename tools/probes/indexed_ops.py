"""TPU microbench: gather/scatter/dense-conv strategies for the encoder.

Usage: python _probe2.py <which>
  gathers   - per-level XLA gather+matmul timings
  scatter   - sorted-unique scatter (densify codes) timings
  dconv     - dense conv_general_dilated per level, f32 + bf16
  pallas    - fixed pallas VMEM gather+matmul kernel
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# (S_cap, Cin, Cout) per level from the synthetic 5mm batch
LEVELS = [
    (6656, 16, 16),    # L0 subm
    (16128, 32, 32),   # L1 subm
    (9984, 64, 64),    # L2 subm
    (3072, 128, 128),  # L3 subm
    (1024, 128, 128),  # L4 subm
]
OUT_SH = (96, 384, 128)


def timed(name, f, *a, n=5):
    t0 = time.perf_counter()
    out = f(*a)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).sum())
    print(f"{name} compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = f(*a)
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.3f} ms", flush=True)


def probe_gathers():
    rng = np.random.RandomState(0)
    for (S, C, CO) in LEVELS:
        table = jnp.asarray(rng.randn(S + 1, C).astype(np.float32))
        nbr = jnp.asarray(rng.randint(0, S + 1, (S, 27)).astype(np.int32))
        w = jnp.asarray(rng.randn(27 * C, CO).astype(np.float32) * 0.1)

        def f(table, nbr, w, S=S, C=C):
            g = table[nbr].reshape(S, 27 * C)
            return jnp.dot(g, w, preferred_element_type=jnp.float32)

        timed(f"gather+mm S={S} C={C}", jax.jit(f), table, nbr, w)

        # gather only
        def g(table, nbr):
            return table[nbr]
        timed(f"gather-only S={S} C={C}", jax.jit(g), table, nbr)


def probe_scatter():
    rng = np.random.RandomState(0)
    D, H, W = OUT_SH
    S, C = 6656, 16
    # sorted unique linear sites
    lin = np.sort(rng.choice(D * H * W, S, replace=False)).astype(np.int32)
    sites = np.stack([lin // (H * W), (lin // W) % H, lin % W], -1)
    sites = jnp.asarray(sites.astype(np.int32))
    feats = jnp.asarray(rng.randn(S, C).astype(np.float32))

    def scat_set(feats, sites):
        vol = jnp.zeros((D, H, W, C), feats.dtype)
        return vol.at[sites[:, 0], sites[:, 1], sites[:, 2]].set(
            feats, mode="drop", unique_indices=True, indices_are_sorted=True)

    def scat_add(feats, sites):
        vol = jnp.zeros((D, H, W, C), feats.dtype)
        return vol.at[sites[:, 0], sites[:, 1], sites[:, 2]].add(
            feats, mode="drop")

    def scat_lin_set(feats, lin):
        vol = jnp.zeros((D * H * W, C), feats.dtype)
        return vol.at[lin].set(feats, mode="drop", unique_indices=True,
                               indices_are_sorted=True)

    timed("scatter set sorted+unique", jax.jit(scat_set), feats, sites)
    timed("scatter add (dup ok)", jax.jit(scat_add), feats, sites)
    timed("scatter 1d-lin set sorted", jax.jit(scat_lin_set), feats,
          jnp.asarray(lin))


def probe_dconv():
    rng = np.random.RandomState(0)
    for lvl, (S, C, CO) in enumerate(LEVELS):
        sh = tuple(s // (2 ** max(lvl, 1)) for s in OUT_SH) if lvl else OUT_SH
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.randn(1, *sh, C).astype(np.float32)).astype(dt)
            w = jnp.asarray(
                rng.randn(3, 3, 3, C, CO).astype(np.float32) * 0.1).astype(dt)

            def f(x, w):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32)

            timed(f"dense conv L{lvl} {sh} C{C}->{CO} {dt.__name__}",
                  jax.jit(f), x, w)


def probe_pallas():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    for (S, C, CO) in LEVELS:
        Sp = -(-S // 512) * 512
        BLK = 512
        table = jnp.asarray(rng.randn(Sp + 8, C).astype(np.float32))
        nbr = jnp.asarray(rng.randint(0, Sp, (Sp, 27)).astype(np.int32))
        w = jnp.asarray(rng.randn(27 * C, CO).astype(np.float32) * 0.1)

        def pallas_conv(table, nbr, w, Sp=Sp, C=C, CO=CO):
            def kernel(tab_ref, nbr_ref, w_ref, out_ref):
                rows = nbr_ref[...].reshape(-1)          # [BLK*27]
                g = tab_ref[rows]                        # [BLK*27, C]
                g = g.reshape(BLK, 27 * C)
                out_ref[...] = jnp.dot(g, w_ref[...],
                                       preferred_element_type=jnp.float32)

            return pl.pallas_call(
                kernel,
                grid=(Sp // BLK,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, 27), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, CO), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Sp, CO), jnp.float32),
            )(table, nbr, w)

        try:
            timed(f"pallas gather+mm S={Sp} C={C}", jax.jit(pallas_conv),
                  table, nbr, w)
        except Exception as e:
            print(f"pallas S={Sp} C={C} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break


if __name__ == "__main__":
    {"gathers": probe_gathers, "scatter": probe_scatter,
     "dconv": probe_dconv, "pallas": probe_pallas}[sys.argv[1]]()
