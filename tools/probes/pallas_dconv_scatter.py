"""Scan-timed probes: pallas dynamic_gather kernel, dense conv, scatter,
dense grid_sample. One dispatch x N iters with dependent carry.

Usage: python _probe5.py <which> [N]
  pgather | dconv | scatter | gsample
"""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np

which = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16
OUT_SH = (96, 384, 128)


def scan_time(name, step, init_carry, n=N):
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=n)
        return c
    t0 = time.perf_counter()
    out = run(init_carry)
    _ = float(jax.tree.leaves(out)[0].sum())
    print(f"{name} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(init_carry)
        _ = float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/n*1000:.3f} ms/iter", flush=True)


def probe_pgather():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    for (S, C, CO) in [(6656, 16, 16), (16128, 32, 32), (9984, 64, 64),
                       (3072, 128, 128)]:
        BLK = 640                      # gather rows per block = BLK*27
        GR = BLK * 27                  # 17280
        T = GR                         # table padded to GR rows
        Sp = -(-S // BLK) * BLK
        table = jnp.asarray(rng.randn(T, C).astype(np.float32))
        nbr = jnp.asarray(rng.randint(0, S, (Sp, 27)).astype(np.int32))
        w = jnp.asarray(rng.randn(27 * C, CO).astype(np.float32) * 0.1)

        def pconv(table, nbr, w, Sp=Sp, C=C, CO=CO, BLK=BLK, GR=GR):
            def kernel(tab_ref, nbr_ref, w_ref, out_ref):
                rows = nbr_ref[...].reshape(GR)             # [GR]
                idx = jnp.broadcast_to(rows[:, None], (GR, C))
                g = jnp.take_along_axis(tab_ref[...], idx, axis=0)
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
            def step(t, pconv=pconv, nbr=nbr, w=w, T=T):
                y = pconv(t, nbr, w)
                return jnp.concatenate(
                    [y[:T], jnp.zeros((max(T - y.shape[0], 0), y.shape[1]),
                                      y.dtype)], axis=0)[:T, :t.shape[1]] + t * 1e-9
            # simpler dependent carry: feed sum back
            def step2(t, pconv=pconv, nbr=nbr, w=w):
                y = pconv(t, nbr, w)
                return t + jnp.sum(y) * 1e-20
            scan_time(f"pallas dyn-gather S={Sp} C={C}",
                      step2, table)
        except Exception as e:
            print(f"pallas S={S} C={C} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def probe_dconv():
    rng = np.random.RandomState(0)
    for lvl, (C, CO) in enumerate([(16, 16), (32, 32), (64, 64),
                                   (128, 128), (128, 128)]):
        sh = tuple(s // (2 ** max(lvl, 1)) for s in OUT_SH) if lvl else OUT_SH
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.randn(1, *sh, C).astype(np.float32)).astype(dt)
            w = jnp.asarray(
                rng.randn(3, 3, 3, C, CO).astype(np.float32) * 0.01).astype(dt)

            def step(x, w=w, dt=dt):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=dt)
                return y

            scan_time(f"dense conv L{lvl} {sh} C{C} {dt.__name__}",
                      step, x, n=max(4, N // 4) if lvl == 0 else N)


def probe_scatter():
    rng = np.random.RandomState(0)
    D, H, W = OUT_SH
    S, C = 6656, 16
    lin = np.sort(rng.choice(D * H * W, S, replace=False)).astype(np.int32)
    sites = np.stack([lin // (H * W), (lin // W) % H, lin % W], -1)
    sites = jnp.asarray(sites.astype(np.int32))
    feats0 = jnp.asarray(rng.randn(S, C).astype(np.float32))

    def step(feats, sites=sites):
        vol = jnp.zeros((D, H, W, C), feats.dtype)
        vol = vol.at[sites[:, 0], sites[:, 1], sites[:, 2]].set(
            feats, mode="drop", unique_indices=True, indices_are_sorted=True)
        return feats + jnp.sum(vol) * 1e-20

    scan_time("scatter set sorted+unique 6656x16", step, feats0)


def probe_gsample():
    from neuralbody_tpu.ops.grid_sample import grid_sample_3d
    rng = np.random.RandomState(0)
    NPTS = 65536
    for lvl, C in [(1, 32), (2, 64), (3, 128), (4, 128)]:
        sh = tuple(s // (2 ** lvl) for s in OUT_SH)
        vol0 = jnp.asarray(rng.randn(*sh, C).astype(np.float32))
        gc = jnp.asarray(rng.uniform(-1, 1, (NPTS, 3)).astype(np.float32))

        def f(vol):
            return jnp.sum(grid_sample_3d(vol, gc))

        def step_fwd(vol):
            return vol + f(vol) * 1e-20
        scan_time(f"grid_sample fwd L{lvl} {sh} C{C}", step_fwd, vol0)

        def step_bwd(vol):
            return vol + jax.grad(f)(vol) * 1e-20
        scan_time(f"grid_sample fwd+bwd L{lvl} {sh} C{C}", step_bwd, vol0)


{"pgather": probe_pgather, "dconv": probe_dconv, "scatter": probe_scatter,
 "gsample": probe_gsample}[which]()
