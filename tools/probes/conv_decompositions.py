"""Probe: slice-gathers, conv2d-decomposed 3D conv, shifted-matmul conv.

Usage: python _probe7.py <slicegather|conv2d|shiftmm> [N]
"""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np

which = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
OUT_SH = (96, 384, 128)


def scan_time(name, step, init, n=N):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), ()), c, None, length=n)[0]
    t0 = time.perf_counter(); out = run(init)
    _ = float(jax.tree.leaves(out)[0].sum())
    print(f"{name} compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = run(init)
        _ = float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)/n*1000:.3f} ms/iter", flush=True)


if which == "slicegather":
    rng = np.random.RandomState(0)
    # L1 dense volume, gather 1024 haloed 10x10x10 block regions
    D, H, W, C = 48, 192, 64, 32
    vol0 = jnp.asarray(rng.randn(D, H, W, C).astype(np.float32))
    nblk = 1024
    starts = np.stack([rng.randint(0, D - 10, nblk),
                       rng.randint(0, H - 10, nblk),
                       rng.randint(0, W - 10, nblk)], -1).astype(np.int32)
    starts = jnp.asarray(starts)

    def block_gather(vol, starts):
        def one(s):
            return jax.lax.dynamic_slice(vol, (s[0], s[1], s[2], 0),
                                         (10, 10, 10, C))
        return jax.vmap(one)(starts)          # [nblk, 10,10,10, C]

    def step(vol):
        blocks = block_gather(vol, starts)
        return vol + jnp.sum(blocks) * 1e-20
    scan_time(f"slice-gather {nblk}x10^3x{C} (131MB)", step, vol0)

    # same via lax.gather with big slice_sizes
    def gather_big(vol, starts):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        return jax.lax.gather(vol, starts, dn, (10, 10, 10, C),
                              mode=jax.lax.GatherScatterMode.CLIP)
    def step2(vol):
        blocks = gather_big(vol, starts)
        return vol + jnp.sum(blocks) * 1e-20
    scan_time(f"lax.gather slices {nblk}x10^3x{C}", step2, vol0)

    # 65k points, gather 2x2x2xC corner cubes (one slice-gather per point)
    NP = 65536
    pstarts = np.stack([rng.randint(0, D - 2, NP),
                        rng.randint(0, H - 2, NP),
                        rng.randint(0, W - 2, NP)], -1).astype(np.int32)
    pstarts = jnp.asarray(pstarts)
    def corner_gather(vol, ps):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        return jax.lax.gather(vol, ps, dn, (2, 2, 2, C),
                              mode=jax.lax.GatherScatterMode.CLIP)
    def step3(vol):
        cubes = corner_gather(vol, pstarts)
        return vol + jnp.sum(cubes) * 1e-20
    scan_time(f"corner-cube gather {NP}x2^3x{C} (67MB)", step3, vol0)

elif which == "conv2d":
    rng = np.random.RandomState(0)
    for lvl, (C, CO) in enumerate([(16, 16), (32, 32), (64, 64),
                                   (128, 128), (128, 128)]):
        sh = tuple(s // (2 ** max(lvl, 1)) for s in OUT_SH) if lvl else OUT_SH
        for dt in (jnp.float32, jnp.bfloat16):
            x0 = jnp.asarray(
                rng.randn(*sh, C).astype(np.float32)).astype(dt)
            w = jnp.asarray(rng.randn(3, 3, 3, C, CO).astype(
                np.float32) * 0.02).astype(dt)

            def conv3d_via_2d(x, w=w, dt=dt):
                # treat D as batch; sum three D-shifted 2D convs
                outs = 0.0
                for a in (-1, 0, 1):
                    xs = jnp.roll(x, -a, axis=0)  # cheap approx of shift+mask
                    y = jax.lax.conv_general_dilated(
                        xs, w[a + 1], (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=dt)
                    outs = outs + y
                return outs

            def step(x):
                y = conv3d_via_2d(x)
                return x + y * 1e-12
            scan_time(f"conv2d-decomp L{lvl} {sh} C{C} {dt.__name__}",
                      step, x0)

elif which == "shiftmm":
    rng = np.random.RandomState(0)
    for lvl, (C, CO) in enumerate([(16, 16), (32, 32), (64, 64)]):
        sh = tuple(s // (2 ** max(lvl, 1)) for s in OUT_SH) if lvl else OUT_SH
        D, H, W = sh
        for dt in (jnp.bfloat16,):
            x0 = jnp.asarray(
                rng.randn(D * H * W, C).astype(np.float32)).astype(dt)
            w = jnp.asarray(rng.randn(27, C, CO).astype(
                np.float32) * 0.02).astype(dt)

            def conv_shiftmm(x, w=w, D=D, H=H, W=W, dt=dt):
                # y = sum_k shift_k(x) @ W_k ; shift via flat roll (approx)
                y = 0.0
                k = 0
                for dd in (-1, 0, 1):
                    for dh in (-1, 0, 1):
                        for dw in (-1, 0, 1):
                            off = (dd * H + dh) * W + dw
                            xs = jnp.roll(x, -off, axis=0)
                            y = y + jnp.dot(xs, w[k],
                                            preferred_element_type=dt)
                            k += 1
                return y

            def step(x):
                return x + conv_shiftmm(x) * 1e-12
            scan_time(f"shift-mm L{lvl} {sh} C{C} {dt.__name__}",
                      step, x0, n=max(2, N // 2) if lvl == 0 else N)
