"""Measure TPU gather rate vs row width and dtype, plus scatter-add and
copy bandwidth — the cost model every sparse-conv formulation decision
rests on.

Usage: python tools/probes/gather_rate.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N = 32


def scan_time(step, init_carry, n=N):
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=n)
        return c

    out = run(init_carry)
    _ = float(jax.tree.leaves(out)[0].sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(init_carry)
        _ = float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def main():
    rng = np.random.RandomState(0)
    S = 16384
    R = 435456  # L1 27-tap row count
    idx = jnp.asarray(rng.randint(0, S, R).astype(np.int32))
    print("== gather: R=435k rows from a 16k-row table ==", flush=True)
    for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for width in (16, 32, 64, 96, 128, 192, 256, 384):
            tbl = jnp.asarray(rng.randn(S, width), dtype=dtype)

            def step(c, tbl=tbl):
                g = (tbl + c)[idx]
                return (g[0, 0] * 1e-20).astype(dtype)

            t = scan_time(step, jnp.zeros((), dtype))
            bytes_ = R * width * tbl.dtype.itemsize
            print(f"  {dname} w={width:4d} ({width*tbl.dtype.itemsize:5d}B)"
                  f" {t*1e3:7.3f} ms  {t/R*1e9:5.2f} ns/row "
                  f"{bytes_/t/1e9:6.1f} GB/s", flush=True)

    print("== gather: fewer rows, wider (same 56 MB) ==", flush=True)
    for rows, width in ((435456, 32), (145152, 96), (48384, 288),
                        (16128, 864)):
        idx2 = jnp.asarray(rng.randint(0, S, rows).astype(np.int32))
        tbl = jnp.asarray(rng.randn(S, width).astype(np.float32))

        def step(c, tbl=tbl, idx2=idx2):
            g = (tbl + c)[idx2]
            return jnp.float32(g[0, 0] * 1e-20)

        t = scan_time(step, jnp.float32(0.0))
        print(f"  f32 rows={rows:6d} w={width:4d} {t*1e3:7.3f} ms "
              f"{t/rows*1e9:6.2f} ns/row {rows*width*4/t/1e9:6.1f} GB/s",
              flush=True)

    print("== scatter-add: 145k unique-ish rows into 16k x w ==", flush=True)
    rows = 145152
    sidx = jnp.asarray(rng.randint(0, S, rows).astype(np.int32))
    for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for width in (32, 64, 128):
            v = jnp.asarray(rng.randn(rows, width), dtype=dtype)

            def step(c, v=v):
                out = jnp.zeros((S, width), dtype).at[sidx].add(v + c)
                return (out[0, 0] * 1e-20).astype(dtype)

            t = scan_time(step, jnp.zeros((), dtype))
            b = rows * width * v.dtype.itemsize
            print(f"  {dname} w={width:4d} {t*1e3:7.3f} ms "
                  f"{b/t/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
