"""Scatter-add cost vs index collision pattern (hat-interp backward shape).

Usage: python tools/probes/scatter_collision.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 32


def scan_time(name, step, init_carry, n=N):
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
    print(f"{name}: {min(ts)/n*1000:.3f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    S, R, C = 16128, 658 * 192, 32   # L1 hat bwd shape
    v = jnp.asarray(rng.randn(R, C).astype(np.float32))

    variants = {
        "random rows":
            rng.randint(0, S, R).astype(np.int32),
        "33% on ONE dump row":
            np.where(rng.rand(R) < 0.33, S,
                     rng.randint(0, S, R)).astype(np.int32),
        "33% spread over 512 dump rows":
            np.where(rng.rand(R) < 0.33, S + rng.randint(0, 512, R),
                     rng.randint(0, S, R)).astype(np.int32),
        "33% dropped (oob)":
            np.where(rng.rand(R) < 0.33, 2 ** 30,
                     rng.randint(0, S, R)).astype(np.int32),
    }
    for name, idx in variants.items():
        idxj = jnp.asarray(idx)

        def step(c, idxj=idxj):
            out = jnp.zeros((S + 513, C), jnp.float32).at[idxj].add(
                v + c, mode="drop")
            return jnp.float32(out[0, 0] * 1e-20)

        scan_time(f"scatter {R}x{C} f32, {name}", step, jnp.float32(0.0))


if __name__ == "__main__":
    main()
