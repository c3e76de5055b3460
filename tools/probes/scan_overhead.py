"""Is there a per-iteration overhead in lax.scan on this runtime?

Usage: python _probe9.py
"""
import time, jax, jax.numpy as jnp, numpy as np


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    compile_t = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.2f} ms (compile {compile_t:.1f}s)",
          flush=True)
    return min(ts)


# 1. empty scan at several lengths
for n in (1, 8, 64, 256):
    @jax.jit
    def empty(c, n=n):
        return jax.lax.scan(lambda c, _: (c + 1.0, ()), c, None, length=n)[0]
    t = timeit(f"empty scan n={n}", empty, jnp.zeros((8, 128)))

# 2. mlp-ish op: scan vs unrolled, n=8
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(65536, 352).astype(np.float32))
w1 = jnp.asarray(rng.randn(352, 256).astype(np.float32) * 0.05)
w2 = jnp.asarray(rng.randn(256, 352).astype(np.float32) * 0.05)


def op(x):
    return jnp.tanh(x @ w1) @ w2


for n in (8,):
    @jax.jit
    def scanned(x, n=n):
        return jax.lax.scan(lambda c, _: (op(c), ()), x, None, length=n)[0]

    @jax.jit
    def unrolled(x, n=n):
        for _ in range(n):
            x = op(x)
        return x

    ts = timeit(f"mlp-op scan n={n}", scanned, x)
    tu = timeit(f"mlp-op unrolled n={n}", unrolled, x)
    print(f"  per-iter: scan {ts/n*1000:.3f} ms, unrolled {tu/n*1000:.3f} ms",
          flush=True)

# 3. gather+mm: scan vs unrolled, n=8
S, C = 16128, 32
table = jnp.asarray(rng.randn(S + 1, C).astype(np.float32))
nbr = jnp.asarray(rng.randint(0, S + 1, (S, 27)).astype(np.int32))
wg = jnp.asarray(rng.randn(27 * C, C).astype(np.float32) * 0.05)


def gop(t):
    g = t[nbr].reshape(S, 27 * C)
    y = jnp.dot(g, wg, preferred_element_type=jnp.float32)
    return jnp.concatenate([y, t[-1:]], axis=0)


@jax.jit
def gscan(t):
    return jax.lax.scan(lambda c, _: (gop(c), ()), t, None, length=8)[0]


@jax.jit
def gunroll(t):
    for _ in range(8):
        t = gop(t)
    return t


ts = timeit("gather+mm scan n=8", gscan, table)
tu = timeit("gather+mm unrolled n=8", gunroll, table)
print(f"  per-iter: scan {ts/8*1000:.3f} ms, unrolled {tu/8*1000:.3f} ms",
      flush=True)
