"""Which conv contraction avoids XLA relayout copies after the gather?

(a) [S,27,C] dot_general contracting (1,2)  (current)
(b) [27,S,C] batched matmul + sum over taps
(c) reshape [S,27C] @ [27C,O]
"""
import time, jax, jax.numpy as jnp, numpy as np

S, C, O = 16128, 32, 32
N = 16
rng = np.random.RandomState(0)
table = jnp.asarray(rng.randn(S + 1, C).astype(np.float32))
nbr = jnp.asarray(rng.randint(0, S + 1, (S, 27)).astype(np.int32))
nbrT = jnp.asarray(np.ascontiguousarray(np.asarray(nbr).T))
w = jnp.asarray(rng.randn(27, C, O).astype(np.float32) * 0.05)


def scan_time(name, step, init):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), ()), c, None, length=N)[0]
    t0 = time.perf_counter(); out = run(init)
    _ = float(out.sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = run(init)
        _ = float(out.sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/N*1000:.3f} ms/iter (incl ~1.4 RTT/N)",
          flush=True)


def pad_t(t):
    return jnp.concatenate([t, jnp.zeros_like(t[:1])], axis=0)


def f_a(t):
    g = pad_t(t)[nbr]                       # [S,27,C]
    y = jax.lax.dot_general(g, w, (((1, 2), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.concatenate([y, t[-1:]], axis=0)


def f_b(t):
    g = pad_t(t)[nbrT]                      # [27,S,C]
    y = jax.lax.dot_general(g, w, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return jnp.concatenate([jnp.sum(y, axis=0), t[-1:]], axis=0)


def f_c(t):
    g = pad_t(t)[nbr].reshape(S, 27 * C)
    y = jnp.dot(g, w.reshape(27 * C, O), preferred_element_type=jnp.float32)
    return jnp.concatenate([y, t[-1:]], axis=0)


ya = jax.jit(f_a)(table); yb = jax.jit(f_b)(table); yc = jax.jit(f_c)(table)
print("b-a", float(jnp.abs(ya - yb).max()), "c-a",
      float(jnp.abs(ya - yc).max()), flush=True)
scan_time("(a) dot_general (1,2)x(0,1)", f_a, table)
scan_time("(b) [27,S,C] batched + sum", f_b, table)
scan_time("(c) reshape [S,27C] matmul", f_c, table)
