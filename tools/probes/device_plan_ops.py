"""Cost of the device-side hat-planning candidate ops (fresh_gap follow-up).

The fresh path is transfer-bound (12-22 MB/s tunnel): moving the hat
planner INTO the jitted step would cut the payload ~10x. Feasible iff the
planning primitives are cheap on TPU:
  * argsort / sort_key_val of 65k u32 tile keys
  * per-group segment searchsorted: ~10k queries into a ~20k-row sorted
    site-key table
  * histogram (scatter-add) of 65k keys into ~512 tile bins + cumsum

Each measured with a lax.scan chain of N dependent iterations and ONE
scalar fetch (CLAUDE.md RTT methodology).

Usage: python tools/probes/device_plan_ops.py [--cpu]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed_scan(fn, x0, n=64):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    r = run(x0)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))   # compile+warm
    t0 = time.perf_counter()
    r = run(x0)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    dt = time.perf_counter() - t0
    rtt = 0.023
    return max(dt - rtt, 0.0) / n * 1000


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    N = 65536
    NTILES = 512
    NSITES = 20000
    NQ = 10240

    rng = np.random.RandomState(0)
    keys0 = jnp.asarray(rng.randint(0, NTILES, N).astype(np.uint32))
    sites = jnp.asarray(np.sort(rng.randint(0, 1 << 20, NSITES)
                                ).astype(np.int32))
    queries0 = jnp.asarray(rng.randint(0, 1 << 20, NQ).astype(np.int32))

    ms = timed_scan(
        lambda k: jnp.argsort(k).astype(jnp.uint32), keys0)
    print(f"argsort[{N}] u32: {ms:.2f} ms", flush=True)

    ms = timed_scan(
        lambda k: jax.lax.sort_key_val(
            k, jnp.arange(N, dtype=jnp.int32))[1].astype(jnp.uint32),
        keys0)
    print(f"sort_key_val[{N}]: {ms:.2f} ms", flush=True)

    ms = timed_scan(
        lambda q: jnp.searchsorted(sites, q).astype(jnp.int32), queries0)
    print(f"searchsorted[{NQ} into {NSITES}]: {ms:.2f} ms", flush=True)

    def hist(k):
        h = jnp.zeros((NTILES,), jnp.int32).at[k.astype(jnp.int32)].add(1)
        return (k + jnp.cumsum(h)[k.astype(jnp.int32)].astype(jnp.uint32))
    ms = timed_scan(hist, keys0)
    print(f"hist+cumsum+gather[{N}->{NTILES}]: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
