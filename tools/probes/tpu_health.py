"""Tiny TPU claim check: init backend, one matmul, one scalar fetch, exit.

Exits 0 with a one-line latency report, or nonzero with the error. Safe to
run after a suspected claim wedge — finishes in seconds once the claim is
grantable and never needs an external kill.

Usage: python tools/probes/tpu_health.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    t1 = time.perf_counter()
    x = jnp.ones((256, 256))
    v = float(jnp.sum(x @ x))
    t2 = time.perf_counter()
    print(f"ok platform={dev.platform} init={t1 - t0:.1f}s "
          f"matmul+fetch={t2 - t1:.2f}s value={v:.0f}")


if __name__ == "__main__":
    main()
