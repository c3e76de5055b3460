"""Platform selection guard.

The axon TPU plugin force-sets jax_platforms at import time, overriding the
JAX_PLATFORMS environment variable. This helper re-asserts the user's choice
after jax import (tools and tests need CPU determinism on demand).
"""
import os


def ensure_platform():
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
