"""Tiny functional NN helpers: dense (1x1-conv-equivalent) layers.

The reference uses nn.Conv1d(k=1) as point-wise linears over [B, C, N]
(ref: lib/networks/latent_xyzc.py:20-28); here points are rows [N, C] so a
layer is a plain [Cin, Cout] matmul — the natural MXU mapping.
"""
import jax
import jax.numpy as jnp


def dense_init(key, cin, cout):
    """torch Conv1d/Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(float(cin))
    return {
        "w": jax.random.uniform(kw, (cin, cout), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (cout,), minval=-bound, maxval=bound),
    }


def mxu_dtype(compute_dtype: str):
    """Dtype for matmul operands: bf16 on TPU when requested (single-pass
    MXU, f32 accumulation), f32 otherwise (CPU lacks BF16xBF16=F32 dots;
    f32 Precision.DEFAULT there is exact enough for tests)."""
    if compute_dtype == "bfloat16" and jax.default_backend() == "tpu":
        return jnp.bfloat16
    return jnp.float32


def dense(layer, x, dt=None):
    """Pointwise linear; dt=bf16 casts operands (f32 accumulate + f32 bias)."""
    w = layer["w"]
    if dt is not None:
        x = x.astype(dt)
        w = w.astype(dt)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + layer["b"]


def embedding_init(key, num, dim):
    """torch nn.Embedding default init: N(0, 1)."""
    return jax.random.normal(key, (num, dim))
