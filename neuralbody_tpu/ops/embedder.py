"""NeRF positional (frequency) encoding.

Output layout matches the reference embedder exactly for weight-transplant
parity (ref: lib/networks/embedder.py:10-36): per input of width d the output
is [x, sin(x*2^0), cos(x*2^0), ..., sin(x*2^{L-1}), cos(x*2^{L-1})],
each block of width d, concatenated on the last axis.

xyz_res=10 -> 63 dims, view_res=4 -> 27 dims (ref: embedder.py:53-54).
"""
import jax.numpy as jnp


def embed_dim(num_freqs: int, input_dims: int = 3, include_input: bool = True) -> int:
    return input_dims * (include_input + 2 * num_freqs)


def positional_encoding(x, num_freqs: int, include_input: bool = True):
    """x: [..., d] -> [..., d*(include_input + 2*num_freqs)].

    Frequencies are log-sampled 2^0 .. 2^{num_freqs-1}
    (ref: embedder.py:21-24 with max_freq_log2 = multires-1).
    """
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    # vectorized closed form, preserving the reference's interleaved layout
    d = x.shape[-1]
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)        # [L]
    xb = x[..., None, :] * freqs[:, None]                       # [..., L, d]
    sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)         # [..., L, 2, d]
    enc = sc.reshape(*x.shape[:-1], num_freqs * 2 * d)          # [..., L*2*d]
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def xyz_encoder(x, xyz_res: int = 10):
    return positional_encoding(x, xyz_res)


def view_encoder(v, view_res: int = 4):
    return positional_encoding(v, view_res)
