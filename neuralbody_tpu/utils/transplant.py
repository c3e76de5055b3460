"""Weight transplant: reference PyTorch checkpoints -> framework pytrees.

Loads a reference `latest.pth` (ref: lib/utils/net_utils.py:326-338 format:
{'net': state_dict, ...}) and maps every tensor into this framework's param
layout, so renders/gradients can be compared allclose against the trained
reference model (SURVEY.md §7.2 step 3).

Layout mappings:
  * nn.Embedding -> rows as-is (c.weight -> vertex_code, latent -> frame_latent)
  * nn.Conv1d(k=1) [out, in, 1] -> dense [in, out] (transpose)
  * spconv conv weights -> [27, in, out]; accepts the layouts used by
    spconv 1.x ([kd,kh,kw,in,out]) and torch convs ([out,in,kd,kh,kw])
  * BatchNorm1d weight/bias -> bn_scale/bn_bias; running stats -> bn stats
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _conv1d_to_dense(w, b):
    w = np.asarray(w)
    if w.ndim == 3:          # [out, in, 1]
        w = w[:, :, 0]
    return {"w": jnp.asarray(w.T), "b": jnp.asarray(np.asarray(b))}


def _sparse_conv_weight(w):
    """Any known sparse-conv weight layout -> [27, in, out]."""
    w = np.asarray(w)
    if w.ndim == 3 and w.shape[0] == 27:
        return jnp.asarray(w)
    if w.ndim == 5:
        if w.shape[0] == 3 and w.shape[1] == 3 and w.shape[2] == 3:
            # [kd, kh, kw, in, out]
            return jnp.asarray(w.reshape(27, w.shape[3], w.shape[4]))
        # torch layout [out, in, kd, kh, kw]
        return jnp.asarray(
            w.transpose(2, 3, 4, 1, 0).reshape(27, w.shape[1], w.shape[0]))
    raise ValueError(f"unrecognized sparse conv weight shape {w.shape}")


# (our block name, number of conv layers) in reference Sequential order
_ENCODER_BLOCKS = [
    ("conv0", 2), ("down0", 1), ("conv1", 2), ("down1", 1),
    ("conv2", 3), ("down2", 1), ("conv3", 3), ("down3", 1), ("conv4", 3),
]
_HEADS = ["fc_0", "fc_1", "fc_2", "alpha_fc", "feature_fc", "latent_fc",
          "view_fc", "rgb_fc"]


def transplant_state_dict(state, params, bn_stats):
    """Map a reference Network state_dict into (params, bn_stats) copies.

    state: dict of numpy arrays keyed by reference names (torch state_dict
    converted to numpy; strip 'module.' DDP prefixes beforehand).
    """
    state = {k.replace("module.", ""): np.asarray(v)
             for k, v in state.items()}
    params = dict(params)
    bn_stats = {"xyzc_net": dict(bn_stats["xyzc_net"])}

    params["vertex_code"] = jnp.asarray(state["c.weight"])
    params["frame_latent"] = jnp.asarray(state["latent.weight"])

    for name in _HEADS:
        params[name] = _conv1d_to_dense(
            state[f"{name}.weight"], state[f"{name}.bias"])

    enc = dict(params["xyzc_net"])
    for block, n_layers in _ENCODER_BLOCKS:
        layers = []
        stats_layers = []
        for i in range(n_layers):
            # reference SparseSequential: indices 0,3,6 convs; 1,4,7 BNs
            conv_idx, bn_idx = 3 * i, 3 * i + 1
            prefix = f"xyzc_net.{block}.{conv_idx}"
            bn_prefix = f"xyzc_net.{block}.{bn_idx}"
            layers.append({
                "w": _sparse_conv_weight(state[f"{prefix}.weight"]),
                "bn_scale": jnp.asarray(state[f"{bn_prefix}.weight"]),
                "bn_bias": jnp.asarray(state[f"{bn_prefix}.bias"]),
            })
            stats_layers.append({
                "mean": jnp.asarray(state[f"{bn_prefix}.running_mean"]),
                "var": jnp.asarray(state[f"{bn_prefix}.running_var"]),
            })
        enc[block] = layers
        bn_stats["xyzc_net"][block] = stats_layers
    params["xyzc_net"] = enc
    return params, bn_stats


def load_torch_checkpoint(path):
    """Read a reference .pth (requires torch; CPU map)."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    net = payload.get("net", payload)
    return {k: v.detach().numpy() for k, v in net.items()}, payload.get(
        "epoch", -1)


def transplant_from_pth(path, params, bn_stats):
    state, epoch = load_torch_checkpoint(path)
    params, bn_stats = transplant_state_dict(state, params, bn_stats)
    return params, bn_stats, epoch
