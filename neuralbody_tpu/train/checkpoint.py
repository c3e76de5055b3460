"""Checkpointing with the reference's latest/epoch/prune semantics.

Bundles params + BN stats + optimizer state + epoch + recorder counters into
one msgpack file, writes `latest.ckpt` every save_latest_ep epochs and
`{epoch}.ckpt` every save_ep, prunes to 20 numbered checkpoints
(ref: lib/utils/net_utils.py:288-348). Rank-0 writes only; restore is
host-local (replicated params).
"""
from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(model_dir, epoch, params, bn_stats, opt_state,
                    recorder_state=None, latest=False, keep=20,
                    is_primary=True):
    if not is_primary:
        return
    os.makedirs(model_dir, exist_ok=True)
    payload = {
        "params": _to_numpy(params),
        "bn_stats": _to_numpy(bn_stats),
        "opt_state": _to_numpy(opt_state),
        "recorder": recorder_state or {},
        "epoch": epoch,
    }
    name = "latest.ckpt" if latest else f"{epoch}.ckpt"
    tmp = os.path.join(model_dir, name + ".tmp")
    state = serialization.to_state_dict(payload)
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    os.replace(tmp, os.path.join(model_dir, name))

    pths = sorted(
        int(p.split(".")[0]) for p in os.listdir(model_dir)
        if p.endswith(".ckpt") and p != "latest.ckpt"
    )
    while len(pths) > keep:
        os.remove(os.path.join(model_dir, f"{pths.pop(0)}.ckpt"))


def _pick(model_dir, epoch):
    if not os.path.isdir(model_dir):
        return None
    names = os.listdir(model_dir)
    pths = sorted(int(p.split(".")[0]) for p in names
                  if p.endswith(".ckpt") and p != "latest.ckpt")
    if epoch == -1:
        if "latest.ckpt" in names:
            return os.path.join(model_dir, "latest.ckpt")
        if pths:
            return os.path.join(model_dir, f"{pths[-1]}.ckpt")
        return None
    path = os.path.join(model_dir, f"{epoch}.ckpt")
    return path if os.path.exists(path) else None


def load_checkpoint(model_dir, params, bn_stats, opt_state, epoch=-1,
                    resume=True):
    """Full resume. Returns (params, bn_stats, opt_state, recorder, epoch+1)
    or the inputs unchanged with epoch 0 when nothing to restore."""
    path = _pick(model_dir, epoch) if resume else None
    if path is None:
        return params, bn_stats, opt_state, {}, 0
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    print(f"load checkpoint: {path}")
    params = serialization.from_state_dict(params, raw["params"])
    bn_stats = serialization.from_state_dict(bn_stats, raw["bn_stats"])
    opt_state = serialization.from_state_dict(opt_state, raw["opt_state"])
    return (params, bn_stats, opt_state, raw.get("recorder", {}),
            int(raw["epoch"]) + 1)


def load_params(model_dir, params, bn_stats, epoch=-1):
    """Weights-only load for evaluation (ref: net_utils.py:351-380)."""
    path = _pick(model_dir, epoch)
    if path is None:
        print("pretrained model does not exist")
        return params, bn_stats, 0
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    print(f"load network: {path}")
    params = serialization.from_state_dict(params, raw["params"])
    bn_stats = serialization.from_state_dict(bn_stats, raw["bn_stats"])
    return params, bn_stats, int(raw["epoch"]) + 1
