"""Break down the fresh-batch pipeline: where does host time go?

Stages per batch (inline, the exact loader path):
  sample    dataset __getitem__ + collate (decode + ray sampling)
  hat       apply_hat_spec (plan + payload assembly)
  pickle    pickle.dumps(batch) (what the worker result queue pays)
  stack     np.stack of G batches (parent-side)
  ship      jnp.asarray of the stacked tree (host->device)

Usage: python tools/probes/fresh_breakdown.py [cpu]
"""
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neuralbody_tpu.datasets.loader import (HatSpec, apply_hat_spec,
                                                _batch_seed, collate)
    from neuralbody_tpu.utils.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=4, n_cams=4, hw=(512, 512),
                          n_verts=6890, voxel_size=0.005, n_rand=1024)
    spec_kw = dict(out_sh=tuple(ds.out_sh), site_caps=tuple(ds.site_caps),
                   voxel_size=(0.005,) * 3, n_samples=64,
                   group_size=128, tile=(4, 8), perturb=True)
    G, reps = 8, 6

    # derive static caps from one batch (what DataLoader does on batch 0)
    np.random.seed(_batch_seed(0, 0))
    dev, _ = collate([ds[0]], 1024)
    spec = HatSpec(rows_caps=None, n_groups=None, seg_caps=None, **spec_kw)
    _, hs = apply_hat_spec(dict(dev), spec, 0)
    spec = HatSpec(rows_caps=hs["rows_caps"], seg_caps=hs["seg_caps"],
                   n_groups=int(hs["n_groups"] * 1.25), **spec_kw)

    t = dict.fromkeys(("sample", "hat", "pickle", "stack", "ship"), 0.0)
    nbytes = {}
    for r in range(reps):
        pending = []
        for i in range(G):
            bi = r * G + i
            np.random.seed(_batch_seed(1, bi))
            t0 = time.perf_counter()
            dev, meta = collate([ds[bi % len(ds)]], 1024)
            t1 = time.perf_counter()
            dev, _ = apply_hat_spec(dev, spec, _batch_seed(1, bi, 1))
            dev.pop("geom")  # banked mode: geometry never shipped
            t2 = time.perf_counter()
            blob = pickle.dumps(dev, protocol=pickle.HIGHEST_PROTOCOL)
            t3 = time.perf_counter()
            t["sample"] += t1 - t0
            t["hat"] += t2 - t1
            t["pickle"] += t3 - t2
            if not nbytes:
                nbytes = {k: np.asarray(v).nbytes for k, v in dev.items()}
                nbytes["__pickle__"] = len(blob)
            pending.append(dev)
        t0 = time.perf_counter()
        stacked = {k: np.stack([p[k] for p in pending]) for k in pending[0]}
        t1 = time.perf_counter()
        dev_tree = jax.tree.map(jnp.asarray, stacked)
        jax.block_until_ready(dev_tree)
        t2 = time.perf_counter()
        t["stack"] += t1 - t0
        t["ship"] += t2 - t1

    n = reps * G
    print(f"platform={jax.devices()[0].platform}  "
          f"per-batch ms over {n} batches (G={G} stacked):")
    for k, v in t.items():
        print(f"  {k:8s} {v / n * 1000:7.2f}")
    tot_mb = sum(v for k, v in nbytes.items() if k != "__pickle__") / 1e6
    print(f"payload/batch: {tot_mb:.2f} MB "
          f"(pickle {nbytes['__pickle__'] / 1e6:.2f} MB)")
    for k, v in sorted(nbytes.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {k:12s} {v / 1e6:7.3f} MB")


if __name__ == "__main__":
    main()
