"""Batch assembly: static-shape collation and a prefetching loader.

The device only ever sees fixed shapes: train batches carry exactly N_rand
rays; eval batches pad the variable hit-ray count up to a multiple of
chunk_rays with ray_mask=0 (the reference's mask_at_box maps directly,
SURVEY.md §7.1). Host-only fields (image-space hit mask, indices) travel in
a separate meta dict that never reaches jit.
"""
from __future__ import annotations

import queue
import threading

import numpy as np

from ..config import build, register, resolve
from . import samplers

DEVICE_KEYS = ("geom", "rgb", "ray_o", "ray_d", "near", "far", "ray_mask",
               "R", "Th", "bounds", "latent_index", "Ks", "RT", "msks", "pts",
               "R0_snap", "Th0_snap", "K",
               "tbounds", "pbounds", "ptot_pts")


def pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


def collate(samples, chunk_rays):
    """Stack samples into a (device_batch, meta) pair with padded rays.

    Mesh batches carry no rays (dense grid 'pts', pre-padded by the
    dataset to pt_chunk multiples); everything else pads the variable ray
    count up to a chunk_rays multiple with ray_mask=0 entries."""
    has_rays = "rgb" in samples[0]
    if has_rays:
        n_rays = max(s["rgb"].shape[0] for s in samples)
        n_rays = -(-n_rays // chunk_rays) * chunk_rays

    device, meta = {}, {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key == "geom":
            device["geom"] = {
                k: np.stack([v[k] for v in vals]) for k in vals[0]
            }
        elif has_rays and key in ("rgb", "ray_o", "ray_d", "near", "far"):
            device[key] = np.stack([pad_to(np.asarray(v), n_rays) for v in vals])
        elif key in DEVICE_KEYS:
            device[key] = np.stack([np.asarray(v) for v in vals])
        else:
            meta[key] = vals if len(vals) > 1 else vals[0]

    if has_rays:
        device["ray_mask"] = np.stack([
            pad_to(np.ones(s["rgb"].shape[0], np.float32), n_rays)
            for s in samples
        ])
    device["Th"] = device["Th"].reshape(len(samples), 1, 3)
    return device, meta


class DataLoader:
    """Iterates (device_batch, meta) with background prefetch.

    `transform(device_batch) -> device_batch` runs in the prefetch thread
    (overlapped with device compute) — used for host-side hat-interpolation
    planning (ops/hat_interp.py).
    """

    def __init__(self, dataset, indices, chunk_rays, batch_size=1,
                 prefetch=2, transform=None):
        self.dataset = dataset
        self.indices = list(indices)
        self.chunk_rays = chunk_rays
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.transform = transform

    def __len__(self):
        return len(self.indices) // self.batch_size

    def _produce(self, q):
        try:
            for i in range(len(self)):
                batch_idx = self.indices[i * self.batch_size:
                                         (i + 1) * self.batch_size]
                samples = [self.dataset[j] for j in batch_idx]
                device, meta = collate(samples, self.chunk_rays)
                if self.transform is not None:
                    device = self.transform(device)
                q.put((device, meta))
        finally:
            q.put(None)

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


def make_dataset(cfg, split):
    name = (cfg.train_dataset_module if split == "train"
            else cfg.test_dataset_module)
    data_cfg = cfg.train_dataset if split == "train" else cfg.test_dataset
    return build("dataset", name, cfg, data_cfg, split)


def make_hat_transform(cfg, dataset, epoch=0, host_id=0, hat_state=None):
    """Batch transform running the hat-interpolation host planner.

    hat_state is a mutable dict persisting the static sizes (rows_caps,
    n_groups) across batches/epochs so the device compiles once.
    """
    from ..ops.hat_interp import prepare_hat_batch

    geo = dataset.geo
    state = hat_state if hat_state is not None else {}
    rng = (np.random.RandomState(epoch * 100019 + host_id * 7919 + 1)
           if cfg.perturb else None)

    def transform(device):
        device, hs = prepare_hat_batch(
            device, geo.out_sh, geo.site_caps, tuple(cfg.voxel_size),
            cfg.N_samples,
            group_size=int(cfg.tpu.hat_group_size),
            tile=tuple(cfg.tpu.hat_tile),
            rows_caps=state.get("rows_caps"),
            n_groups=state.get("n_groups"),
            rng=rng)
        if "rows_caps" not in state:
            # headroom on the first batch's sizes: later batches (other
            # frames/views) must fit without a recompile
            state["rows_caps"] = tuple(
                -(-int(c * 1.5) // 32) * 32 for c in hs["rows_caps"])
            state["n_groups"] = -(-int(hs["n_groups"] * 1.3) // 8) * 8
            device, _ = prepare_hat_batch(
                {k: v for k, v in device.items()
                 if not k.startswith("hat_") and k != "z_vals"},
                geo.out_sh, geo.site_caps, tuple(cfg.voxel_size),
                cfg.N_samples, group_size=int(cfg.tpu.hat_group_size),
                tile=tuple(cfg.tpu.hat_tile),
                rows_caps=state["rows_caps"], n_groups=state["n_groups"],
                rng=rng)
        return device

    return transform


def make_data_loader(cfg, split, dataset=None, epoch=0, num_hosts=1,
                     host_id=0, hat_state=None):
    """Factory mirroring the reference loader assembly
    (ref: lib/datasets/make_dataset.py:70-96)."""
    if dataset is None:
        dataset = make_dataset(cfg, split)

    transform = None
    if split == "train":
        if num_hosts > 1:
            # multi-host: every host must produce the identical batch
            # sequence (rays are sharded over the global mesh); pin the
            # global numpy RNG that drives per-sample ray sampling
            np.random.seed((epoch * 1000003 + 12345) % (2 ** 31 - 1))
        idx = samplers.epoch_indices(
            len(dataset), epoch, shuffle=cfg.train.shuffle,
            ep_iter=cfg.ep_iter * cfg.train.batch_size
            if cfg.ep_iter > 0 else -1)
        chunk = cfg.N_rand
        bs = cfg.train.batch_size
        if cfg.train.batch_sampler == "image_size":
            # multi-scale training (ref make_dataset.py:57 + ImageSize-
            # BatchSampler): per-batch bucketed (h, w) rides along as
            # (index, h, w) tuples; train device shapes stay static
            # (N_rand rays) regardless of image size
            meta = cfg.train.sampler_meta
            batches = samplers.image_size_batches(
                idx, bs, tuple(meta.min_hw), tuple(meta.max_hw),
                epoch=epoch, strategy=meta.strategy,
                n_buckets=int(meta.get("n_buckets", 4)), drop_last=True)
            idx = [(i, h, w) for chunk_idx, (h, w) in batches
                   for i in chunk_idx]
        # hat planning is a latent_xyzc-only interpolation path; other
        # families (nerf, tpose) sample z on device
        if (cfg.tpu.interp_mode == "hat" and hasattr(dataset, "geo")
                and cfg.network_module == "latent_xyzc"):
            transform = make_hat_transform(cfg, dataset, epoch, host_id,
                                           hat_state)
    else:
        if cfg.test.sampler == "FrameSampler":
            idx = samplers.frame_sampler_indices(
                len(dataset), getattr(dataset, "num_cams", 1),
                cfg.test.frame_sampler_interval)
        else:
            idx = samplers.sequential_indices(len(dataset))
        chunk = cfg.tpu.chunk_rays
        bs = cfg.test.batch_size

    return DataLoader(dataset, idx, chunk, batch_size=bs,
                      transform=transform)
