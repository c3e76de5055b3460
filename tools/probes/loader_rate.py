"""Loader-only throughput at the reference working point (no device work).

Usage: JAX_PLATFORMS=cpu python tools/probes/loader_rate.py [workers...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from neuralbody_tpu.datasets.loader import DataLoader, WorkerPool
    from neuralbody_tpu.utils.synthetic import SyntheticDataset

    workers = [int(a) for a in sys.argv[1:]] or [0, 2, 3]
    ds = SyntheticDataset(n_frames=4, n_cams=4, hw=(512, 512),
                          n_verts=6890, voxel_size=0.005, n_rand=1024)
    hat_cfg = dict(out_sh=ds.out_sh, site_caps=ds.site_caps,
                   voxel_size=(0.005,) * 3, n_samples=64,
                   group_size=128, tile=(4, 8), perturb=True)
    hs = {}
    for nw in workers:
        pool = WorkerPool(ds, nw) if nw else None
        n = 48
        list(DataLoader(ds, list(range(8)), 1024, hat_cfg=hat_cfg,
                        hat_state=hs, epoch=0, pool=pool,
                        attach_geom=False))
        t0 = time.perf_counter()
        for _ in DataLoader(ds, [i % len(ds) for i in range(n)], 1024,
                            hat_cfg=hat_cfg, hat_state=hs, epoch=1,
                            pool=pool, attach_geom=False):
            pass
        dt = time.perf_counter() - t0
        print(f"workers={nw}: {dt/n*1000:.1f} ms/batch "
              f"({n/dt:.1f} batches/s)", flush=True)
        if pool:
            pool.shutdown()


if __name__ == "__main__":
    main()
