"""Round-5 chip sweep: ceiling recovery, batch-size scaling, Pallas A/B.

One TPU session measuring (VERDICT r4 #3/#5/#6):
  1. broadcast ceiling @1024, pre-expanded rows vs per-step expansion
  2. broadcast @2048 / @4096 rays (amortize the ~190-fusion encoder+step
     overhead over more decode work)
  3. Pallas hat contraction integrated A/B @1024 (f32-cotangent backward)
  4. fresh pipeline @1024 (u16 z payload) and @2048

Self-limited: checks the wall clock between measurements and after
warmup; if a single warmup dispatch exceeds DEGRADED_S the tunnel is
congested (CLAUDE.md) — results so far are written and the script exits
cleanly. Results accumulate in /root/repo/tools/probes/r05_sweep_out.json
after EVERY measurement, so a partial run still reports.

Usage: python tools/probes/r05_sweep.py [--budget-s 1800]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r05_sweep_out.json")
DEGRADED_S = 240.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=1800.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    t_start = time.perf_counter()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench

    results = {"platform": jax.devices()[0].platform, "partial": True}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def left():
        return args.budget_s - (time.perf_counter() - t_start)

    plan = [
        ("broadcast_1024_preexpanded",
         lambda: bench.measure_broadcast(1024, n_iters=12)),
        ("broadcast_1024_segments",
         lambda: bench.measure_broadcast(1024, n_iters=12,
                                         pre_expand=False)),
        ("broadcast_2048",
         lambda: bench.measure_broadcast(2048, n_iters=8)),
        ("broadcast_4096",
         lambda: bench.measure_broadcast(4096, n_iters=6)),
        ("broadcast_1024_pallas",
         lambda: bench.measure_broadcast(1024, n_iters=12,
                                         use_pallas=True)),
        ("fresh_1024", lambda: bench.measure_fresh(n_disp=8)),
        ("fresh_2048", lambda: bench.measure_fresh(n_disp=6, n_rays=2048)),
    ]
    for name, fn in plan:
        if left() < DEGRADED_S + 60:
            results["stopped"] = f"budget exhausted before {name}"
            break
        t0 = time.perf_counter()
        try:
            rate = fn()
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = {"error": repr(e)[:300]}
            save()
            continue
        dt = time.perf_counter() - t0
        results[name] = {"rays_per_s": round(rate, 1),
                         "wall_s": round(dt, 1)}
        print(f"{name}: {rate:.0f} rays/s ({dt:.0f}s incl compile)",
              flush=True)
        save()
        if dt > 3 * DEGRADED_S:
            results["stopped"] = f"degraded tunnel during {name}"
            break
    results["partial"] = False if "stopped" not in results else True
    save()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
