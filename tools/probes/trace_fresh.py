"""Profiler trace of the FRESH production loop: device busy vs idle.

The fresh path runs at ~54 ms/batch against a 26 ms/batch device step;
packing / leaf count / G are all measured neutral (CLAUDE.md fresh-path
cost model). This captures an xplane trace around a few fresh dispatch
groups and reports, per device line, total busy time vs wall span — the
gaps are whatever the tunnel inserts between transfers and executes.

Usage: python tools/probes/trace_fresh.py [devplan]
"""
import glob
import sys
import time

sys.path.insert(0, "/root/repo")

LOG = "/tmp/jax_trace_fresh"


def main():
    import jax

    import bench

    plan_device = "devplan" in sys.argv
    # small, self-limited: 1 warm epoch + 4 traced dispatches
    import neuralbody_tpu  # noqa: F401

    # run a shortened measure_fresh with the trace around epoch 1
    orig_run = bench.measure_fresh

    # inline copy of measure_fresh's structure with tracing hooks is
    # overkill; instead trace the whole short measurement
    with jax.profiler.trace(LOG):
        rate = bench.measure_fresh(n_disp=4, plan_device=plan_device)
    print(f"traced fresh rate: {rate:.0f} rays/s", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    sp = xplane_pb2.XSpace()
    xs = sorted(glob.glob(LOG + "/**/*.xplane.pb", recursive=True))
    sp.ParseFromString(open(xs[-1], "rb").read())
    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if not line.events:
                continue
            t0 = min(e.offset_ps for e in line.events)
            t1 = max(e.offset_ps + e.duration_ps for e in line.events)
            busy = sum(e.duration_ps for e in line.events)
            span = t1 - t0
            print(f"{plane.name} / {line.name}: span {span/1e9:.1f} ms, "
                  f"busy {busy/1e9:.1f} ms ({100*busy/max(span,1):.0f}%), "
                  f"{len(line.events)} events", flush=True)


if __name__ == "__main__":
    main()
