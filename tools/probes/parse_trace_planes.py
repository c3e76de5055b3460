"""Aggregate per-op self time from a JAX xplane trace (TPU device plane)."""
import glob, sys, collections
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = sorted(glob.glob("/tmp/jax_trace/**/*.xplane.pb", recursive=True))
sp = xplane_pb2.XSpace()
sp.ParseFromString(open(xs[-1], "rb").read())
for p in sp.planes:
    total_by_line = {l.name: sum(e.duration_ps for e in l.events)
                     for l in p.lines}
    print(f"PLANE {p.name}: lines={[(n, round(t/1e9,1)) for n, t in total_by_line.items()]}")

# pick the TPU device plane with XLA ops
for p in sp.planes:
    if "TPU" not in p.name and "/device" not in p.name.lower():
        continue
    md = {k: v.name for k, v in p.event_metadata.items()}
    stats_md = {k: v.name for k, v in p.stat_metadata.items()}
    agg = collections.Counter()
    cnt = collections.Counter()
    for l in p.lines:
        if "step" in l.name.lower():
            continue
        for e in l.events:
            name = md.get(e.metadata_id, str(e.metadata_id))
            agg[name] += e.duration_ps
            cnt[name] += 1
    total = sum(agg.values())
    print(f"\n== {p.name}: total {total/1e9:.2f} ms over {sum(cnt.values())} events")
    for name, ps in agg.most_common(45):
        print(f"{ps/1e9:9.3f} ms  x{cnt[name]:<5} {name[:110]}")
