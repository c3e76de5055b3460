import glob, re, collections
from tensorflow.tsl.profiler.protobuf import xplane_pb2
sp = xplane_pb2.XSpace()
xs = sorted(glob.glob("/tmp/jax_trace_hat/**/*.xplane.pb", recursive=True))
sp.ParseFromString(open(xs[-1], "rb").read())
plane = [p for p in sp.planes if p.name == "/device:TPU:0"][0]
md = {k: v.name for k, v in plane.event_metadata.items()}

def cat(name):
    if name.startswith("%while"): return None
    if name.startswith("jit_"): return None
    m = re.match(r"%(\w+?)[\.\d]* = (\S+?)\[([\d,]*)\]", name)
    if not m: return name[:40]
    op, dt, shape = m.groups()
    return f"{op} {dt}[{shape}]"

for line in plane.lines:
    if line.name not in ("XLA Ops",):
        continue
    agg = collections.Counter(); cnt = collections.Counter()
    for e in line.events:
        c = cat(md.get(e.metadata_id, "?"))
        if c is None: continue
        agg[c] += e.duration_ps; cnt[c] += 1
    total = sum(agg.values())
    print(f"{line.name}: {total/1e9/4:.2f} ms/step")
    for name, ps in agg.most_common(40):
        print(f"{ps/1e9/4:8.3f} ms/step x{cnt[name]//4:<4} {name[:90]}")
