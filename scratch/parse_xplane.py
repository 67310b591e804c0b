"""Summarize a jax.profiler .xplane.pb: per-op device time by plane.

Usage:  python scratch/parse_xplane.py [trace.xplane.pb]
        (default: newest under /tmp/jax_trace)
"""
import glob
import os
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = (sys.argv[1] if len(sys.argv) > 1 else
        sorted(glob.glob("/tmp/jax_trace/**/*.xplane.pb",
                         recursive=True), key=os.path.getmtime)[-1])
xs = xplane_pb2.XSpace()
with open(path, "rb") as fh:
    xs.ParseFromString(fh.read())

print(f"{path}: {len(xs.planes)} planes")
for plane in xs.planes:
    tot_by_name = defaultdict(float)
    n_by_name = defaultdict(int)
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    nlines = len(plane.lines)
    nev = 0
    for line in plane.lines:
        for ev in line.events:
            name = meta.get(ev.metadata_id, str(ev.metadata_id))
            tot_by_name[name] += ev.duration_ps / 1e9   # ms
            n_by_name[name] += 1
            nev += 1
    if not nev:
        continue
    total = sum(tot_by_name.values())
    print(f"\n== plane '{plane.name}' lines={nlines} events={nev} "
          f"total={total:.2f} ms ==")
    for name, ms in sorted(tot_by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:9.3f} ms  x{n_by_name[name]:<5d} {name[:90]}")
