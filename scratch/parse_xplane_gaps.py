"""Per-LINE timeline analysis of a jax.profiler .xplane.pb.

The top-op summary (parse_xplane.py) merges the device plane's lines,
which double-counts async copy spans that ride separate queues and
hides idle gaps.  This prints, per line: busy time (union of event
intervals), span, and the largest gaps — and, inside the longest
top-level event window (the scanned while loop), the busy fraction of
every OTHER line so the idle budget of the step becomes visible.

Usage:  python scratch/parse_xplane_gaps.py trace.xplane.pb
"""
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
with open(path, "rb") as fh:
    xs.ParseFromString(fh.read())


def union(iv):
    iv = sorted(iv)
    out = []
    for s, e in iv:
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    lines = []
    for line in plane.lines:
        evs = []
        for ev in line.events:
            s = line.timestamp_ns * 1e3 + ev.offset_ps / 1.0  # ps
            evs.append((s, s + ev.duration_ps,
                        meta.get(ev.metadata_id, "?")))
        if evs:
            lines.append((line.name or str(line.id), evs))
    print(f"== plane '{plane.name}': {len(lines)} non-empty lines ==")
    # The scan window = the longest event anywhere (the while loop).
    allev = [e for _, evs in lines for e in evs]
    w = max(allev, key=lambda e: e[1] - e[0])
    w0, w1 = w[0], w[1]
    print(f"window: '{w[2][:60]}' dur={(w1 - w0) / 1e9:.3f} ms")
    for name, evs in lines:
        iv = [(s, e) for s, e, _ in evs
              if e > w0 and s < w1 and (e - s) < (w1 - w0) * 0.99]
        if not iv:
            continue
        u = union([(max(s, w0), min(e, w1)) for s, e in iv])
        busy = sum(e - s for s, e in u) / 1e9
        # largest gaps inside the window
        gaps = []
        prev = w0
        for s, e in u:
            if s > prev:
                gaps.append((s - prev, prev, s))
            prev = max(prev, e)
        if w1 > prev:
            gaps.append((w1 - prev, prev, w1))
        gaps.sort(reverse=True)
        print(f"  line '{name}': {len(iv)} evs, busy {busy:.3f} ms "
              f"({100 * busy * 1e9 / (w1 - w0):.1f}%)")
        for g, s, e in gaps[:6]:
            if g < 0.05e9:
                break
            # name the events bracketing the gap
            before = [n for s2, e2, n in evs if abs(e2 - s) < 1e6]
            after = [n for s2, e2, n in evs if abs(s2 - e) < 1e6]
            print(f"     gap {g / 1e9:7.3f} ms after "
                  f"{(before[0] if before else '?')[:60]} -> "
                  f"{(after[0] if after else '?')[:60]}")
