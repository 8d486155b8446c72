"""Op-level device-time breakdown from a jax.profiler trace.

Usage:
  python tools/trace_ops.py DIR          # parse the newest xplane.pb under DIR
  python tools/trace_ops.py DIR --top 40

Parses the XSpace proto (tensorflow.core.profiler xplane) written by
jax.profiler.trace / runtime.tracing.device_trace, aggregates XEvent
durations on the device planes by HLO op, and prints the top ops and a
category rollup.  This is the ground-truth view of where the fused
program's device time goes -- stage-prefix probes force materialization
at every prefix boundary and can wildly misattribute cost (docs/PERF.md).
"""
import argparse
import collections
import glob
import os
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def newest_xplane(root):
    cands = glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                      recursive=True)
    if not cands:
        raise SystemExit(f"no xplane.pb under {root}")
    return max(cands, key=os.path.getmtime)


def device_op_times(xs):
    """{plane_name: {op_name: (total_ps, count, stats_str)}} for device
    planes.  stats_str carries the first-seen XStats of the op (HLO
    category, long name, ...) -- enough to map a fusion back to source."""
    out = {}
    for plane in xs.planes:
        name = plane.name
        if not ("TPU" in name or "GPU" in name or "Device" in name
                or "/device" in name.lower()):
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        st_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        agg = collections.defaultdict(lambda: [0, 0, ""])
        for line in plane.lines:
            for ev in line.events:
                m = ev_meta.get(ev.metadata_id)
                nm = m.name if m else f"id{ev.metadata_id}"
                a = agg[nm]
                a[0] += ev.duration_ps
                a[1] += 1
                if not a[2]:
                    parts = []
                    for src in (ev.stats, m.stats if m else ()):
                        for st in src:
                            k = st_meta.get(st.metadata_id, "?")
                            # oneof-aware: `or`-chaining drops falsy zeros
                            which = st.WhichOneof("value")
                            v = getattr(st, which) if which else ""
                            parts.append(f"{k}={v}")
                    a[2] = " ".join(str(p) for p in parts)[:220]
        if agg:
            out[name] = {k: tuple(v) for k, v in agg.items()}
    return out


def categorize(op):
    o = op.lower()
    for pat, cat in (("fusion", "fusion"), ("copy", "copy/relayout"),
                     ("transpose", "copy/relayout"), ("convert", "convert"),
                     ("dot", "dot"), ("convolution", "dot"),
                     ("reshape", "reshape"), ("dynamic", "dynamic-slice"),
                     ("reduce", "reduce"), ("infeed", "infeed/outfeed"),
                     ("outfeed", "infeed/outfeed"), ("all-", "collective"),
                     ("concatenate", "concat"), ("pad", "pad"),
                     ("iota", "iota"), ("select", "select"),
                     ("broadcast", "broadcast")):
        if pat in o:
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    path = (args.dir if args.dir.endswith(".pb")
            else newest_xplane(args.dir))
    print(f"# {path}", file=sys.stderr)
    xs = load_xspace(path)
    per_plane = device_op_times(xs)
    if not per_plane:
        # CPU backend: XLA ops run on /host:CPU thread lines
        for plane in xs.planes:
            if plane.name == "/host:CPU":
                ev_meta = {m.id: m.name
                           for m in plane.event_metadata.values()}
                agg = collections.defaultdict(lambda: [0, 0, ""])
                for line in plane.lines:
                    for ev in line.events:
                        nm = ev_meta.get(ev.metadata_id, "?")
                        agg[nm][0] += ev.duration_ps
                        agg[nm][1] += 1
                per_plane[plane.name] = {k: tuple(v)
                                         for k, v in agg.items()}
    if not per_plane:
        names = [p.name for p in xs.planes]
        raise SystemExit(f"no device planes found; planes = {names}")
    for plane, agg in per_plane.items():
        total = sum(v[0] for v in agg.values())
        print(f"\n== {plane}: {total/1e9:.3f} ms total device time")
        cats = collections.defaultdict(int)
        for op, v in agg.items():
            cats[categorize(op)] += v[0]
        for cat, ps in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:16s} {ps/1e9:9.3f} ms  {100*ps/max(total,1):5.1f}%")
        print(f"  -- top {args.top} ops --")
        for op, v in sorted(agg.items(), key=lambda kv: -kv[1][0])[
                :args.top]:
            ps, n = v[0], v[1]
            stats = v[2] if len(v) > 2 else ""
            print(f"  {ps/1e9:9.3f} ms x{n:<6d} {op[:110]}")
            if stats:
                print(f"             {stats}")


if __name__ == "__main__":
    main()
