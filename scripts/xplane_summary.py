"""Summarise a jax.profiler xplane.pb device trace without TensorBoard.

The tensorboard-plugin-profile converter in this image is broken
(native xspace_to_tools_data symbol mismatch), so this is a minimal
generic-protobuf-wire decoder for the XSpace/XPlane schema
(tensorflow/core/profiler/protobuf/xplane.proto), reporting per-kernel
totals from the TPU device plane: count, total/mean duration, and the
occupancy share of the traced window.

    python scripts/xplane_summary.py /tmp/trace_dir [--min-ms 0.05]

Used for VERDICT round-2 task 3: per-kernel GB/s derivation for the
fused MGM kernels (the byte counts come from the kernels' known
array shapes; see PERF.md "Trace analysis").
"""
import argparse
import collections
import glob
import os
import sys


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over one message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_plane(buf):
    """XPlane: name=2, lines=3, event_metadata map=4."""
    name = ""
    lines = []
    meta = {}
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3:
            lines.append(v)
        elif fn == 4:
            # map entry: key=1 (varint), value=2 (XEventMetadata)
            k = mname = None
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if k is not None:
                meta[k] = mname or ""
    return name, lines, meta


def parse_line(buf):
    """XLine: name=2, events=4."""
    name = ""
    events = []
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 4:
            events.append(v)
    return name, events


def parse_event(buf):
    """XEvent: metadata_id=1, offset_ps=2, duration_ps=3."""
    mid = off = dur = 0
    for fn, wt, v in fields(buf):
        if fn == 1:
            mid = v
        elif fn == 2:
            off = v
        elif fn == 3:
            dur = v
    return mid, off, dur


def summarize(trace_dir, min_ms=0.02, line_filter=None):
    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    out = []
    for pb in pbs:
        with open(pb, "rb") as f:
            space = f.read()
        for fn, wt, v in fields(space):
            if fn != 1:      # XSpace.planes
                continue
            pname, lines, meta = parse_plane(v)
            if "TPU" not in pname and "/device:" not in pname:
                continue
            per = collections.defaultdict(lambda: [0, 0])  # name->[n, ps]
            t_lo, t_hi = None, 0
            for lb in lines:
                lname, events = parse_line(lb)
                if line_filter and line_filter not in lname:
                    continue
                for eb in events:
                    mid, off, dur = parse_event(eb)
                    nm = meta.get(mid, f"#{mid}")
                    per[nm][0] += 1
                    per[nm][1] += dur
                    t_lo = off if t_lo is None else min(t_lo, off)
                    t_hi = max(t_hi, off + dur)
            if per:
                out.append((pname, per, (t_hi - (t_lo or 0)) / 1e9))
    for pname, per, span_ms in out:
        print(f"== {pname}  (window {span_ms:.2f} ms)")
        rows = sorted(per.items(), key=lambda kv: -kv[1][1])
        for nm, (n, ps) in rows:
            ms = ps / 1e9
            if ms < min_ms:
                continue
            print(f"  {ms:9.3f} ms  n={n:5d}  avg {ms / n * 1e3:8.1f} us"
                  f"  {100 * ms / span_ms if span_ms else 0:5.1f}%  {nm}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--min-ms", type=float, default=0.02)
    ap.add_argument("--line", default=None,
                    help="only lines whose name contains this")
    args = ap.parse_args()
    summarize(args.trace_dir, args.min_ms, args.line)
