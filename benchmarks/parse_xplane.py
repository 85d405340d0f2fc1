"""Minimal XSpace/XPlane parser: aggregate device event time by op name.

Hand-rolled protobuf wire decoding (no generated code needed — the
installed tensorboard_plugin_profile is ABI-incompatible with this
environment's TF/protobuf, so we read the wire format directly).

Usage: python parse_xplane.py <xplane.pb> [plane_name_filter]

Produces, per plane, the per-line totals and the top ops by summed
duration. Capture a trace with benchmarks/trace_flagship.py (the axon
backend DOES support jax.profiler device traces — verified 2026-08-20;
the 'XLA Ops' line carries real per-op durations). This is how the
round-3 flagship bottleneck (f32 window-attention score round-trips,
~60 ms/step) was found.
"""
import sys
from collections import defaultdict


def read_varint(buf, i):
    result = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, i
        shift += 7


def fields(buf, start=0, end=None):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = start
    if end is None:
        end = len(buf)
    while i < end:
        key, i = read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 2:
            ln, i = read_varint(buf, i)
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


def parse_event(buf):
    md_id = dur = 0
    for fn, wt, v in fields(buf):
        if fn == 1:
            md_id = v
        elif fn == 3:
            dur = v
    return md_id, dur


def parse_line(buf):
    name = display_name = ""
    events = []
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 11:  # XLine.display_name — some planes set only this
            display_name = v.decode("utf-8", "replace")
        elif fn == 4:
            events.append(parse_event(v))
    return name or display_name, events


def parse_md_entry(buf):
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key = 0
    name = ""
    for fn, wt, v in fields(buf):
        if fn == 1:
            key = v
        elif fn == 2:  # XEventMetadata
            for fn2, wt2, v2 in fields(v):
                if fn2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def parse_plane(buf):
    name = ""
    lines = []
    md = {}
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3:
            lines.append(parse_line(v))
        elif fn == 4:
            k, n = parse_md_entry(v)
            md[k] = n
    return name, lines, md


def main():
    path = sys.argv[1]
    filt = sys.argv[2] if len(sys.argv) > 2 else None
    buf = open(path, "rb").read()
    for fn, wt, v in fields(buf):
        if fn != 1:
            continue
        pname, lines, md = parse_plane(v)
        if filt and filt.lower() not in pname.lower():
            continue
        total_by_line = {}
        agg = defaultdict(int)
        for lname, events in lines:
            t = sum(d for _, d in events)
            total_by_line[lname] = total_by_line.get(lname, 0) + t
            for mid, dur in events:
                agg[(lname, md.get(mid, f"#{mid}"))] += dur
        if not agg:
            continue
        print(f"\n=== PLANE {pname!r}  lines={list(total_by_line)}")
        for lname, t in total_by_line.items():
            print(f"  line {lname!r}: total {t/1e9:.3f} ms")
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
        for (lname, op), dur in top:
            print(f"  {dur/1e9:10.3f} ms  [{lname[:18]:18s}] {op[:110]}")


if __name__ == "__main__":
    main()
