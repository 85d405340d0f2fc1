"""Device-time category breakdown from an xplane trace (task: publish
the post-kernel flagship/inference cost tables — round-3 VERDICT #5).

Usage:
    python benchmarks/breakdown_flagship.py /tmp/flagship_trace
    (positional arg: a profiler logdir containing *.xplane.pb, or a
    single .xplane.pb path)

Parses the TPU plane with parse_xplane's protobuf walker, classifies
every op by name into hardware-meaningful categories, and prints a
table of ms + share. The op names come from XLA HLO metadata, so the
categories are heuristic but stable:

  mxu        convolution / dot / einsum (systolic-array work)
  gather     gather / scatter / dynamic-slice / dus (HBM random access)
  loop       while-loop bodies (the NMS suppression chain)
  sort       sort / top-k
  reduce     standalone reduces (softmax denominators, stats)
  fusion     elementwise fusions (HBM-bandwidth bound)
  layout     copy / transpose / bitcast / reshape
  other      everything else (infeed, custom-call, ...)
"""

import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parse_xplane import fields, parse_plane  # noqa: E402

_OPCODE_RX = re.compile(r"\b([a-z][a-z0-9_-]*)\(")


def classify(hlo: str) -> str:
    """Category from the HLO text '%name = shape opcode(operands...)'.

    The opcode is the first lowercase token followed by '(' after the
    '=' (shape annotations only contain uppercase T(...)/S(...) calls);
    fusions are subclassified by the %name prefix XLA gives them
    (convert_reduce_fusion, add_add_fusion, loop_fusion, ...)."""
    name, _, rest = hlo.partition(" = ")
    m = _OPCODE_RX.search(rest)
    opcode = m.group(1) if m else ""
    n = name.lower()
    if opcode in ("convolution", "dot"):
        return "mxu"
    if opcode == "custom-call":
        return "custom"  # Pallas kernels (ROI pooler etc.)
    if opcode == "while":
        return "loop"
    if opcode == "sort":
        return "sort"
    if opcode in ("reduce", "reduce-window", "select-and-scatter"):
        return "reduce"
    if opcode in ("copy", "copy-start", "copy-done", "transpose", "bitcast",
                  "reshape", "pad", "slice", "concatenate", "reverse"):
        return "layout"
    if opcode in ("gather", "scatter", "dynamic-slice", "dynamic-update-slice"):
        return "gather"
    if opcode == "fusion":
        if "reduce" in n:  # before the conv check: convert_reduce_fusion
            return "reduce"
        if "convolution" in n or "dot" in n:
            return "mxu"
        if "gather" in n or "scatter" in n or "dus" in n:
            return "gather"
        if "transpose" in n or "copy" in n:
            return "layout"
        return "fusion"
    return "other" if opcode else "other"


def main():
    path = sys.argv[1]
    if os.path.isdir(path):
        cands = glob.glob(f"{path}/**/*.xplane.pb", recursive=True)
        assert cands, f"no xplane.pb under {path}"
        path = max(cands, key=os.path.getmtime)
    buf = open(path, "rb").read()

    for fn, wt, v in fields(buf):
        if fn != 1:
            continue
        pname, lines, md = parse_plane(v)
        if "tpu" not in pname.lower() and "device" not in pname.lower():
            continue
        # Only the 'XLA Ops' line carries real per-op device self-time.
        # 'Async XLA Ops' durations span issue->completion of DMAs that
        # OVERLAP compute (counting them doubles the total), and 'XLA
        # Modules' is the whole-program span.
        per_op = defaultdict(int)
        module_ms = 0.0
        for lname, events in lines:
            if lname == "XLA Modules":
                module_ms = sum(d for _, d in events) / 1e9
            if lname != "XLA Ops":
                continue
            for mid, dur in events:
                per_op[md.get(mid, f"#{mid}")] += dur
        if not per_op:
            continue
        if module_ms:
            print(f"(XLA Modules line total: {module_ms:.3f} ms across all "
                  f"traced steps)")
        total = sum(per_op.values())
        by_cat = defaultdict(int)
        for op, dur in per_op.items():
            by_cat[classify(op)] += dur
        print(f"=== PLANE {pname!r}: device total {total/1e9:.3f} ms")
        table = {}
        for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:8s} {dur/1e9:10.3f} ms  {100*dur/total:5.1f}%")
            table[cat] = round(dur / 1e9, 3)
        print("  --- top 25 ops ---")
        for op, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {dur/1e9:10.3f} ms  [{classify(op):7s}] {op[:100]}")
        print("JSON:", json.dumps({"plane": pname,
                                   "total_ms": round(total / 1e9, 3),
                                   "by_category_ms": table}))


if __name__ == "__main__":
    main()
