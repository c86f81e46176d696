#!/usr/bin/env python
"""Per-op roofline analysis: join trace durations with HLO shapes.

For each op on the device 'XLA Ops' line, estimate bytes moved from the
shapes in its HLO text (output + operands visible in the truncated name)
and print achieved GB/s next to measured time -- ops far below HBM peak
are optimization targets; ops near peak are done (the roofline evidence
behind docs/DESIGN.md).

Byte estimation is approximate (the event name truncates operand lists;
fusions read what their roots read), so treat GB/s as a lower bound: only
the ratio ordering matters.

Usage:
  python scripts/roofline.py --xplane <trace>/*.xplane.pb [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import re
import sys

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "u8": 1, "s8": 1,
               "pred": 1, "f16": 2, "u64": 8, "s64": 8, "f64": 8}

_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|u8|s8|pred|u64|s64|f64)"
                       r"\[([0-9,]*)\]")


def op_bytes(name: str) -> int:
    """Sum bytes of every shape mentioned in the op's (truncated) HLO
    text: output(s) + visible operands."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(name):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--xplane", required=True)
    ap.add_argument("--steps", type=int, default=20,
                    help="steps captured in the trace (durations divide)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--min-ms", type=float, default=0.02,
                    help="ignore ops cheaper than this per step")
    args = ap.parse_args()

    sys.path.insert(0, "scripts")
    from trace_report import parse_xspace

    import collections
    per_op = collections.Counter()
    for pname, lines, emeta in parse_xspace(args.xplane):
        if "TPU" not in pname:
            continue
        for lname, events in lines:
            if lname != "XLA Ops":
                continue
            for meta_id, dur in events:
                per_op[emeta.get(meta_id, str(meta_id))] += dur

    total_ms = sum(per_op.values()) / 1e9 / args.steps
    rows = []
    for name, dur_ps in per_op.items():
        ms = dur_ps / 1e9 / args.steps
        if ms < args.min_ms:
            continue
        gb = op_bytes(name) / 1e9
        rows.append((ms, gb / (ms / 1e3) if ms else 0.0, name))
    rows.sort(reverse=True)
    print(f"total: {total_ms:.3f} ms/step over {args.steps} steps; "
          f"showing ops >= {args.min_ms} ms/step")
    print(f"{'ms/step':>8}  {'~GB/s':>7}  op")
    for ms, gbps, name in rows[:args.top]:
        print(f"{ms:8.3f}  {gbps:7.0f}  {name[:110]}")
    shown = sum(r[0] for r in rows[:args.top])
    print(json.dumps({"total_ms_per_step": round(total_ms, 3),
                      "shown_ms": round(shown, 3)}))


if __name__ == "__main__":
    main()
