#!/usr/bin/env python
"""Profiler-trace op breakdown for the train step (VERDICT r1 next-1).

Captures a `jax.profiler` trace of the flagship jitted train step and
prints a per-HLO-op time breakdown from the device plane of the xplane.pb
-- the evidence artifact behind the roofline claims in docs/DESIGN.md.

tensorboard-plugin-profile's native converter is ABI-incompatible with the
installed TF in this image, so this parses the XSpace protobuf directly
with a minimal wire-format reader (schema: tsl/profiler/protobuf/xplane.proto,
public TF source) -- no generated protos needed.

Usage:
  PYTHONPATH=/root/.axon_site:. python scripts/trace_report.py --batch 512
  python scripts/trace_report.py --xplane /tmp/trace/.../*.xplane.pb  # parse only
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import struct
import sys
import tempfile

# ---------------------------------------------------------------------------
# minimal protobuf wire-format reader
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message.
    value: int for varint/fixed, bytes for length-delimited."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def _parse_event(buf: bytes):
    meta_id = dur = 0
    for f, _, v in _fields(buf):
        if f == 1:
            meta_id = v
        elif f == 3:
            dur = v
    return meta_id, dur  # duration in picoseconds


def _parse_line(buf: bytes):
    name = ""
    events = []
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 11 and not name:
            name = v.decode("utf-8", "replace")
        elif f == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_kv_meta(buf: bytes):
    """map<int64, XEventMetadata> entry -> (id, name)."""
    k, name = 0, ""
    for f, _, v in _fields(buf):
        if f == 1:
            k = v
        elif f == 2:  # XEventMetadata
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return k, name


def _parse_plane(buf: bytes):
    name = ""
    lines = []
    emeta = {}
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            lines.append(_parse_line(v))
        elif f == 4:
            k, nm = _parse_kv_meta(v)
            emeta[k] = nm
    return name, lines, emeta


def parse_xspace(path: str):
    """xplane.pb -> [(plane_name, [(line_name, [(meta_id, dur_ps)])], {id: name})]"""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for f_, _, v in _fields(buf):
        if f_ == 1:
            planes.append(_parse_plane(v))
    return planes


# ---------------------------------------------------------------------------
# aggregation / report
# ---------------------------------------------------------------------------

_CATEGORIES = (
    ("conv fwd/bwd", ("convolution",)),
    ("BN stats/reduce", ("reduce",)),
    ("maxpool bwd", ("select-and-scatter",)),
    ("maxpool fwd", ("reduce-window",)),
    ("copy/transpose", ("copy", "transpose", "bitcast")),
    ("matmul", ("dot",)),
)


def categorize(name: str) -> str:
    n = name.lower()
    for cat, keys in _CATEGORIES:
        if any(k in n for k in keys):
            return cat
    return "elementwise/other fusion" if "fusion" in n else "other"


def report(xplane_path: str, top: int = 25) -> dict:
    planes = parse_xspace(xplane_path)
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0
    for pname, lines, emeta in planes:
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        for lname, events in lines:
            # the synchronous per-op line only: 'Async XLA Ops' events
            # overlap compute (their duration includes the async wait) and
            # 'Steps'/'XLA Modules' double-count everything
            if lname != "XLA Ops":
                continue
            for meta_id, dur in events:
                name = emeta.get(meta_id, f"op_{meta_id}")
                per_op[name] += dur
                total += dur
    for name, dur in per_op.items():
        per_cat[categorize(name)] += dur
    out = {
        "xplane": xplane_path,
        "total_device_ms": round(total / 1e9, 3),
        "categories": {
            k: {"ms": round(v / 1e9, 3), "pct": round(100 * v / total, 1)}
            for k, v in per_cat.most_common()
        },
        "top_ops": [
            {"name": k[:120], "ms": round(v / 1e9, 3),
             "pct": round(100 * v / total, 1)}
            for k, v in per_op.most_common(top)
        ],
    }
    return out


def capture(batch: int, steps: int, image_size: int, dtype: str,
            use_pallas: bool, trace_dir: str, bn_stats: str = "",
            stem_s2d: bool = False) -> str:
    import jax

    sys.path.insert(0, os.path.dirname(__file__))
    from perf_probe import build, timeit

    step, state, batches, gb, n_dev = build(batch, image_size, dtype,
                                            use_pallas,
                                            bn_stats=bn_stats or None,
                                            stem_s2d=stem_s2d)
    ms, state = timeit(step, state, batches, steps=10)  # warm + honest timing
    print(json.dumps({"ms_per_step_timed": round(ms * 1e3, 3),
                      "images_per_sec_per_chip": round(
                          gb / ms / n_dev, 1)}))
    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            state, metrics = step(state, batches[i % 2])
        float(jax.device_get(metrics["loss"]))
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    return max(paths, key=os.path.getmtime)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--xplane", default="", help="parse an existing trace")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--bn-stats", default="")
    ap.add_argument("--stem-s2d", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default="")
    args = ap.parse_args()

    path = args.xplane
    if not path:
        tdir = args.trace_dir or tempfile.mkdtemp(prefix="rppe_trace_")
        path = capture(args.batch, args.steps, args.image_size, args.dtype,
                       args.pallas, tdir, args.bn_stats, args.stem_s2d)
    r = report(path, args.top)
    print(json.dumps(r["categories"], indent=1))
    for op in r["top_ops"]:
        print(f"{op['pct']:5.1f}%  {op['ms']:8.3f}ms  {op['name']}")
    print(json.dumps({"total_device_ms": r["total_device_ms"],
                      "xplane": r["xplane"]}))


if __name__ == "__main__":
    main()
