#!/usr/bin/env python
"""Computed roofline lower bound for the tracked train step (VERDICT r2
next-1): is the measured step actually at the HBM roofline, or is there
headroom?

Method: XLA's own cost analysis of the COMPILED (post-fusion, post-layout)
step gives total `bytes accessed` -- the traffic the optimized HLO moves
to/from HBM -- and total flops. The two roofline legs are then

    hbm_bound_ms = bytes_accessed / HBM_peak
    mxu_bound_ms = flops / bf16_peak

and no schedule can beat max() of them: every byte must cross HBM at
most at peak bandwidth and every FLOP must retire on the MXU at most at
peak rate. The bound is OPTIMISTIC (perfect overlap of compute and
memory, zero dispatch/sync, every op at peak), so

    headroom_pct = (measured - bound) / measured

is an upper bound on what any further kernel/fusion tuning could recover
without reducing bytes or flops (algorithmic change).

Caveat: XLA counts each operand's full size per op; re-reads served from
VMEM/caches make true HBM traffic slightly lower, which makes the bound
*more* optimistic, not less -- the conclusion "within N% of the bound"
stays conservative.

Usage (TPU):
  PYTHONPATH=/root/.axon_site:. python scripts/hbm_bound.py --batch 512
"""

from __future__ import annotations

import argparse
import json
import sys

import jax

# public spec-sheet peaks per chip
HBM_PEAK_GBPS = {
    "TPU v5 lite": 819.0,    # v5e: 819 GB/s HBM2E
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,        # v5p
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,   # v6e / Trillium
}
PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--unroll", type=int, default=8,
                    help="steps/dispatch for the MEASURED number (the "
                         "tracked bench config); the bound comes from the "
                         "unroll-1 compiled step")
    ap.add_argument("--no-tuned", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, "scripts")
    from perf_probe import build, timeit

    from rgb_proprioceptive_pose_estimator_tpu.config import (
        TUNED_COMPILER_OPTS,
    )

    tuned = not args.no_tuned
    copts = dict(TUNED_COMPILER_OPTS) if tuned else None

    # 1. the bound: cost analysis of the unroll-1 compiled step (the
    # scanned unroll-8 program reports its loop body once, so analyzing
    # the single-step graph avoids trip-count guessing)
    step1, state1, batches1, gb, n_dev = build(
        args.batch, args.image_size, args.dtype, stem_s2d=tuned)
    compiled = step1.lower(state1, batches1[0]).compile(copts)
    ca = compiled.cost_analysis() or {}
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))

    kind = jax.devices()[0].device_kind
    hbm = HBM_PEAK_GBPS.get(kind)
    peak = PEAK_BF16.get(kind)
    if not (hbm and peak):
        raise SystemExit(f"no peak numbers for device kind {kind!r}")

    hbm_bound_ms = bytes_accessed / (hbm * 1e9) * 1e3 / n_dev
    mxu_bound_ms = flops / (peak * n_dev) * 1e3
    bound_ms = max(hbm_bound_ms, mxu_bound_ms)

    # 2. the measured number, at the tracked bench configuration
    step, state, batches, gb, n_dev = build(
        args.batch, args.image_size, args.dtype, stem_s2d=tuned,
        unroll=args.unroll, copts=copts)
    sec, state = timeit(step, state, batches,
                        max(args.steps // max(args.unroll, 1), 1),
                        unroll=args.unroll)
    measured_ms = sec * 1e3

    out = {
        "device_kind": kind,
        "batch_per_chip": args.batch,
        "bytes_accessed_gb_per_step": round(bytes_accessed / 1e9, 3),
        "model_gflops_per_step": round(flops / 1e9, 1),
        "hbm_peak_gbps": hbm,
        "hbm_bound_ms": round(hbm_bound_ms, 3),
        "mxu_bound_ms": round(mxu_bound_ms, 3),
        "roofline_bound_ms": round(bound_ms, 3),
        "measured_ms": round(measured_ms, 3),
        "pct_of_roofline": round(100 * bound_ms / measured_ms, 1),
        "headroom_pct": round(100 * (measured_ms - bound_ms) / measured_ms,
                              1),
        "binding_resource": ("hbm" if hbm_bound_ms >= mxu_bound_ms
                             else "mxu"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
