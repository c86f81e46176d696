#!/usr/bin/env python
"""XLA:TPU compiler-option sweep for the flagship train step (VERDICT r1
next-1: "do the XLA flag/layout sweep").

Compiles the pr3 train step AOT with each candidate compiler option (via
`lowered.compile({...})` -- client-side XLA_FLAGS can't carry TPU flags
through the axon tunnel) and times it against the baseline. Unknown
options fail server-side at compile; they're caught and reported, so the
sweep doubles as discovery of which knobs this libtpu accepts.

Usage:
  PYTHONPATH=/root/.axon_site:. python scripts/flag_sweep.py --batch 512
  ... --only xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_x=y   # ad-hoc set
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

CANDIDATES = [
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    {"xla_tpu_enable_aggressive_loop_fusion": "true"},
    {"xla_tpu_use_bundle_aware_cost_model": "true"},
    {"xla_tpu_rwb_fusion": "false"},
    {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"},
    {"xla_tpu_dot_dot_fusion": "true"},
    {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    {"xla_tpu_vector_load_fusion": "true"},
    {"xla_tpu_async_copy_bandwidth_scaling_factor": "1.5"},
]


def time_compiled(compiled, state, batches, steps: int, warmup: int = 4):
    for i in range(max(warmup, 1)):
        state, metrics = compiled(state, batches[i % 2])
    float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = compiled(state, batches[i % 2])
    float(jax.device_get(metrics["loss"]))
    return (time.perf_counter() - t0) / steps, state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default="", help="comma k=v list instead of "
                    "the built-in candidates")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, "scripts")
    from perf_probe import build

    step, state0, batches, gb, n_dev = build(args.batch, args.image_size,
                                             args.dtype)
    lowered = step.lower(state0, batches[0])

    if args.only:
        cands = [dict(kv.split("=", 1) for kv in args.only.split(","))]
    else:
        cands = CANDIDATES

    def fresh_state():
        # compiled executables donate the state buffer; rebuild per trial
        _, s, b, _, _ = build(args.batch, args.image_size, args.dtype)
        return s, b

    results = []
    # baseline (no options)
    base = lowered.compile()
    best_base = np.inf
    for _ in range(args.repeats):
        s, b = fresh_state()
        ms, _ = time_compiled(base, s, b, args.steps)
        best_base = min(best_base, ms)
    print(json.dumps({"options": None, "ms": round(best_base * 1e3, 3),
                      "img_s_chip": round(gb / best_base / n_dev, 1)}),
          flush=True)

    for opts in cands:
        try:
            comp = lowered.compile(opts)
        except Exception as e:
            print(json.dumps({"options": opts,
                              "error": repr(e)[:160]}), flush=True)
            continue
        best = np.inf
        for _ in range(args.repeats):
            s, b = fresh_state()
            ms, _ = time_compiled(comp, s, b, args.steps)
            best = min(best, ms)
        results.append((best, opts))
        print(json.dumps({
            "options": opts, "ms": round(best * 1e3, 3),
            "img_s_chip": round(gb / best / n_dev, 1),
            "vs_base_pct": round(100 * (best_base / best - 1), 2),
        }), flush=True)

    results.sort()
    if results:
        print(json.dumps({"winner": results[0][1],
                          "ms": round(results[0][0] * 1e3, 3)}))


if __name__ == "__main__":
    main()
