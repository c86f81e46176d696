#!/usr/bin/env python
"""Perf probe for the flagship train step (VERDICT r1 next-1).

Times the jitted pr3 train step at a given batch size, and can dump the
optimized HLO so HBM passes per activation can be counted (how many fused
kernels read/write the big activations -- the roofline question behind the
BN-stats cost).

Usage:
  python scripts/perf_probe.py --batch 512 --steps 30
  python scripts/perf_probe.py --batch 512 --dump-hlo /tmp/step.hlo
  python scripts/perf_probe.py --sweep 256,384,512,768,1024
"""

from __future__ import annotations

# runnable as python scripts/perf_probe.py from the repo root without
# PYTHONPATH: the package lives one directory above this file
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import numpy as np


def build(per_chip: int, image_size: int = 128, dtype: str = "bfloat16",
          use_pallas: bool = False, backbone: str | None = None,
          grad_norm: bool = True, bn_stats: str | None = None,
          stem_s2d: bool = False, unroll: int = 1,
          copts: dict | None = None, flat_opt: bool = False,
          grad_norm_metric: bool = False):
    from rgb_proprioceptive_pose_estimator_tpu.config import preset
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer,
        make_train_step,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
        example_batch,
    )
    from rgb_proprioceptive_pose_estimator_tpu.parallel import mesh as pmesh

    n_dev = len(jax.devices())
    global_batch = per_chip * n_dev
    over = {
        "model.image_size": image_size,
        "model.dtype": dtype,
        "model.use_pallas": use_pallas,
        "data.batch_size": global_batch,
    }
    if backbone:
        over["model.backbone"] = backbone
    if bn_stats:
        over["model.bn_stats"] = bn_stats
    if stem_s2d:
        over["model.stem_s2d"] = True
    if flat_opt:
        over["train.flat_optimizer"] = True
    if grad_norm_metric:
        over["train.log_grad_norm"] = True
    cfg = preset("pr3").override(**over)
    mesh = pmesh.make_mesh(n_dev)
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_state(cfg, tx, seed=0)
    state = jax.device_put(state, pmesh.replicated_sharding(mesh))
    step = make_train_step(model, tx, cfg.train, unroll=unroll)
    bsh = pmesh.batch_sharding(mesh)
    batches = [
        pmesh.shard_batch(example_batch(cfg.model, global_batch, rng=i), bsh)
        for i in range(2)
    ]
    if unroll > 1:
        from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
            stack_microbatches,
        )
        # two rotating stacks built from alternating microbatches
        batches = [stack_microbatches([batches[(i + j) % 2]
                                       for j in range(unroll)], bsh)
                   for i in range(2)]
    if copts:
        step = step.lower(state, batches[0]).compile(copts)
    return step, state, batches, global_batch, n_dev


def timeit(step, state, batches, steps: int, warmup: int = 5,
           unroll: int = 1):
    """Returns seconds per OPTIMIZER step (dispatches / unroll)."""
    for i in range(max(warmup, 1)):
        state, metrics = step(state, batches[i % 2])
    loss = metrics["loss"]
    float(jax.device_get(loss if loss.ndim == 0 else loss[-1]))
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batches[i % 2])
    loss = metrics["loss"]
    float(jax.device_get(loss if loss.ndim == 0 else loss[-1]))
    dt = time.perf_counter() - t0
    return dt / (steps * unroll), state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--backbone", default="")
    ap.add_argument("--bn-stats", default="",
                    help="reduce | matmul | pallas (default: config)")
    ap.add_argument("--stem-s2d", action="store_true")
    ap.add_argument("--flat-opt", action="store_true")
    ap.add_argument("--grad-norm", action="store_true",
                    help="include the grad_norm metric (train.log_grad_norm)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="optimizer steps per dispatch (train.steps_per_call)")
    ap.add_argument("--copts", default="",
                    help="JSON dict of XLA compiler options")
    ap.add_argument("--sweep", default="", help="comma batch sizes")
    ap.add_argument("--dump-hlo", default="", help="write optimized HLO here")
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    sizes = ([int(s) for s in args.sweep.split(",")] if args.sweep
             else [args.batch])
    for b in sizes:
        step, state, batches, gb, n_dev = build(
            b, args.image_size, args.dtype, args.pallas,
            args.backbone or None, bn_stats=args.bn_stats or None,
            stem_s2d=args.stem_s2d, unroll=args.unroll,
            copts=json.loads(args.copts) if args.copts else None,
            flat_opt=args.flat_opt, grad_norm_metric=args.grad_norm)
        if args.dump_hlo:
            lowered = step.lower(state, batches[0])
            compiled = lowered.compile()
            with open(args.dump_hlo, "w") as f:
                f.write(compiled.as_text())
            ca = compiled.cost_analysis() or {}
            print(json.dumps({"dumped": args.dump_hlo,
                              "flops": ca.get("flops"),
                              "bytes accessed": ca.get("bytes accessed")}))
        for _ in range(args.repeats):
            ms, state = timeit(step, state, batches, args.steps,
                               unroll=args.unroll)
            print(json.dumps({
                "batch_per_chip": b,
                "ms_per_step": round(ms * 1e3, 3),
                "images_per_sec_per_chip": round(gb / ms / n_dev, 1),
            }))


if __name__ == "__main__":
    main()
