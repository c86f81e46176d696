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

import argparse
import json
import time

import jax
import numpy as np


def build(per_chip: int, image_size: int = 128, dtype: str = "bfloat16",
          use_pallas: bool = False, backbone: str | None = None,
          grad_norm: bool = True):
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
    cfg = preset("pr3").override(**over)
    mesh = pmesh.make_mesh(n_dev)
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_state(cfg, tx, seed=0)
    state = jax.device_put(state, pmesh.replicated_sharding(mesh))
    step = make_train_step(model, tx, cfg.train)
    bsh = pmesh.batch_sharding(mesh)
    batches = [
        pmesh.shard_batch(example_batch(cfg.model, global_batch, rng=i), bsh)
        for i in range(2)
    ]
    return step, state, batches, global_batch, n_dev


def timeit(step, state, batches, steps: int, warmup: int = 5):
    for i in range(max(warmup, 1)):
        state, metrics = step(state, batches[i % 2])
    float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batches[i % 2])
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    return dt / steps, state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--backbone", default="")
    ap.add_argument("--sweep", default="", help="comma batch sizes")
    ap.add_argument("--dump-hlo", default="", help="write optimized HLO here")
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    sizes = ([int(s) for s in args.sweep.split(",")] if args.sweep
             else [args.batch])
    for b in sizes:
        step, state, batches, gb, n_dev = build(
            b, args.image_size, args.dtype, args.pallas,
            args.backbone or None)
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
            ms, state = timeit(step, state, batches, args.steps)
            print(json.dumps({
                "batch_per_chip": b,
                "ms_per_step": round(ms * 1e3, 3),
                "images_per_sec_per_chip": round(gb / ms / n_dev, 1),
            }))


if __name__ == "__main__":
    main()
