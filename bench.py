#!/usr/bin/env python
"""Benchmark harness -> one JSON line (driver contract).

Metric (BASELINE.json:2): images/sec/chip (train) at 128x128 on the
flagship config-3 model (ResNet-18 RGB + proprio late-fusion,
BASELINE.json:9). Baseline = the driver's north-star target of 20,000
images/sec/chip (BASELINE.json:5); vs_baseline = value / 20000.

Measures the full jitted train step (fwd + loss + bwd + DP psum + optax +
BN stats) with device-resident input batches -- the host pipeline is
benchmarked separately in bench_input.py so this number isolates the
compute path the north-star describes.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 20_000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-chip", type=int, default=0,
                    help="per-chip batch size (0 = auto by backend)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

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

    on_tpu = jax.default_backend() == "tpu"
    # 512/chip measured best on v5e (batch sweep in docs/DESIGN.md)
    per_chip = args.batch_per_chip or (512 if on_tpu else 16)
    n_dev = len(jax.devices())
    global_batch = per_chip * n_dev

    cfg = preset("pr3").override(**{
        "model.image_size": args.image_size,
        "model.dtype": args.dtype,
        "model.use_pallas": bool(args.pallas),
        "data.batch_size": global_batch,
    })

    mesh = pmesh.make_mesh(n_dev)
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_state(cfg, tx, seed=0)
    state = jax.device_put(state, pmesh.replicated_sharding(mesh))
    step = make_train_step(model, tx, cfg.train)

    bsh = pmesh.batch_sharding(mesh)
    # two rotating device-resident batches so no host transfer is on the
    # timed path
    batches = [
        pmesh.shard_batch(example_batch(cfg.model, global_batch, rng=i), bsh)
        for i in range(2)
    ]

    # Synchronize by fetching a real value: device_get round-trips actual
    # bytes, which stays honest on proxy/tunnel backends where
    # block_until_ready can return before execution completes.
    for i in range(max(args.warmup, 1)):   # >=1: compile outside the timer
        state, metrics = step(state, batches[i % 2])
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batches[i % 2])
    loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)

    imgs_per_sec = global_batch * args.steps / dt
    per_chip_rate = imgs_per_sec / n_dev

    print(json.dumps({
        "metric": "images/sec/chip (train, resnet18+proprio fusion, "
                  f"{args.image_size}x{args.image_size}, {args.dtype})",
        "value": round(per_chip_rate, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip_rate / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
