#!/usr/bin/env python
"""Benchmark harness -> JSON lines (driver contract: the LAST line is the
tracked metric).

Metric (BASELINE.json:2): images/sec/chip (train) at 128x128 on the
flagship config-3 model (ResNet-18 RGB + proprio late-fusion,
BASELINE.json:9). Baseline = the driver's north-star target of 20,000
images/sec/chip (BASELINE.json:5); vs_baseline = value / 20000.

Measures the full jitted train step (fwd + loss + bwd + DP psum + optax +
BN stats) with device-resident input batches -- the host pipeline is
benchmarked separately in bench_input.py so this number isolates the
compute path the north-star describes.

The tracked line is self-describing (VERDICT r1 weak-6): ms/step, model
FLOPs/image (XLA cost analysis of the compiled step), and %-of-peak bf16
compute, so later-round regressions are attributable. A preceding
informational line reports ResNet-50@224 bf16 (config-4).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 20_000.0

# peak dense bf16 FLOP/s per chip by device kind (public spec sheets)
PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e: 197 TFLOP/s bf16
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def bench_config(preset_name: str, image_size: int, dtype: str,
                 per_chip: int, steps: int, warmup: int,
                 use_pallas: bool):
    """Run the jitted train step on device-resident batches; returns a
    dict of measurements."""
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

    cfg = preset(preset_name).override(**{
        "model.image_size": image_size,
        "model.dtype": dtype,
        "model.use_pallas": bool(use_pallas),
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

    # model FLOPs from the compiled step's XLA cost analysis (includes
    # fwd+bwd+optimizer; best-effort -- some backends return no estimate)
    flops_per_step = None
    try:
        donated = jax.tree.map(lambda x: x, state)  # keep `state` alive
        cost = step.lower(donated, batches[0]).compile().cost_analysis()
        if cost:
            f = cost.get("flops", 0.0)
            if f and np.isfinite(f) and f > 0:
                flops_per_step = float(f)
    except Exception:
        pass

    # Synchronize by fetching a real value: device_get round-trips actual
    # bytes, which stays honest on proxy/tunnel backends where
    # block_until_ready can return before execution completes.
    for i in range(max(warmup, 1)):   # >=1: compile outside the timer
        state, metrics = step(state, batches[i % 2])
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batches[i % 2])
    loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)

    imgs_per_sec = global_batch * steps / dt
    out = {
        "value": round(imgs_per_sec / n_dev, 1),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt / steps * 1e3, 3),
        "batch_per_chip": per_chip,
        "n_devices": n_dev,
        "device_kind": jax.devices()[0].device_kind,
    }
    if flops_per_step:
        out["model_gflops_per_image"] = round(
            flops_per_step / global_batch / 1e9, 3)
        peak = PEAK_BF16.get(out["device_kind"])
        if peak:
            achieved = flops_per_step / (dt / steps)
            out["pct_peak_bf16"] = round(100.0 * achieved / (peak * n_dev), 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-chip", type=int, default=0,
                    help="per-chip batch size (0 = auto by backend)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--skip-extra", action="store_true",
                    help="skip the informational ResNet-50@224 line")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    # 512/chip measured best on v5e (batch sweep in docs/DESIGN.md)
    per_chip = args.batch_per_chip or (512 if on_tpu else 16)

    if not args.skip_extra and on_tpu:
        # informational: config-4 (ResNet-50, 224x224, bf16) -- printed
        # BEFORE the tracked line so the driver parses the tracked metric
        try:
            extra = bench_config("pr4", 224, "bfloat16",
                                 per_chip=min(per_chip, 128),
                                 steps=max(args.steps // 2, 10),
                                 warmup=args.warmup, use_pallas=args.pallas)
            extra["metric"] = ("images/sec/chip (train, resnet50+proprio "
                               "fusion, 224x224, bfloat16) [informational]")
            print(json.dumps(extra))
        except Exception as e:   # never let the extra line kill the bench
            print(json.dumps({"metric": "resnet50 informational line",
                              "error": repr(e)[:200]}))

    r = bench_config("pr3", args.image_size, args.dtype, per_chip,
                     args.steps, args.warmup, args.pallas)
    r["metric"] = ("images/sec/chip (train, resnet18+proprio fusion, "
                   f"{args.image_size}x{args.image_size}, {args.dtype})")
    r["vs_baseline"] = round(r["value"] / BASELINE_IMG_PER_SEC_PER_CHIP, 4)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
