#!/usr/bin/env python
"""Measure the device-cache gather cost: replicated jnp.take vs the
sharded layout's shard_map-local take (data.cache_layout, data/
cache_shard.py) inside the full jitted pr3 train step.

On one chip the two layouts hold identical bytes and do identical
per-device work, so any ms/step delta IS the shard_map plumbing cost --
the number that says whether the sharded layout's N x capacity comes with
a per-step tax. (Multi-chip equality of the gather program is covered by
the 8-virtual-device tests + dryrun; this script quantifies the single
-chip overhead on real hardware.)

Usage:
  python scripts/cache_layout_bench.py --batch 384 --steps 30 --frames 2048
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import numpy as np


def run(per_chip: int, steps: int, frames: int, windows: int = 5,
        unroll: int = 8, device_aug: bool = True,
        dtype: str = "bfloat16"):
    from rgb_proprioceptive_pose_estimator_tpu.config import (
        TUNED_COMPILER_OPTS,
        preset,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        filter_compiler_options,
        make_cache_gather,
        make_optimizer,
        make_train_step,
        stack_microbatches,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
        example_batch,
    )
    from rgb_proprioceptive_pose_estimator_tpu.parallel import mesh as pmesh

    n_dev = len(jax.devices())
    global_batch = per_chip * n_dev
    margin = 2
    cfg = preset("pr3").override(**{
        "data.batch_size": global_batch,
        "model.dtype": dtype,
        "model.stem_s2d": True,
        "train.steps_per_call": unroll,
        "train.compiler_opts": dict(TUNED_COMPILER_OPTS),
    })
    hw = cfg.model.image_size + (2 * margin if device_aug else 0)

    mesh = pmesh.make_mesh(n_dev)
    bsh = pmesh.batch_sharding(mesh)
    rsh = pmesh.replicated_sharding(mesh)
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)

    aug = None
    if device_aug:
        d = cfg.data
        aug = {"cameras": cfg.model.cameras, "out_hw": cfg.model.image_size,
               "hflip_prob": d.hflip_prob,
               "jitter_brightness": d.jitter_brightness,
               "jitter_contrast": d.jitter_contrast,
               "jitter_saturation": d.jitter_saturation,
               "jitter_hue": d.jitter_hue, "jitter_prob": d.jitter_prob,
               "crop_scale": d.crop_scale, "crop_ratio": d.crop_ratio}

    rs = np.random.RandomState(0)
    # frames divisible by n_dev so the sharded layout tiles evenly
    frames = (frames // n_dev) * n_dev
    host_cache = {cam: rs.randint(0, 256, (frames, hw, hw, 3), np.uint8)
                  for cam in cfg.model.cameras}

    def batch_for(layout: str, rng: int):
        b = {k: v for k, v in example_batch(
            cfg.model, global_batch, rng=rng).items() if k != "images"}
        r = np.random.RandomState(100 + rng)
        if layout == "direct":
            b["images"] = {cam: r.randint(0, 256,
                                          (global_batch, hw, hw, 3),
                                          np.uint8)
                           for cam in cfg.model.cameras}
        elif layout == "replicated":
            b["image_idx"] = r.randint(0, frames,
                                       global_batch).astype(np.int32)
        else:
            # shard-local rows: segment d of the batch indexes rows of
            # shard d only (what the constrained sampler guarantees)
            b["image_idx"] = r.randint(0, frames // n_dev,
                                       global_batch).astype(np.int32)
        return pmesh.shard_batch(b, bsh)

    results = {}
    for layout in ("direct", "replicated", "sharded"):
        # "direct": no cache at all -- device-resident image batches, the
        # tracked-bench configuration; the replicated-vs-direct delta is
        # the cost of the in-step gather itself
        gather = None
        cache = None
        if layout == "replicated":
            cache = {c: jax.device_put(a, rsh)
                     for c, a in host_cache.items()}
        elif layout == "sharded":
            cache = {c: jax.device_put(a, bsh)
                     for c, a in host_cache.items()}
            gather = make_cache_gather(mesh, "data")
        state = jax.device_put(create_state(cfg, tx, seed=0), rsh)
        step = make_train_step(model, tx, cfg.train, device_aug=aug,
                               unroll=unroll, cache_gather=gather)
        micro = [batch_for(layout, i) for i in range(2)]
        batches = [stack_microbatches([micro[(i + j) % 2]
                                       for j in range(unroll)], bsh)
                   for i in range(2)] if unroll > 1 else micro

        def sync(m):
            loss = m["loss"]
            return float(jax.device_get(
                loss if loss.ndim == 0 else loss[-1]))

        state, m = step(state, batches[0], cache)   # compile
        sync(m)
        window_ms = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for i in range(steps // unroll):
                state, m = step(state, batches[i % 2], cache)
            sync(m)
            dt = time.perf_counter() - t0
            window_ms.append(dt / steps * 1e3)
        ms = float(np.median(window_ms))
        results[layout] = {
            "ms_per_step": round(ms, 3),
            "img_per_sec_per_chip": round(global_batch / n_dev /
                                          (ms / 1e3), 1),
            "window_ms": [round(w, 3) for w in window_ms],
        }
        del cache, state, step, micro, batches

    results["sharded_overhead_pct"] = round(
        (results["sharded"]["ms_per_step"] /
         results["replicated"]["ms_per_step"] - 1) * 100, 2)
    results["gather_cost_ms"] = round(
        results["replicated"]["ms_per_step"] -
        results["direct"]["ms_per_step"], 3)
    results.update({"batch_per_chip": per_chip, "frames": frames,
                    "n_devices": n_dev, "device_aug": device_aug,
                    "dtype": dtype,
                    "device_kind": jax.devices()[0].device_kind})
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=384)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--frames", type=int, default=2048)
    p.add_argument("--windows", type=int, default=5)
    p.add_argument("--unroll", type=int, default=8)
    p.add_argument("--no-aug", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    a = p.parse_args()
    out = run(a.batch, a.steps, a.frames, windows=a.windows,
              unroll=a.unroll, device_aug=not a.no_aug, dtype=a.dtype)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
