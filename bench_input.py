#!/usr/bin/env python
"""Host input-pipeline benchmark (SURVEY.md section 8 hard-part 1).

Measures decoded+augmented images/sec through the host pipeline (HDF5 read
-> [JPEG decode ->] crop/flip/jitter -> batch assembly), for the native C++
engine and the numpy backend, on raw-array and JPEG-encoded fixtures. The
north-star budget is ~20k images/sec/chip x 8 chips = 160k/sec per host at
128x128 (BASELINE.json:5).

--workers-sweep runs each configuration at several worker counts to measure
host thread scaling (VERDICT r1 weak-4: the 1-core extrapolation must be
replaced by measured numbers; on a 1-core box the sweep shows saturation,
on a many-core host it shows the scaling curve).

Prints one JSON line per configuration (informational; the driver-tracked
metric comes from bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def bench_pipe(store, path: str, batch_size: int, batches: int,
               workers: int) -> float:
    from rgb_proprioceptive_pose_estimator_tpu.config import DataConfig
    from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import HostPipeline

    cfg = DataConfig(source="hdf5", path=path, batch_size=batch_size,
                     num_workers=workers, prefetch=2)
    pipe = HostPipeline(store, cfg, sharding=None, train=True)
    next(pipe)  # warmup
    t0 = time.perf_counter()
    for _ in range(batches):
        next(pipe)
    dt = time.perf_counter() - t0
    pipe.close()
    return batch_size * batches / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--src-size", type=int, default=160)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--workers", type=int, default=0, help="0 = cpu count")
    ap.add_argument("--workers-sweep", default="",
                    help="comma list, e.g. 1,2,4,8 (overrides --workers)")
    ap.add_argument("--cache-images", action="store_true",
                    help="RAM-cache images (default: off, so the bench "
                    "includes HDF5 reads like a big real dataset would)")
    args = ap.parse_args()

    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        HDF5DemoStore,
        write_demo_fixture,
    )

    worker_counts = ([int(w) for w in args.workers_sweep.split(",")]
                     if args.workers_sweep
                     else [args.workers or (os.cpu_count() or 1)])

    # full augmentation (the expensive path): the conservative config
    # defaults disable geometric aug for label consistency, but the bench
    # measures pixel-work throughput, not label fidelity
    aug_kw = dict(crop_scale=(0.8, 1.0), hflip_prob=0.5,
                  jitter_prob=0.8)

    with tempfile.TemporaryDirectory() as td:
        fixtures = {}
        for enc in ("raw", "jpeg"):
            p = os.path.join(td, f"bench_{enc}.hdf5")
            write_demo_fixture(p, n_demos=4, steps=80,
                               cameras=("agentview",),
                               image_hw=args.src_size, proprio_dim=32,
                               encoding=enc)
            fixtures[enc] = p

        runs = [("raw", True, "native_cc"),
                ("raw", False, "numpy"),
                ("jpeg", True, "jpeg_decode+native_cc"),
                ("jpeg", False, "jpeg_decode+numpy")]
        for enc, use_native, label in runs:
            if use_native:
                from rgb_proprioceptive_pose_estimator_tpu.runtime import native

                if not native.available():
                    print(json.dumps({"backend": label,
                                      "error": "native lib unavailable"}))
                    continue
            path = fixtures[enc]
            for workers in worker_counts:
                store = HDF5DemoStore(
                    path, cameras=("agentview",),
                    image_size=args.image_size, use_native=use_native,
                    cache_images=bool(args.cache_images), **aug_kw)
                rate = bench_pipe(store, path, args.batch_size,
                                  args.batches, workers)
                print(json.dumps({
                    "metric": f"host pipeline images/sec ({label}, "
                              f"{args.image_size}x{args.image_size}, "
                              f"{workers} workers)",
                    "value": round(rate, 1),
                    "unit": "images/sec",
                    "workers": workers,
                    "encoded": enc != "raw",
                }))


if __name__ == "__main__":
    main()
