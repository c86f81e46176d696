#!/usr/bin/env python
"""Host input-pipeline benchmark (SURVEY.md section 8 hard-part 1).

Measures decoded+augmented images/sec through the host pipeline (HDF5 read
-> crop/flip/jitter -> batch assembly -> device_put), for both the native
C++ engine and the numpy backend. The north-star budget is ~20k images/sec
/chip x 8 chips = 160k/sec per host at 128x128 (BASELINE.json:5).

Prints one JSON line per backend (informational; the driver-tracked metric
comes from bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--src-size", type=int, default=160)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--workers", type=int, default=0,
                    help="0 = cpu count")
    args = ap.parse_args()

    from rgb_proprioceptive_pose_estimator_tpu.config import DataConfig
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        HDF5DemoStore,
        write_demo_fixture,
    )
    from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import HostPipeline

    workers = args.workers or (os.cpu_count() or 1)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.hdf5")
        write_demo_fixture(path, n_demos=4, steps=80, cameras=("agentview",),
                           image_hw=args.src_size, proprio_dim=32)

        for use_native, label in ((True, "native_cc"), (False, "numpy")):
            store = HDF5DemoStore(path, cameras=("agentview",),
                                  image_size=args.image_size,
                                  use_native=use_native)
            if use_native:
                from rgb_proprioceptive_pose_estimator_tpu.runtime import native

                if not native.available():
                    print(json.dumps({"backend": label,
                                      "error": "native lib unavailable"}))
                    continue
            cfg = DataConfig(source="hdf5", path=path,
                             batch_size=args.batch_size,
                             num_workers=workers, prefetch=2)
            pipe = HostPipeline(store, cfg, sharding=None, train=True)
            next(pipe)  # warmup
            t0 = time.perf_counter()
            for _ in range(args.batches):
                next(pipe)
            dt = time.perf_counter() - t0
            pipe.close()
            rate = args.batch_size * args.batches / dt
            print(json.dumps({
                "metric": f"host pipeline images/sec ({label}, "
                          f"{args.image_size}x{args.image_size}, "
                          f"{workers} workers)",
                "value": round(rate, 1),
                "unit": "images/sec",
            }))


if __name__ == "__main__":
    main()
