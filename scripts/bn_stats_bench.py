#!/usr/bin/env python
"""Microbenchmark: per-channel BN statistics strategies on TPU.

The round-1 trace shows BN statistic reductions at ~24% of the train step
running at ~270 GB/s (a third of v5e HBM peak). Candidates:

  reduce : the current path -- jnp.mean / jnp.mean(x^2) (XLA reduce fusion)
  matmul : route the reductions through the MXU -- sum = ones @ x2d,
           sumsq = einsum('mc,mc->c', x, x) (contraction over rows streams
           x at full HBM bandwidth; f32 accumulation via
           preferred_element_type, exact for bf16 inputs)
  pallas : one fused pass computing (sum, sumsq) in a single read of x
           (ops/pallas_fused.channel_stats)

Each produces (mean, mean_sq) in f32 given NHWC input; numerical agreement
is asserted before timing.

Usage: python scripts/bn_stats_bench.py
"""

from __future__ import annotations

# runnable as python scripts/bn_stats_bench.py from the repo root without
# PYTHONPATH: the package lives one directory above this file
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [  # (N, H, W, C) activations of pr3 ResNet-18 @128, batch 512
    (512, 64, 64, 64),
    (512, 32, 32, 64),
    (512, 16, 16, 128),
    (512, 8, 8, 256),
    (512, 4, 4, 512),
]


def stats_reduce(x):
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes)
    return mean, mean_sq


def stats_matmul(x):
    from rgb_proprioceptive_pose_estimator_tpu.ops.bn_stats import (
        channel_mean_meansq_matmul,
    )
    return channel_mean_meansq_matmul(x)


def stats_pallas(x):
    from rgb_proprioceptive_pose_estimator_tpu.ops.pallas_fused import (
        channel_stats,
    )
    n = x.size // x.shape[-1]
    s, ss = channel_stats(x)
    return s / n, ss / n


def timeit(fn, x, steps=50):
    f = jax.jit(fn)
    m, ms = f(x)
    jax.device_get(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        m, ms = f(x)
    jax.device_get(m)
    dt = (time.perf_counter() - t0) / steps
    return dt, (np.asarray(jax.device_get(m)), np.asarray(jax.device_get(ms)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    impls = {"reduce": stats_reduce, "matmul": stats_matmul,
             "pallas": stats_pallas}
    for shape in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, jnp.float32).astype(args.dtype)
        gb = x.size * x.dtype.itemsize / 1e9
        row = {"shape": list(shape), "read_gb": round(gb, 4)}
        ref = None
        for name, fn in impls.items():
            try:
                dt, (m, ms) = timeit(fn, x, args.steps)
            except Exception as e:
                row[name] = f"error: {repr(e)[:80]}"
                continue
            if ref is None:
                ref = (m, ms)
            else:
                np.testing.assert_allclose(m, ref[0], rtol=1e-4, atol=1e-5)
                np.testing.assert_allclose(ms, ref[1], rtol=1e-3, atol=1e-4)
            row[name] = {"us": round(dt * 1e6, 1),
                         "gbps": round(gb / dt, 1)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
