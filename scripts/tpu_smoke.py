#!/usr/bin/env python
"""On-device TPU smoke checks (SURVEY.md section 5.2 "TPU tests").

Run on a host with a real TPU attached (the CPU test suite cannot cover
these): jit compile of every backbone, bf16 train step, Pallas kernels
compiled by Mosaic (not interpreted), profiler trace capture, and a short
throughput probe.

Usage: python scripts/tpu_smoke.py [--trace-dir /tmp/rppe_trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[ok]   {name}  ({time.perf_counter() - t0:.1f}s)")
        return True
    except Exception as e:  # noqa: BLE001 -- smoke harness reports and moves on
        print(f"[FAIL] {name}: {type(e).__name__}: {e}")
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="")
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(f"not on TPU (backend={jax.default_backend()}); aborting")
        return 1
    print("devices:", jax.devices())

    from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig, preset
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer,
        make_train_step,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
        example_batch,
    )

    ok = True

    # 1. every backbone compiles + runs forward on device
    for backbone, size in (("cnn_small", 64), ("resnet18", 128),
                           ("resnet50", 224)):
        def fwd(backbone=backbone, size=size):
            cfg = ModelConfig(backbone=backbone, image_size=size,
                              use_proprio=True, dtype="bfloat16")
            model = build_model(cfg)
            batch = example_batch(cfg, batch_size=8)
            v = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), batch, train=False)
            pos, quat = jax.jit(
                lambda v, b: model.apply(v, b, train=False))(v, batch)
            assert np.all(np.isfinite(np.asarray(pos)))
            assert np.all(np.isfinite(np.asarray(quat)))

        ok &= check(f"forward {backbone} bf16", fwd)

    # 2. full bf16 train step
    def train_step():
        cfg = preset("pr3").override(**{
            "model.dtype": "bfloat16", "data.batch_size": 32})
        model = build_model(cfg.model)
        tx = make_optimizer(cfg.train)
        state = create_state(cfg, tx)
        step = make_train_step(model, tx, cfg.train)
        batch = jax.device_put(example_batch(cfg.model, 32))
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))

    ok &= check("bf16 train step (pr3)", train_step)

    # 3. Pallas kernels compiled by Mosaic
    def pallas_kernels():
        from rgb_proprioceptive_pose_estimator_tpu.ops.pallas_fused import (
            pallas_normalize_u8,
            scale_bias_relu,
        )

        img = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (8, 128, 128, 3), np.uint8))
        out = pallas_normalize_u8(img, (0.485, 0.456, 0.406),
                                  (0.229, 0.224, 0.225), jnp.bfloat16)
        jax.block_until_ready(out)
        x = jnp.asarray(np.random.RandomState(1).randn(
            8, 16, 16, 128).astype(np.float32))
        s = jnp.ones((128,)); b = jnp.zeros((128,))
        y = scale_bias_relu(x, s, b)
        np.testing.assert_allclose(np.asarray(y), np.maximum(
            np.asarray(x), 0), atol=1e-5)

    ok &= check("pallas kernels (mosaic)", pallas_kernels)

    # 4. profiler trace
    if args.trace_dir:
        def trace():
            cfg = preset("pr1")
            model = build_model(cfg.model)
            tx = make_optimizer(cfg.train)
            state = create_state(cfg, tx)
            step = make_train_step(model, tx, cfg.train)
            batch = jax.device_put(example_batch(cfg.model, 32))
            state, m = step(state, batch)  # compile outside trace
            with jax.profiler.trace(args.trace_dir):
                for _ in range(5):
                    state, m = step(state, batch)
                jax.block_until_ready(m["loss"])

        ok &= check(f"profiler trace -> {args.trace_dir}", trace)

    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
