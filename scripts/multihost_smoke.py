#!/usr/bin/env python
"""Two-process multi-host smoke test (SURVEY.md section 6.8 DCN path).

Validates the real `jax.distributed.initialize` + global-mesh code path
without a TPU pod: two local processes, each with 2 virtual CPU devices,
form one 4-device 'data' mesh; each process feeds its local shard of the
global batch (`parallel.mesh.shard_batch` multi-process branch) and runs
the jitted DP train step. Process 0 prints the loss; both assert the step
ran and params match across processes.

Usage: python scripts/multihost_smoke.py            (parent; spawns ranks)
       python scripts/multihost_smoke.py --rank N   (child, internal)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NPROC = 2
DEV_PER_PROC = 2


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def child(rank: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NPROC,
        process_id=rank,
    )
    assert jax.process_count() == NPROC
    assert jax.device_count() == NPROC * DEV_PER_PROC

    import numpy as np

    from rgb_proprioceptive_pose_estimator_tpu.config import preset
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer,
        make_train_step,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import build_model
    from rgb_proprioceptive_pose_estimator_tpu.parallel import mesh as pmesh

    cfg = preset("pr1").override(**{"data.batch_size": 8,
                                    "data.synthetic_size": 64,
                                    "data.num_workers": 2})
    mesh = pmesh.make_mesh()           # all 4 global devices
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_state(cfg, tx, seed=0)
    state = jax.device_put(state, pmesh.replicated_sharding(mesh))

    # the REAL pipeline in multi-process mode: every rank derives the same
    # sampler stream and feeds only its local slice of each global batch
    from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import (
        HostPipeline,
        build_dataset,
    )

    pipe = HostPipeline(build_dataset(cfg), cfg.data,
                        sharding=pmesh.batch_sharding(mesh), train=True)
    step = make_train_step(model, tx, cfg.train)
    for _ in range(3):
        state, metrics = step(state, next(pipe))
    loss = float(jax.device_get(metrics["loss"]))
    pipe.close()
    assert np.isfinite(loss)
    # params are replicated: every process sees identical values
    p0 = float(jax.device_get(jax.tree.leaves(state.params)[0]).ravel()[0])
    print(f"rank {rank}: loss={loss:.6f} p0={p0:.8f} "
          f"procs={jax.process_count()} devices={jax.device_count()}")


def parent() -> int:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(r),
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(NPROC)
    ]
    ok = True
    outs = []
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            # hung rank (port race / dead peer): kill the whole fleet and
            # report FAILED instead of leaking orphans + raising
            for q in procs:
                q.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        if p.returncode != 0:
            ok = False
        print(f"--- rank {r} (exit {p.returncode}) ---")
        print("\n".join(out.strip().splitlines()[-3:]))
    # replicated params must agree across processes
    vals = [l for o in outs for l in o.splitlines() if l.startswith("rank")]
    p0s = {l.split("p0=")[1].split()[0] for l in vals if "p0=" in l}
    if len(vals) == NPROC and len(p0s) == 1 and ok:
        print("MULTIHOST SMOKE: OK (losses computed, params replicated)")
        return 0
    print("MULTIHOST SMOKE: FAILED")
    return 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=-1)
    ap.add_argument("--port", type=int, default=0)
    args = ap.parse_args()
    if args.rank >= 0:
        child(args.rank, args.port)
    else:
        sys.exit(parent())
