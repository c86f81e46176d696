"""Device mesh construction + data-parallel shardings (C12).

Parallelism design (SURVEY.md section 3.2): pure data parallelism over a 1-D
mesh ``('data',)``. Batches are sharded on 'data'; parameters, optimizer
state, and BN statistics are replicated. The gradient all-reduce is NOT a
separate communication library call (no NCCL/MPI -- SURVEY.md section 6.8):
it is a psum XLA compiles into the single jitted train step, riding ICI
within a slice and DCN transparently across hosts after
``jax.distributed.initialize``.

TP/PP/SP/EP are deliberately absent: the largest model (ResNet-50) fits
trivially per chip, there is no attention/long-sequence dimension, and no
MoE (SURVEY.md section 3.2 records the rationale).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rgb_proprioceptive_pose_estimator_tpu.config import DistConfig

DATA_AXIS = "data"


def init_distributed(cfg: Optional[DistConfig] = None) -> None:
    """Multi-host init (no-op for single process). Call before make_mesh."""
    if cfg is not None and cfg.multihost:
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator or None,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id,
        )


def make_mesh(num_devices: int = 0, axis: str = DATA_AXIS,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices
    (0 = all). Within a slice the axis maps onto ICI neighbors because
    jax.devices() enumerates in physical torus order."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        if jax.process_count() > 1:
            # slicing the global device list would strip some processes of
            # all their devices while they still participate in the run
            raise ValueError(
                "dist.num_devices is single-process only; under multihost "
                "the mesh must span all global devices (got "
                f"num_devices={num_devices}, processes="
                f"{jax.process_count()})")
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading (batch) dim sharded across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], sharding: NamedSharding) -> Dict[str, Any]:
    """Host (numpy) batch dict -> device arrays sharded on the batch dim.

    Single-process: jax.device_put splits the global array across the mesh.
    Multi-process: each process holds its local shard of the global batch and
    we assemble a global jax.Array from process-local data.
    """
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, batch)
