from rgb_proprioceptive_pose_estimator_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
