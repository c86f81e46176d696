from rgb_proprioceptive_pose_estimator_tpu.utils.metrics import MetricsLogger
from rgb_proprioceptive_pose_estimator_tpu.utils.checkpoint import CheckpointManager

__all__ = ["MetricsLogger", "CheckpointManager"]
