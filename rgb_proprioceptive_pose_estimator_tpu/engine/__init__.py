from rgb_proprioceptive_pose_estimator_tpu.engine.state import TrainState, create_state
from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
    make_train_step,
    make_eval_step,
    make_optimizer,
)
from rgb_proprioceptive_pose_estimator_tpu.engine.loop import fit

__all__ = [
    "TrainState",
    "create_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "fit",
]
