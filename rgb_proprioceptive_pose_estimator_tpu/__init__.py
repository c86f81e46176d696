"""TPU-native RGB + proprioception pose-estimation framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference ``cremebrule/rgb-proprioceptive-pose-estimator`` (PyTorch).
The reference mount was empty this session (see SURVEY.md section 0), so
capability grounding cites ``BASELINE.json`` lines instead of reference
``file:line``.

Public API (BASELINE.json:5 "matching its public train/eval/predict API"):

    import rgb_proprioceptive_pose_estimator_tpu as rppe
    result = rppe.train(cfg)
    metrics = rppe.evaluate(cfg, checkpoint_dir=...)
    pose    = rppe.predict(ckpt, obs)
"""

from rgb_proprioceptive_pose_estimator_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    DistConfig,
    preset,
    PRESETS,
)
from rgb_proprioceptive_pose_estimator_tpu.api import train, evaluate, predict, Predictor

__version__ = "0.1.0"

__all__ = [
    "Config",
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "DistConfig",
    "preset",
    "PRESETS",
    "train",
    "evaluate",
    "predict",
    "Predictor",
    "__version__",
]
