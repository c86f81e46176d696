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

import os as _os

from rgb_proprioceptive_pose_estimator_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    DistConfig,
    preset,
    PRESETS,
)

if not _os.environ.get("_RPPE_RENDER_WORKER"):
    # the isolated GL render child (data/playback._render_in_subprocess)
    # must NOT import jax: it neither needs the multi-second import nor
    # may co-host XLA:CPU's LLVM with software-mesa's (the SIGABRT pairing
    # the isolation exists to prevent). Everything the worker touches
    # (playback, hdf5_store, augment) is jax-free.
    from rgb_proprioceptive_pose_estimator_tpu.api import (
        train, evaluate, predict, Predictor,
    )
    from rgb_proprioceptive_pose_estimator_tpu.utils.sweep import run_sweep

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
    "run_sweep",
    "__version__",
]
