"""Observation ring buffer for temporal-stacked inference (C11 deployment).

A robot control loop produces one observation per tick; a temporal model
(`temporal_frames=T`) wants the T most recent frames. This buffer does the
windowing with clamp-at-start padding, matching the training-side windowing
of `data/hdf5_store.py` exactly, so `Predictor` sees the same input
distribution online as the model saw in training.

    buf = ObsBuffer(cfg.model)
    pred = Predictor(cfg)
    for obs in control_loop:        # obs: single-step images/proprio
        pos, quat = pred(buf.push(obs))
"""

from __future__ import annotations

from collections import deque
from typing import Any, Dict

import numpy as np

from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig


class ObsBuffer:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self._frames: deque = deque(maxlen=max(cfg.temporal_frames, 1))

    def reset(self) -> None:
        """Call at episode boundaries."""
        self._frames.clear()

    def push(self, obs: Dict[str, Any]) -> Dict[str, Any]:
        """Add a single-step observation; return the model-ready
        (unbatched) temporally-stacked observation."""
        self._frames.append(obs)
        t = self.cfg.temporal_frames
        if t == 1:
            return obs
        # clamp-at-start: repeat the oldest frame, same as training windows
        frames = list(self._frames)
        frames = [frames[0]] * (t - len(frames)) + frames

        out: Dict[str, Any] = {}
        if self.cfg.backbone != "none":
            out["images"] = {
                cam: np.stack([np.asarray(f["images"][cam]) for f in frames])
                for cam in self.cfg.cameras
            }
        if self.cfg.use_proprio:
            out["proprio"] = np.stack(
                [np.asarray(f["proprio"], dtype=np.float32) for f in frames])
        return out
