"""Public API: train / evaluate / predict (C8, BASELINE.json:5
"matching its public train/eval/predict API").

`train` runs the full loop, `evaluate` restores a checkpoint and reports
cm/deg pose MAE, `predict` maps a single observation (or batch) to a pose.
`Predictor` is the persistent form an external robot stack would hold
(SURVEY.md section 4.3): fixed-shape jitted apply, recompile-free across
calls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax
import numpy as np

from rgb_proprioceptive_pose_estimator_tpu.config import Config
from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import (
    HostPipeline,
    build_dataset,
)
from rgb_proprioceptive_pose_estimator_tpu.engine.loop import (
    evaluate_pipeline,
    fit,
)
from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
    make_eval_step,
    make_optimizer,
    make_predict_fn,
)
from rgb_proprioceptive_pose_estimator_tpu.models.fusion import build_model
from rgb_proprioceptive_pose_estimator_tpu.utils.checkpoint import CheckpointManager


def train(cfg: Config) -> Dict[str, Any]:
    """Train per config; returns {state, model, mesh, metrics, ckpt_dir}."""
    return fit(cfg)


def _restore(cfg: Config, ckpt_dir: Optional[str], step: Optional[int]):
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    template = create_state(cfg, tx, seed=cfg.train.seed)
    mngr = CheckpointManager(ckpt_dir or cfg.train.ckpt_dir,
                             keep=cfg.train.ckpt_keep, async_save=False)
    state, _, got_step = mngr.restore(template, step)
    mngr.close()
    return model, state, got_step


def evaluate(cfg: Config, ckpt_dir: Optional[str] = None,
             step: Optional[int] = None,
             max_batches: int = 0,
             split: str = "auto",
             data_path: Optional[str] = None) -> Dict[str, float]:
    """Restore a checkpoint and report metrics (pos MAE cm / rot MAE deg,
    BASELINE.json:2) over the eval transform pipeline (no augmentation).

    split="auto" evaluates the held-out split when cfg.data.val_fraction
    is set, else the full dataset (the reference research-repo behavior).
    data_path evaluates a different demo file than the training config
    (e.g. a held-out demo collection); it implies split="all"."""
    if data_path is not None:
        cfg = cfg.override(**{"data.path": data_path,
                              "data.source": "hdf5",
                              "data.val_fraction": 0.0})
        if split == "auto":
            split = "all"
    if split == "auto":
        split = "val" if cfg.data.val_fraction > 0 else "all"
    model, state, got_step = _restore(cfg, ckpt_dir, step)
    dataset = build_dataset(cfg, split=split)
    bs = min(cfg.data.batch_size, len(dataset))
    pipe = HostPipeline(dataset, cfg.data, sharding=None, train=False,
                        batch_size=bs)
    eval_step = make_eval_step(model, cfg.train)
    out = evaluate_pipeline(eval_step, state, pipe, max_batches=max_batches)
    out["step"] = got_step
    pipe.close()
    return out


class Predictor:
    """Checkpoint-backed pose predictor: obs -> (pos, quat).

    Observations may be a single sample (unbatched) or a batch:
        obs["images"][camera]: uint8 (H,W,3) / (T,H,W,3) / (B,[T,]H,W,3)
        obs["proprio"]:        float  (D,) / (T,D) / (B,[T,]D)
    Returns float32 numpy (pos, quat) with the batch dim matching the input
    (squeezed for unbatched input). Inputs are padded to a fixed batch size
    so repeated calls never recompile (SURVEY.md section 4.3).
    """

    def __init__(self, cfg: Config, ckpt_dir: Optional[str] = None,
                 step: Optional[int] = None, max_batch: int = 8,
                 state=None, model=None):
        self.cfg = cfg
        if state is None or model is None:
            model, state, _ = _restore(cfg, ckpt_dir, step)
        self.model = model
        self.state = state
        self.max_batch = max_batch
        self._fn = make_predict_fn(model)

    def _batched(self, obs: Dict[str, Any]) -> Tuple[Dict[str, Any], int, bool]:
        m = self.cfg.model
        # infer whether input is unbatched from proprio/image rank
        if m.use_proprio:
            p = np.asarray(obs["proprio"], dtype=np.float32)
            expected = 1 if m.temporal_frames == 1 else 2
            unbatched = p.ndim == expected
        else:
            cam = m.cameras[0]
            img = np.asarray(obs["images"][cam])
            expected = 3 if m.temporal_frames == 1 else 4
            unbatched = img.ndim == expected

        def prep(x):
            x = np.asarray(x)
            return x[None] if unbatched else x

        batch: Dict[str, Any] = {}
        if m.backbone != "none":
            batch["images"] = {c: prep(obs["images"][c]) for c in m.cameras}
            n = next(iter(batch["images"].values())).shape[0]
        if m.use_proprio:
            batch["proprio"] = prep(obs["proprio"]).astype(np.float32)
            n = batch["proprio"].shape[0]

        # pad to a multiple of the compiled batch size (no recompiles for
        # any n <= max_batch; larger batches compile once per padded size)
        target = n + ((-n) % self.max_batch)

        def padded(x):
            if x.shape[0] == target:
                return x
            reps = np.concatenate(
                [x, np.repeat(x[-1:], target - x.shape[0], axis=0)])
            return reps

        batch = jax.tree.map(padded, batch)
        return batch, n, unbatched

    def __call__(self, obs: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray]:
        batch, n, unbatched = self._batched(obs)
        pos, quat = self._fn(self.state.variables(), batch)
        pos = np.asarray(pos[:n], dtype=np.float32)
        quat = np.asarray(quat[:n], dtype=np.float32)
        if unbatched:
            pos, quat = pos[0], quat[0]
        return pos, quat


def predict(cfg: Config, obs: Dict[str, Any],
            ckpt_dir: Optional[str] = None, step: Optional[int] = None
            ) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot convenience wrapper; use `Predictor` for repeated calls."""
    return Predictor(cfg, ckpt_dir=ckpt_dir, step=step)(obs)
