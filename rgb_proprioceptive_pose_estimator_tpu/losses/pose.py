"""Pose regression loss and evaluation metrics.

Capability C6 (BASELINE.json:2,5): loss = MSE(position) + geodesic/quaternion
orientation distance; tracked metrics are position MAE in cm and orientation
MAE in degrees. The training default for orientation is the smooth
antipodal-safe chordal surrogate 1 - <q,q'>^2; the arccos geodesic form is
available behind `rot_loss="geodesic"` (clamped -- SURVEY.md section 8
hard-part 3).
"""

from __future__ import annotations

from typing import Dict, Tuple

import chex
import jax
import jax.numpy as jnp

from rgb_proprioceptive_pose_estimator_tpu.ops import pose_math


def pose_loss(
    pred_pos: jax.Array,
    pred_quat: jax.Array,
    target_pos: jax.Array,
    target_quat: jax.Array,
    pos_weight: float = 1.0,
    rot_weight: float = 1.0,
    rot_loss: str = "chordal",
    pos_loss: str = "mse",
    huber_delta: float = 0.05,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Return (scalar loss, aux dict). Inputs: (..., 3) and (..., 4).

    `pred_quat` need not be pre-normalized; it is normalized here (the model
    head also normalizes, which makes this a no-op there, but keeps the loss
    safe standalone). Loss math runs in float32 regardless of compute dtype.
    """
    # boundary sanity (SURVEY.md section 6.2): static, free under jit
    chex.assert_equal_shape([pred_pos, target_pos])
    chex.assert_equal_shape([pred_quat, target_quat])
    chex.assert_axis_dimension(pred_pos, -1, 3)
    chex.assert_axis_dimension(pred_quat, -1, 4)
    pred_pos = pred_pos.astype(jnp.float32)
    pred_quat = pose_math.quat_normalize(pred_quat.astype(jnp.float32))
    target_pos = target_pos.astype(jnp.float32)
    target_quat = pose_math.quat_normalize(target_quat.astype(jnp.float32))

    # true MSE (mean over coordinates too, torch nn.MSELoss convention --
    # a coordinate SUM would weight position 3x relative to rotation)
    err = pred_pos - target_pos
    if pos_loss == "mse":
        pos_l = jnp.mean(jnp.square(err))
    elif pos_loss == "huber":
        # torch nn.HuberLoss(reduction="mean", delta): per-coordinate
        # 0.5*e^2 for |e| <= delta, delta*(|e| - 0.5*delta) beyond --
        # linear tails cap the pull of demo outliers / mislabeled frames
        d = jnp.float32(huber_delta)
        a = jnp.abs(err)
        per = jnp.where(a <= d, 0.5 * jnp.square(err), d * (a - 0.5 * d))
        pos_l = jnp.mean(per)
    else:
        raise ValueError(f"unknown pos_loss {pos_loss!r}")
    if rot_loss == "chordal":
        rot_l = jnp.mean(pose_math.quat_chordal_distance(pred_quat, target_quat))
    elif rot_loss == "geodesic":
        rot_l = jnp.mean(pose_math.quat_geodesic_angle(pred_quat, target_quat))
    else:
        raise ValueError(f"unknown rot_loss {rot_loss!r}")

    loss = pos_weight * pos_l + rot_weight * rot_l
    aux = {"loss": loss, "pos_loss": pos_l, "rot_loss": rot_l}
    return loss, aux


def pose_metrics(
    pred_pos: jax.Array,
    pred_quat: jax.Array,
    target_pos: jax.Array,
    target_quat: jax.Array,
) -> Dict[str, jax.Array]:
    """Evaluation metrics matching the reference's reporting units
    (BASELINE.json:2 "pose MAE (cm / deg)"): positions are in meters ->
    cm; orientation error is the geodesic angle in degrees."""
    pred_pos = pred_pos.astype(jnp.float32)
    pred_quat = pose_math.quat_normalize(pred_quat.astype(jnp.float32))
    target_pos = target_pos.astype(jnp.float32)
    target_quat = pose_math.quat_normalize(target_quat.astype(jnp.float32))

    pos_err_cm, rot_err_deg = pose_errors(pred_pos, pred_quat,
                                          target_pos, target_quat)
    return {
        "pos_mae_cm": jnp.mean(pos_err_cm),
        "rot_mae_deg": jnp.mean(rot_err_deg),
    }


def pose_errors(
    pred_pos: jax.Array,
    pred_quat: jax.Array,
    target_pos: jax.Array,
    target_quat: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """PER-SAMPLE pose errors in reporting units: (pos error cm, geodesic
    rotation error deg), each shaped like the batch. The unreduced form
    behind pose_metrics; evaluate(percentiles=True) quantiles these."""
    pred_pos = pred_pos.astype(jnp.float32)
    pred_quat = pose_math.quat_normalize(pred_quat.astype(jnp.float32))
    target_pos = target_pos.astype(jnp.float32)
    target_quat = pose_math.quat_normalize(target_quat.astype(jnp.float32))

    pos_err_m = jnp.linalg.norm(pred_pos - target_pos, axis=-1)
    # no gradient here: report true zeros (grad_safe clip would floor the
    # metric at 0.16 deg)
    ang_rad = pose_math.quat_geodesic_angle(pred_quat, target_quat,
                                            grad_safe=False)
    return pos_err_m * 100.0, ang_rad * (180.0 / jnp.pi)
