"""Trajectory visualization for `cli predict --plot` (the reference's
test_model.py-style qualitative check, SURVEY.md section 1.3: research
repos judge pose estimators by predicted-vs-ground-truth traces, not only
aggregate MAE).

Renders one PNG per demo: predicted vs target x/y/z position traces over
the trajectory plus per-step position/rotation error panels. matplotlib
is imported lazily with the Agg backend so the package never requires a
display (and never pays the import unless plotting is requested).
"""

from __future__ import annotations

import numpy as np

# prediction = categorical series 1; ground truth = neutral ink, dashed
# (identity is carried by linestyle too, so the pair survives CVD/print)
_PRED = "#2a78d6"
_TARGET = "#52514e"
_GRID = "#d9d8d4"


def plot_trajectory(pred_pos: np.ndarray, target_pos: np.ndarray,
                    pos_err_cm: np.ndarray, rot_err_deg: np.ndarray,
                    path: str, title: str = "") -> str:
    """Write a predicted-vs-target trajectory figure to `path`.

    pred_pos/target_pos: (T, 3) meters; pos_err_cm/rot_err_deg: (T,).
    Returns `path`.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pred_pos = np.asarray(pred_pos, np.float32)
    target_pos = np.asarray(target_pos, np.float32)
    t = np.arange(pred_pos.shape[0])

    fig, axes = plt.subplots(5, 1, figsize=(8, 10), sharex=True,
                             constrained_layout=True)
    fig.set_facecolor("#fcfcfb")
    for ax in axes:
        ax.set_facecolor("#fcfcfb")
        ax.grid(True, color=_GRID, linewidth=0.6)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)

    for i, name in enumerate("xyz"):
        ax = axes[i]
        ax.plot(t, target_pos[:, i], color=_TARGET, linestyle="--",
                linewidth=1.4, label="ground truth")
        ax.plot(t, pred_pos[:, i], color=_PRED, linewidth=2.0,
                label="predicted")
        ax.set_ylabel(f"{name} (m)")
    axes[0].legend(loc="upper right", frameon=False, fontsize=9)

    axes[3].plot(t, np.asarray(pos_err_cm, np.float32), color=_PRED,
                 linewidth=2.0)
    axes[3].set_ylabel("pos err (cm)")
    axes[3].set_ylim(bottom=0)
    axes[4].plot(t, np.asarray(rot_err_deg, np.float32), color=_PRED,
                 linewidth=2.0)
    axes[4].set_ylabel("rot err (deg)")
    axes[4].set_ylim(bottom=0)
    axes[4].set_xlabel("trajectory step")
    axes[4].xaxis.set_major_locator(
        matplotlib.ticker.MaxNLocator(integer=True))
    if title:
        axes[0].set_title(title, fontsize=11, loc="left")

    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
