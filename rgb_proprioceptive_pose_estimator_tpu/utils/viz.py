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


def save_sample_grid(cfg, path: str) -> dict:
    """Write a decoded sample-frame grid (rows = cameras, cols = first
    frame of up to 4 demos) through the SAME eval decode/resize path the
    model trains on. The two classic silent data bugs this catches before
    a wasted training run: a wrong `data.image_key_format`/camera name
    (black or mismatched frames) and BGR-stored images (skin/table colors
    inverted). Returns a small summary dict for the inspect report."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import (
        build_dataset,
    )

    cameras = list(cfg.model.cameras)
    if cfg.model.backbone == "none" or not cameras:
        raise ValueError("inspect --sample needs image input "
                         "(model.cameras non-empty, model.backbone set)")
    dataset = build_dataset(cfg, split="all")
    if hasattr(dataset, "emit_image_indices"):
        dataset.emit_image_indices = False   # want pixels, not cache ids

    # first step of each of the first <=4 demos (hdf5); else first samples
    if hasattr(dataset, "_index"):
        starts = [int(np.nonzero(dataset._index[:, 0] == d)[0][0])
                  for d in np.unique(dataset._index[:, 0])[:4]]
        names = [dataset._demo_keys[int(dataset._index[i, 0])]
                 for i in starts]
    else:
        starts = list(range(min(4, len(dataset))))
        names = [f"sample {i}" for i in starts]
    batch = dataset.get_batch(np.asarray(starts), augment=False, seed=0)

    rows, cols = len(cameras), len(starts)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False, constrained_layout=True)
    for r, cam in enumerate(cameras):
        frames = np.asarray(batch["images"][cam])
        if frames.ndim == 5:       # temporal (B, T, H, W, 3): latest frame
            frames = frames[:, -1]
        for c in range(cols):
            ax = axes[r][c]
            ax.imshow(frames[c])
            ax.set_xticks([]), ax.set_yticks([])
            if r == 0:
                ax.set_title(names[c], fontsize=9)
            if c == 0:
                ax.set_ylabel(cam, fontsize=9)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return {"path": path, "cameras": cameras, "frames": names,
            "decoded_hw": int(frames.shape[1])}
