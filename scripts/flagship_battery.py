#!/usr/bin/env python
"""Full-composition accuracy battery on RENDERED dual-camera data
(VERDICT r3 next-1 + next-4).

Data: the flagship playback scene (data/playback.py
write_flagship_states_fixture) — a 4-dof arm with a wrist camera servoing
toward a constant-velocity free cube, agentview physically occluded by a
wall on ~41% of frames — rendered through the state-playback converter at
training scale, then re-labeled with LOOKAHEAD poses (label[t] =
cube pose at t+K): a robotically-motivated prediction target (where will
the object be when the gripper arrives) that a single frame cannot
resolve, because per-episode velocity is constant but invisible in one
image. One dataset therefore needs EVERYTHING the pr5 flagship ships:

  dual-camera fusion   — the wall blinds agentview on ~41% of frames
  temporal LSTM        — lookahead labels need velocity across frames
  camera_dropout       — dead-sensor serving (eval_drop rows)
  proprio (normalized) — the servoing arm's mixed-unit joint state
                         correlates with the target without copying it
  EMA + BN recal       — the preset's weight-averaging serving path
  sharded device cache — the pr5 HBM-capacity data path

Rows: the FULL composition (the pr5 preset's own knobs) against
single-feature ablations — each row is the composition minus exactly one
feature — plus dead-camera evals of the composition and the no-dropout
ablation. Methodology matches scripts/accuracy_artifact.py: 20%
demo-granularity holdout, best checkpoint on held-out pos MAE,
device-cache + temporally-consistent device-aug.

Usage:
  python scripts/flagship_battery.py [--demos 160] [--steps 4000]
      [--out /tmp/rppe_flag] [--rows a,b]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import shutil

import numpy as np

# the full composition: exactly what the pr5 preset ships (after the r4
# preset flips: lstm + camera_dropout=0.15 + proprio_normalize=True) plus
# the serving-path EMA/recal and the sharded cache layout
FULL = {
    "train.ema_decay": 0.999,
    "train.ema_bn_recal_batches": 30,
    "data.cache_layout": "sharded",
}

ROWS = {
    "pr5-full (composition)": {
        **FULL, "_eval_drop": ("agentview", "robot0_eye_in_hand")},
    # each ablation = composition minus ONE feature
    "abl single-cam (agentview)": {
        **FULL, "model.cameras": ("agentview",)},
    "abl single-cam (wrist)": {
        **FULL, "model.cameras": ("robot0_eye_in_hand",)},
    "abl single-frame": {**FULL, "model.temporal_frames": 1},
    "abl channel-stack": {**FULL, "model.temporal_mode": "channel"},
    "abl no-camera-dropout": {
        **FULL, "model.camera_dropout": 0.0,
        "_eval_drop": ("agentview", "robot0_eye_in_hand")},
    "abl raw-proprio": {**FULL, "model.proprio_normalize": False},
    "abl no-proprio": {**FULL, "model.use_proprio": False},
    # the clean temporal-value pair for lookahead labels (K=6 supplement):
    # the servoing arm's qvel leaks target velocity to EVERY proprio row,
    # so single-frame-with-proprio never pays the full lookahead penalty;
    # without proprio, velocity is only recoverable across frames -- this
    # row against "abl no-proprio" (LSTM) isolates what temporal context
    # is worth when nothing else carries the velocity
    "abl no-proprio single-frame": {
        **FULL, "model.use_proprio": False, "model.temporal_frames": 1},
    "abl no-ema": {"data.cache_layout": "sharded"},
    # context row: same data WITHOUT lookahead labels (current pose) --
    # the task-difficulty floor the lookahead task sits above
    "ref current-pose (composition)": {**FULL, "_data": "rendered"},
    # VERDICT r4 next-1: the measured continuous-rotation knob
    # (model.rot_rep="rot6d", -30% rot MAE image-only on the drawn
    # fixture) inside the full composition, in exactly its documented
    # regime (orientation regressed from pixels: the servoing arm's
    # proprio does not contain the cube quat)
    "pr5-full (rot6d)": {**FULL, "model.rot_rep": "rot6d"},
}


def derive_lookahead(src: str, dst: str, k: int) -> None:
    """Write a copy of a rendered demo file where obs/object[t] is the
    pose at t+k (each demo truncated by k steps so every label exists).
    Images/proprio stay at time t — the estimator must extrapolate.

    NOTE: the framework now ships this as a config knob
    (data.target_lookahead, r4) producing identical (obs, label) pairs
    without materializing a derived file; the battery keeps the file
    form so its runs are exactly reproducible against the artifact."""
    import h5py

    with h5py.File(src, "r") as s, h5py.File(dst, "w") as d:
        sd = s["data"]
        dd = d.create_group("data")
        for a, v in sd.attrs.items():
            dd.attrs[a] = v
        dd.attrs["lookahead_k"] = k
        for dk in sd:
            g = sd[dk]
            og = dd.create_group(dk)
            T = int(g.attrs["num_samples"]) - k
            og.attrs["num_samples"] = T
            obs = og.create_group("obs")
            for key in g["obs"]:
                arr = g["obs"][key]
                if key == "object":
                    obs[key] = np.asarray(arr)[k:]
                else:
                    obs[key] = np.asarray(arr)[:T]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", type=int, default=160)
    ap.add_argument("--demo-steps", type=int, default=50)
    ap.add_argument("--image-hw", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lookahead", type=int, default=2)
    ap.add_argument("--out", default="/tmp/rppe_flag")
    ap.add_argument("--rows", default="",
                    help="comma-separated subset of rows to run")
    args = ap.parse_args()

    from rgb_proprioceptive_pose_estimator_tpu import evaluate, preset, train
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_flagship_states_fixture,
    )

    os.makedirs(args.out, exist_ok=True)
    states = os.path.join(args.out, "states.hdf5")
    rendered = os.path.join(args.out, "rendered.hdf5")
    la = os.path.join(args.out, f"rendered_la{args.lookahead}.hdf5")
    if not os.path.exists(states):
        # cube_spin 0.10 rad/step (~6 deg/frame): fast enough that the
        # K-step lookahead rotation is material, slow enough that a
        # 3-frame window can actually estimate the rate
        write_flagship_states_fixture(states, n_demos=args.demos,
                                      steps=args.demo_steps, seed=42,
                                      cube_spin=0.10)
        print(json.dumps({"states": states}), flush=True)
    if not os.path.exists(rendered):
        s = render_playback_dataset(
            states, rendered,
            cameras=("agentview", "robot0_eye_in_hand"),
            image_hw=args.image_hw, target_body="cube")
        print(json.dumps({"rendered": s}), flush=True)
    if not os.path.exists(la):
        derive_lookahead(rendered, la, args.lookahead)
        print(json.dumps({"lookahead": la}), flush=True)

    want = set(r.strip() for r in args.rows.split(",")) if args.rows else None
    results_path = os.path.join(args.out, "results.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)
    for name, over in ROWS.items():
        if want and name not in want:
            continue
        over = dict(over)
        data_path = la if over.pop("_data", "la") == "la" else rendered
        eval_drop = over.pop("_eval_drop", ())
        ckpt_dir = os.path.join(
            args.out, name.replace(" ", "_").replace("(", "").replace(")", ""))
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        cfg = preset("pr5").override(**{
            "dist.num_devices": 1,
            "data.path": data_path,
            "data.proprio_key": "obs/qpos,obs/qvel",
            "data.target_key": "obs/object",
            "model.proprio_dim": 8,
            "model.image_size": args.image_hw,
            "data.batch_size": args.batch,
            "data.val_fraction": 0.2,
            "data.augment_device": True,
            "data.crop_margin": 4,
            "data.device_cache": True,
            "train.steps": args.steps,
            "train.steps_per_call": 1,
            "train.lr": 3e-4,
            "train.lr_schedule": "cosine",
            "train.warmup_steps": 100,
            "train.eval_every": 500,
            "train.eval_steps": 0,
            "train.ckpt_every": 0,
            "train.ckpt_best_metric": "pos_mae_cm",
            "train.ckpt_dir": ckpt_dir,
            "train.log_every": 250,
            **over,
        })
        train(cfg)
        best = evaluate(cfg.override(**{
            "train.ckpt_dir": f"{ckpt_dir}/best"}), split="val")
        results[name] = {"pos_mae_cm": round(best["pos_mae_cm"], 2),
                         "rot_mae_deg": round(best["rot_mae_deg"], 2),
                         "steps": args.steps,
                         "held_out_demos": int(args.demos * 0.2)}
        print(json.dumps({name: results[name]}), flush=True)
        for dc in eval_drop:
            dcs = tuple(dc) if isinstance(dc, (tuple, list)) else (dc,)
            r = evaluate(cfg.override(**{
                "train.ckpt_dir": f"{ckpt_dir}/best"}), split="val",
                drop_cameras=dcs)
            key = f"{name} [dead {'+'.join(dcs)}]"
            results[key] = {"pos_mae_cm": round(r["pos_mae_cm"], 2),
                            "rot_mae_deg": round(r["rot_mae_deg"], 2)}
            print(json.dumps({key: results[key]}), flush=True)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
