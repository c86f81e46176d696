#!/usr/bin/env python
"""Rotation root-cause grid on the rendered flagship scene (VERDICT r4
next-2 / weak-1).

The question: why does the flagship scene's rotation MAE sit at 45.3 deg
(K=0 current-pose floor, composition) to 61 deg (K=2 composition) when
the r3 drawn-fixture dual-cam measured 12.75 deg and the r3 single-cam
MuJoCo render 25.3 deg? Candidate factors, each isolated on the SAME
rendered data (no re-render needed) at K=0 with a single-frame model (no
temporal confound):

  aug        — the random crop (+ color jitter) may destroy the small
               face plates that carry orientation
  rot_rep    — the quat head's double-cover discontinuity; rot6d measured
               −30% rot MAE image-only on the drawn fixture
  resolution — DOWN-probe: if rotation is pixel-limited at 128 (the
               agentview cube is ~24 px), evaluating the same data at 64
               should collapse rotation much faster than position;
               an UP-probe (render at 224) is a separate --render224 run
               because it needs a fresh (expensive) render
  cameras    — per-camera rows: is world-orientation unlearnable from the
               moving wrist frame, the ~24 px agentview, or both?

Rows share the flagship battery's methodology (20% demo-granularity
holdout, best checkpoint on held-out pos MAE, device cache + device aug
where aug is on). Artifact: docs/artifacts/flagship_rot_diag_r5.json.

Usage:
  python scripts/flagship_rot_diag.py [--demos 240] [--steps 5000]
      [--out /tmp/rppe_flag6] [--rows a,b] [--render224]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import shutil

# single-frame, K=0 (labels at t): the floor regime where rotation is
# directly observable in the frame -- every factor isolated from temporal
# effects. EMA/recal kept (serving path, orthogonal to rotation).
BASE = {
    "model.temporal_frames": 1,
    "train.ema_decay": 0.999,
    "train.ema_bn_recal_batches": 30,
    "data.cache_layout": "sharded",
}
AUG_OFF = {
    "data.augment": False,
    "data.augment_device": False,
    "data.crop_margin": 0,
}

# row names avoid commas: --rows splits on them
ROWS = {
    "diag base (aug-on quat)": {**BASE},
    "diag aug-off (quat)": {**BASE, **AUG_OFF},
    "diag rot6d (aug on)": {**BASE, "model.rot_rep": "rot6d"},
    "diag aug-off rot6d": {**BASE, **AUG_OFF, "model.rot_rep": "rot6d"},
    # resolution DOWN-probe: same stored 128px frames, model at 64
    "diag lowres-64 (aug-on quat)": {**BASE, "model.image_size": 64},
    # per-camera orientation observability (aug off so the answer is not
    # confounded by the crop factor)
    "diag agentview-only (aug off)": {
        **BASE, **AUG_OFF, "model.cameras": ("agentview",)},
    "diag wrist-only (aug off)": {
        **BASE, **AUG_OFF, "model.cameras": ("robot0_eye_in_hand",)},
    # UP-probe rows (need --render224; trains on a fresh 224px render)
    "diag 224 (aug-on quat)": {**BASE, "_data": "rendered224",
                                "model.image_size": 224},
    "diag 224 aug-off (quat)": {**BASE, **AUG_OFF, "_data": "rendered224",
                                "model.image_size": 224},
    # seed replicas: error bars for the base-vs-rot6d delta (same split,
    # different init/training randomness)
    "diag base seed1": {**BASE, "train.seed": 1},
    "diag rot6d seed1": {**BASE, "model.rot_rep": "rot6d",
                         "train.seed": 1},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", type=int, default=240)
    ap.add_argument("--demo-steps", type=int, default=50)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default="/tmp/rppe_flag6",
                    help="pass the flagship_battery.py --out dir (default "
                         "matches the r5 K=6 run's /tmp/rppe_flag6; the "
                         "battery's own default is /tmp/rppe_flag) so the "
                         "states + 128px render are reused, not "
                         "re-rendered; a reused states file OVERRIDES "
                         "--demos/--demo-steps (actual count is read back "
                         "from the file and recorded in the artifact)")
    ap.add_argument("--rows", default="",
                    help="comma-separated subset of rows to run")
    ap.add_argument("--render224", action="store_true",
                    help="also render the scene at 224px (expensive) and "
                         "enable the 224 rows")
    args = ap.parse_args()

    from rgb_proprioceptive_pose_estimator_tpu import evaluate, preset, train
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_flagship_states_fixture,
    )

    os.makedirs(args.out, exist_ok=True)
    states = os.path.join(args.out, "states.hdf5")
    rendered = os.path.join(args.out, "rendered.hdf5")
    rendered224 = os.path.join(args.out, "rendered224.hdf5")
    if not os.path.exists(states):
        write_flagship_states_fixture(states, n_demos=args.demos,
                                      steps=args.demo_steps, seed=42,
                                      cube_spin=0.10)
    if not os.path.exists(rendered):
        render_playback_dataset(
            states, rendered,
            cameras=("agentview", "robot0_eye_in_hand"),
            image_hw=128, target_body="cube")
    if args.render224 and not os.path.exists(rendered224):
        s = render_playback_dataset(
            states, rendered224,
            cameras=("agentview", "robot0_eye_in_hand"),
            image_hw=224, target_body="cube")
        print(json.dumps({"rendered224": s}), flush=True)

    # the exists-guards may have reused a states file written by an earlier
    # battery run with different --demos; read the REAL count back so the
    # artifact's held_out_demos states the data scale actually trained on
    import h5py
    with h5py.File(states, "r") as f:
        n_demos = len(f["data"])
    if n_demos != args.demos:
        print(json.dumps({"note": f"reusing {states}: {n_demos} demos "
                                  f"(--demos {args.demos} ignored)"}),
              flush=True)

    want = set(r.strip() for r in args.rows.split(",")) if args.rows else None
    results_path = os.path.join(args.out, "rot_diag.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)
    for name, over in ROWS.items():
        if want and name not in want:
            continue
        over = dict(over)
        which = over.pop("_data", "rendered")
        if which == "rendered224" and not args.render224:
            continue
        data_path = rendered224 if which == "rendered224" else rendered
        ckpt_dir = os.path.join(
            args.out,
            "diag_" + name.replace(" ", "_").replace("(", "").replace(")", ""))
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        cfg = preset("pr5").override(**{
            "dist.num_devices": 1,
            "data.path": data_path,
            "data.proprio_key": "obs/qpos,obs/qvel",
            "data.target_key": "obs/object",
            "model.proprio_dim": 8,
            "model.image_size": 128,
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
                         "held_out_demos": int(n_demos * 0.2)}
        print(json.dumps({name: results[name]}), flush=True)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
