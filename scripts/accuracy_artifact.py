#!/usr/bin/env python
"""Regenerate the accuracy artifact on the NON-LEAKY fixture (VERDICT r1
weak-3 / next-3).

The r1 artifact was contaminated: the fixture copied pos/quat into the
proprio vector, so "image-path accuracy" was unfalsifiable. The fixture
now draws proprio as a smooth random walk independent of the target
(data/hdf5_store.write_demo_fixture), and this script produces the table
that isolates the image path:

  row 1: image-only        (model.use_proprio=False)
  row 2: image + proprio   (the full pr3 fusion; proprio is uninformative
                            here, so parity with row 1 is the expectation)
  row 3: proprio-only      (negative control -- must be ~chance, proving
                            the fixture no longer leaks)

Each row trains on the first (1 - val_fraction) demos and reports
held-out (demo-granularity) pos/rot MAE from the best checkpoint.

Usage:
  PYTHONPATH=/root/.axon_site:. python scripts/accuracy_artifact.py \
      [--demos 40] [--steps 3000] [--out /tmp/rppe_acc]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

ROWS = {
    "image-only": {"model.use_proprio": False},
    "image+proprio": {},
    "proprio-only (control)": {"model.backbone": "none"},
    # realistic correlated proprio (eef-pose-like, sigma=0.05): fusion
    # should BEAT image-only here -- the case the architecture exists for
    "image+noisy-pose-proprio": {"_fixture": "noisy"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", type=int, default=40)
    ap.add_argument("--demo-steps", type=int, default=60)
    ap.add_argument("--image-hw", type=int, default=160)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="/tmp/rppe_acc")
    ap.add_argument("--rows", default="",
                    help="comma-separated subset of rows to run")
    args = ap.parse_args()

    from rgb_proprioceptive_pose_estimator_tpu import evaluate, preset, train
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    os.makedirs(args.out, exist_ok=True)
    fixture = os.path.join(args.out, "demos.hdf5")
    if not os.path.exists(fixture):
        write_demo_fixture(fixture, n_demos=args.demos,
                           steps=args.demo_steps, image_hw=args.image_hw,
                           cameras=("agentview",), seed=7)
    fixture_noisy = os.path.join(args.out, "demos_noisy.hdf5")

    want = set(args.rows.split(",")) if args.rows else None
    results = {}
    for name, over in ROWS.items():
        if want and name not in want:
            continue
        over = dict(over)
        row_fixture = fixture
        if over.pop("_fixture", None) == "noisy":
            if not os.path.exists(fixture_noisy):
                write_demo_fixture(
                    fixture_noisy, n_demos=args.demos,
                    steps=args.demo_steps, image_hw=args.image_hw,
                    cameras=("agentview",), seed=7,
                    proprio_pose_noise=0.05)
            row_fixture = fixture_noisy
        ckpt_dir = os.path.join(args.out, name.split()[0].replace("+", "_"))
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        cfg = preset("pr3").override(**{
            "data.path": row_fixture,
            "data.batch_size": args.batch,
            "data.val_fraction": 0.2,       # demo-granularity held-out split
            "data.augment_device": True,
            "data.crop_margin": 4,
            "data.device_cache": True,   # train from HBM (6.9x end-to-end)
            "train.steps": args.steps,
            "train.steps_per_call": 1,      # host-bound anyway on this box
            "train.lr": 3e-4,
            "train.lr_schedule": "cosine",
            "train.warmup_steps": 100,
            "train.eval_every": 500,
            "train.eval_steps": 0,          # full held-out split each eval
            "train.ckpt_every": 0,
            "train.ckpt_best_metric": "pos_mae_cm",
            "train.ckpt_dir": ckpt_dir,
            "train.log_every": 250,
            **over,
        })
        train(cfg)
        # score the best checkpoint on the full held-out split
        best = evaluate(cfg.override(**{
            "train.ckpt_dir": f"{ckpt_dir}/best"}), split="val")
        results[name] = {"pos_mae_cm": round(best["pos_mae_cm"], 2),
                         "rot_mae_deg": round(best["rot_mae_deg"], 2),
                         "steps": args.steps,
                         "held_out_demos": int(args.demos * 0.2)}
        print(json.dumps({name: results[name]}), flush=True)

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
