#!/usr/bin/env python
"""Regenerate the accuracy artifacts on the NON-LEAKY fixtures (VERDICT r1
weak-3; VERDICT r2 next-4/5/6).

Core table (plain fixture: marker + orientation satellites, proprio an
independent random walk):

  image-only               -- the image path in isolation
  image+proprio            -- pr3 fusion; proprio uninformative here, so
                              parity with image-only is the PASS bar
  image+proprio (dropout)  -- model.proprio_dropout=0.5 on the same data:
                              does regularizing the distractor branch
                              close the small-data fusion gap?
                              (VERDICT r2 weak-5 / next-6)
  proprio-only (control)   -- negative control, must be ~chance
  image+noisy-pose-proprio -- correlated (eef-pose-like) proprio: fusion
                              must BEAT image-only

pr5 feature rows (fixtures DESIGNED to need the feature, VERDICT r2
next-4):

  occlusion fixture (camera_occlusion=0.12: each camera blind on ~half
  the workspace):
    single-cam (occluded)  vs  dual-cam (occluded)
  velocity fixture (velocity_alpha=1.0: pos label = marker +
  velocity, unrecoverable from one frame):
    single-frame (velocity) vs temporal-channel (velocity)
                            vs temporal-lstm (velocity)

pr4 row (VERDICT r2 next-5): resnet50 @ 224 bf16 (+remat) held-out MAE --
the last acceptance-ladder rung with no accuracy evidence.

Each row trains on the first (1 - val_fraction) demos and reports
held-out (demo-granularity) pos/rot MAE from the best checkpoint.

Usage:
  python scripts/accuracy_artifact.py \
      [--demos 40] [--steps 3000] [--out /tmp/rppe_acc] [--rows a,b]
"""

from __future__ import annotations

# runnable as python scripts/accuracy_artifact.py from the repo root without
# PYTHONPATH: the package lives one directory above this file
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import shutil

import numpy as np

# fixture name -> extra write_demo_fixture kwargs
FIXTURES = {
    "plain": {},
    "noisy": {"proprio_pose_noise": 0.05},
    "occl": {"cameras": ("agentview", "robot0_eye_in_hand"),
             "camera_occlusion": 0.12},
    # alpha=3: the velocity term contributes ~7 cm to the single-frame
    # floor -- it must DOMINATE the temporal models' small-data
    # generalization penalty (~2-3 cm at 40 demos), or the comparison
    # measures regularization, not temporal capability (alpha=1 measured
    # exactly that: single-frame 11.98 vs temporal 12.5-14.1)
    "vel": {"velocity_alpha": 3.0},
    # correlated eef-pose-like proprio in ill-conditioned raw units
    # (per-dim scales 1e-2..1e3, informative dims :7 at the SMALL end):
    # the model.proprio_normalize rows
    "scaled": {"proprio_pose_noise": 0.05,
               "proprio_scale": tuple(np.logspace(-2.0, 3.0, 32))},
    # mislabeled-frame corruption (train.pos_loss="huber" justification):
    # 20% of TRAIN position labels replaced with uniform-random points
    # (images stay honest); scored against a CLEAN different-seed val
    # file so the metric measures robustness, not corrupted ground truth
    "outlier": {"label_outlier_frac": 0.2},
    "clean_val": {"seed": 99},
    # handled specially in fixture_path: a MuJoCo-RENDERED dataset via
    # the state-playback converter (data/playback.py) -- realistic
    # shading/perspective instead of drawn markers; certifies the
    # playback ingestion path at training scale
    "mjrender": {},
}

ROWS = {
    "image-only": {"model.use_proprio": False},
    "image+proprio": {},
    "image+proprio (dropout)": {"model.proprio_dropout": 0.5},
    # no images -> nothing to device-cache (build_dataset validates)
    "proprio-only (control)": {"model.backbone": "none",
                               "data.device_cache": False,
                               "data.augment_device": False},
    # realistic correlated proprio (eef-pose-like, sigma=0.05): fusion
    # should BEAT image-only here -- the case the architecture exists for
    # (the "_eval_drop" eval scores the CAMERA dead: without
    # camera_dropout training the zeroed image features are OOD even
    # though the proprio branch still carries the pose)
    "image+noisy-pose-proprio": {"_fixture": "noisy",
                                 "_eval_drop": ("agentview",)},
    # the all-sensors-degraded fallback: with camera_dropout the model
    # TRAINS the camera-dead case (with a proprio branch, all-cameras-
    # dead rows are kept as valid training samples, models/fusion.py),
    # so a dead camera should degrade toward the proprio-informed floor
    # instead of collapsing (name avoids a comma: --rows splits on them)
    "image+noisy-pose-proprio (cam-dropout)": {
        "_fixture": "noisy", "model.camera_dropout": 0.15,
        "_eval_drop": ("agentview",)},
    # informative-proprio case with the branch regularized: small-data
    # guidance row (does dropout preserve the fusion win too?)
    "image+noisy-pose-proprio (dropout)": {
        "_fixture": "noisy", "model.proprio_dropout": 0.5},
    # EMA weight averaging (train.ema_decay): same data/arch as the noisy
    # row; the best checkpoint + final evaluate() serve the EMA weights.
    # Measured both under the battery's cosine schedule (where annealing
    # already averages -- EMA expected ~neutral) and under constant LR
    # (EMA's classic win case: averaging replaces the anneal).
    "image+noisy-pose-proprio (ema)": {
        "_fixture": "noisy", "train.ema_decay": 0.999},
    "image+noisy-pose-proprio (const-lr)": {
        "_fixture": "noisy", "train.lr_schedule": "constant",
        "train.warmup_steps": 0},
    # (name avoids a comma: --rows splits on commas)
    "image+noisy-pose-proprio (const-lr ema)": {
        "_fixture": "noisy", "train.lr_schedule": "constant",
        "train.warmup_steps": 0, "train.ema_decay": 0.999},
    # + BN recalibration (train.ema_bn_recal_batches, the torch update_bn
    # recipe): the const-lr-ema row without it measures the EMA/BN
    # train-serve stats mismatch, not EMA itself
    "image+noisy-pose-proprio (const-lr ema recal)": {
        "_fixture": "noisy", "train.lr_schedule": "constant",
        "train.warmup_steps": 0, "train.ema_decay": 0.999,
        "train.ema_bn_recal_batches": 30},
    # --- model.rot_rep="rot6d": continuous rotation head vs raw quat ---
    # (same data/arch as image-only; the fixture's orientation walk covers
    # SO(3), so the quat head's antipodal double cover is exercised)
    "image-only (rot6d)": {"model.use_proprio": False,
                           "model.rot_rep": "rot6d"},
    # rot6d in the flagship FUSION config (correlated noisy-pose proprio):
    # guards the image-only win against an interaction regression
    "image+noisy-pose-proprio (rot6d)": {
        "_fixture": "noisy", "model.rot_rep": "rot6d"},
    # --- pr5: dual camera must help on per-camera-occluded data --------
    "single-cam (occluded)": {"_fixture": "occl",
                              "model.use_proprio": False},
    "dual-cam (occluded)": {
        "_fixture": "occl", "model.use_proprio": False,
        "model.cameras": ("agentview", "robot0_eye_in_hand"),
        "_eval_drop": ("agentview", "robot0_eye_in_hand")},
    # --- model.camera_dropout: sensor-failure robustness ----------------
    # same data/arch as dual-cam (occluded) plus train-time modality
    # dropout; the "_eval_drop" evals score each camera DEAD
    # (evaluate(drop_cameras=...)) -- without the dropout training the
    # zeroed-features input is out-of-distribution and should collapse,
    # with it the model should degrade toward the single-cam floor
    # (name avoids a comma: --rows splits on commas)
    "dual-cam (occluded cam-dropout)": {
        "_fixture": "occl", "model.use_proprio": False,
        "model.cameras": ("agentview", "robot0_eye_in_hand"),
        "model.camera_dropout": 0.15,
        "_eval_drop": ("agentview", "robot0_eye_in_hand")},
    # --- pr5: temporal stacking must help on velocity-labeled data -----
    # (augment off: inter-frame marker displacement IS the signal; a
    # per-frame random crop would corrupt it)
    "single-frame (velocity)": {
        "_fixture": "vel", "model.use_proprio": False,
        "data.augment": False, "data.augment_device": False,
        "data.crop_margin": 0},
    "temporal-channel (velocity)": {
        "_fixture": "vel", "model.use_proprio": False,
        "model.temporal_frames": 3, "model.temporal_mode": "channel",
        "data.augment": False, "data.augment_device": False,
        "data.crop_margin": 0},
    "temporal-lstm (velocity)": {
        "_fixture": "vel", "model.use_proprio": False,
        "model.temporal_frames": 3, "model.temporal_mode": "lstm",
        "data.augment": False, "data.augment_device": False,
        "data.crop_margin": 0},
    # --- model.proprio_normalize: raw mixed-unit proprio vs z-scored ---
    # (informative eef-pose dims sit at scale 1e-2 next to 1e3-scale
    # distractor dims; normalization must recover the fusion win the
    # "noisy" fixture shows at unit scale)
    "image+scaled-proprio (raw)": {"_fixture": "scaled"},
    "image+scaled-proprio (normalized)": {
        "_fixture": "scaled", "model.proprio_normalize": True},
    # --- train.pos_loss="huber" vs "mse" on 20%-mislabeled train data --
    # (clean held-out val file: the linear tails should cap the pull of
    # the bad labels; MSE fits them)
    "image-only (outlier-labels mse)": {
        "_fixture": "outlier", "_val_fixture": "clean_val",
        "model.use_proprio": False},
    "image-only (outlier-labels huber)": {
        "_fixture": "outlier", "_val_fixture": "clean_val",
        "model.use_proprio": False,
        "train.pos_loss": "huber", "train.huber_delta": 0.05},
    # delta between the inlier residual scale (~0.1 m held-out here) and
    # the outlier distance (~0.4 m): inliers keep their full quadratic
    # gradient, outliers are capped. delta=0.05 (above) puts even inliers
    # in the linear zone -- measured to undertrain at this step budget
    "image-only (outlier-labels huber d15)": {
        "_fixture": "outlier", "_val_fixture": "clean_val",
        "model.use_proprio": False,
        "train.pos_loss": "huber", "train.huber_delta": 0.15},
    # clean-train control: the no-corruption floor for the pair above
    "image-only (clean-labels mse)": {
        "_val_fixture": "clean_val", "model.use_proprio": False},
    # --- state-playback path: ResNet-18 on MuJoCo-rendered frames ------
    "image+qpos (mujoco-rendered)": {
        "_fixture": "mjrender",
        "model.proprio_dim": 4,
        "data.proprio_key": "obs/qpos,obs/qvel",
        "data.target_key": "obs/object"},
    # --- pr4: resnet50 @ 224 bf16 held-out MAE -------------------------
    "resnet50-224-bf16 (pr4)": {
        "model.backbone": "resnet50", "model.image_size": 224,
        "model.dtype": "bfloat16", "model.remat": True,
        "model.image_features": 1024},
    # the fair same-resolution comparator for the pr4 rung (VERDICT r3
    # next-1: does ResNet-50 EVER beat ResNet-18? run both at 224 on the
    # same data/steps; the r3 49.7-deg row had no r18@224 counterpart)
    "resnet18-224-bf16": {
        "model.image_size": 224, "model.dtype": "bfloat16"},
    # --- VERDICT r4 next-3: isolate the 224-resolution regression -------
    # (r18@224 measured ~4 cm / ~14 deg WORSE than the 128 rung at every
    # data scale tried). Same backbone + dtype + proprio at both
    # resolutions, aug on/off, plus the fixture's native 160: is the cost
    # the resolution rung itself, its interaction with the random-crop
    # aug, or the 160->224 upsample? (The stored fixture is 160 px: the
    # 128 rung downsamples, the 224 rung upsamples; crop is relatively
    # GENTLER at 224 -- 224/232 vs 128/136 of the frame.)
    "resnet18-128-bf16": {
        "model.image_size": 128, "model.dtype": "bfloat16"},
    "resnet18-160-bf16": {
        "model.image_size": 160, "model.dtype": "bfloat16"},
    "resnet18-128-bf16 (no-aug)": {
        "model.image_size": 128, "model.dtype": "bfloat16",
        "data.augment": False, "data.augment_device": False,
        "data.crop_margin": 0},
    "resnet18-224-bf16 (no-aug)": {
        "model.image_size": 224, "model.dtype": "bfloat16",
        "data.augment": False, "data.augment_device": False,
        "data.crop_margin": 0},
    # decomposition rows for the weak-2 confound: the r4 comparison
    # ("image-only @128 f32 = 8.71 cm" vs "r18 @224 bf16 + proprio =
    # 12.49 cm") moved THREE factors at once. These two rows isolate the
    # proprio-distractor branch from the resolution rung at equal dtype:
    "image-only-128-bf16": {
        "model.use_proprio": False,
        "model.image_size": 128, "model.dtype": "bfloat16"},
    "image-only-224-bf16": {
        "model.use_proprio": False,
        "model.image_size": 224, "model.dtype": "bfloat16"},
    # seed-variance replicas: same split (data.split_seed untouched),
    # different init/training randomness -- the error bars for the
    # resolution-grid deltas above
    "resnet18-128-bf16 (seed1)": {
        "model.image_size": 128, "model.dtype": "bfloat16",
        "train.seed": 1},
    "resnet18-128-bf16 (seed2)": {
        "model.image_size": 128, "model.dtype": "bfloat16",
        "train.seed": 2},
    "resnet18-224-bf16 (seed1)": {
        "model.image_size": 224, "model.dtype": "bfloat16",
        "train.seed": 1},
    # --- beyond-reference ViT backbone (models/vit.py): held-out MAE on
    # the same fixture as the ResNet-18 "image-only" row, so the two
    # backbones are directly comparable at equal data/steps
    "image-only (vit)": {"model.use_proprio": False,
                         "model.backbone": "vit"},
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

    def fixture_path(fname: str) -> str:
        path = os.path.join(args.out, f"demos_{fname}.hdf5")
        if fname == "mjrender":
            if not os.path.exists(path):
                from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
                    render_playback_dataset,
                    write_states_fixture,
                )

                src = write_states_fixture(
                    os.path.join(args.out, "states_mj.hdf5"),
                    n_demos=args.demos, steps=args.demo_steps, seed=7)
                render_playback_dataset(src, path, cameras=("agentview",),
                                        image_hw=args.image_hw,
                                        target_body="cube")
            return path
        if not os.path.exists(path):
            kw = dict(FIXTURES[fname])
            kw.setdefault("cameras", ("agentview",))
            kw.setdefault("seed", 7)
            write_demo_fixture(path, n_demos=args.demos,
                               steps=args.demo_steps,
                               image_hw=args.image_hw, **kw)
        return path

    want = set(r.strip() for r in args.rows.split(",")) if args.rows else None
    results_path = os.path.join(args.out, "results.json")
    results = {}
    if os.path.exists(results_path):   # accumulate across --rows invocations
        with open(results_path) as f:
            results = json.load(f)
    for name, over in ROWS.items():
        if want and name not in want:
            continue
        over = dict(over)
        row_fixture = fixture_path(over.pop("_fixture", "plain"))
        val_fixture = over.pop("_val_fixture", "")
        eval_drop = over.pop("_eval_drop", ())
        if val_fixture:
            # separate clean held-out file replaces fraction splitting
            over.setdefault("data.val_path", fixture_path(val_fixture))
            over.setdefault("data.val_fraction", 0.0)
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
            # spc=1: the eval/log cadences here aren't multiples of 8 and
            # accuracy rows don't need the throughput (spc=8 is the fast
            # path for production runs -- docs/DESIGN.md device-cache)
            "train.steps_per_call": 1,
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
                         # val_path rows score a whole separate clean file;
                         # fraction rows hold out 20% of the train demos
                         "held_out_demos": (args.demos if val_fixture
                                            else int(args.demos * 0.2))}
        print(json.dumps({name: results[name]}), flush=True)
        for dc in eval_drop:
            # score the best checkpoint with camera(s) DEAD (structurally
            # absent -- the model.camera_dropout serving case); a tuple
            # entry drops the whole set jointly
            dcs = tuple(dc) if isinstance(dc, (tuple, list)) else (dc,)
            r = evaluate(cfg.override(**{
                "train.ckpt_dir": f"{ckpt_dir}/best"}), split="val",
                drop_cameras=dcs)
            key = f"{name} [dead {'+'.join(dcs)}]"
            results[key] = {"pos_mae_cm": round(r["pos_mae_cm"], 2),
                            "rot_mae_deg": round(r["rot_mae_deg"], 2),
                            "steps": args.steps,
                            "held_out_demos": int(args.demos * 0.2)}
            print(json.dumps({key: results[key]}), flush=True)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
