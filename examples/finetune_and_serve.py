#!/usr/bin/env python
"""Finetune a frozen pretrained backbone, export, and serve.

The production workflow a robot stack would actually run:

  1. import torchvision ResNet-18 weights into the image encoder
     (utils.torch_import -- torch is only needed to produce the
     state_dict; here a fresh torch-free state_dict stand-in is built),
  2. freeze the backbone (model.freeze_backbone) and train only the
     fusion head + proprio branch on the demo set,
  3. export the result as a self-contained StableHLO artifact
     (int8 weight-only quantized),
  4. serve it frame-by-frame behind an ObsBuffer (temporal stacking at
     the robot control loop).

Self-contained (generates a tiny demo file); runs on CPU or TPU.

    python examples/finetune_and_serve.py [--steps 150]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
    write_demo_fixture,
)
from rgb_proprioceptive_pose_estimator_tpu.utils.export import (
    export_predictor,
    load_predictor,
)
from rgb_proprioceptive_pose_estimator_tpu.utils.obs_buffer import ObsBuffer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (some TPU plugins ignore "
                         "the JAX_PLATFORMS env var)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    workdir = tempfile.mkdtemp(prefix="rppe_finetune_")
    demo_path = os.path.join(workdir, "demo.hdf5")
    write_demo_fixture(demo_path, n_demos=4, steps=25,
                       cameras=("agentview",), image_hw=84, proprio_dim=16)

    # finetune config: frozen encoder, small head, temporal buffer depth 1
    cfg = rppe.preset("pr2").override(**{
        "model.use_proprio": True,
        "model.proprio_dim": 16,
        "model.image_size": 64,
        "model.image_features": 64,
        "model.head_hidden": [64],
        "model.freeze_backbone": True,
        "data.path": demo_path,
        "data.batch_size": 16,
        "data.val_fraction": 0.25,
        "train.steps": args.steps,
        "train.optimizer": "adamw",
        "train.weight_decay": 1e-4,
        "train.log_every": max(args.steps // 3, 1),
        "train.eval_every": args.steps,
        "train.eval_steps": 2,
        "train.ckpt_every": args.steps,
        "train.ckpt_dir": os.path.join(workdir, "ckpt"),
    })
    # (With a real torchvision checkpoint: torch.load the state_dict and
    # merge it via utils.torch_import.load_pretrained_backbone before
    # training -- see tests/test_features.py for the exact call. To warm
    # start from a checkpoint trained by THIS framework instead, set
    # train.init_from="<that run's ckpt_dir>" -- serving weights + BN
    # stats load, optimizer/step start fresh.)
    out = rppe.train(cfg)
    print("finetune metrics:", {k: round(float(v), 4)
                                for k, v in out["metrics"].items()
                                if k.startswith(("loss", "eval_pos"))})

    # frozen means frozen: the encoder is bitwise-identical to init
    # (asserted in tests/test_trainer_features.py); only head/proprio moved

    art = os.path.join(workdir, "pose.rppe")
    export_predictor(art, cfg, ckpt_dir=cfg.train.ckpt_dir, max_batch=4,
                     quantize="int8")
    serve = load_predictor(art)
    print(f"exported int8 artifact -> {art} "
          f"({os.path.getsize(art) / 1e6:.1f} MB)")

    # robot control loop: one frame at a time through the ObsBuffer
    buf = ObsBuffer(cfg.model)
    rs = np.random.RandomState(0)
    for step in range(3):
        frame = {
            "images": {"agentview": rs.randint(
                0, 256, (cfg.model.image_size, cfg.model.image_size, 3),
                np.uint8)},
            "proprio": rs.randn(cfg.model.proprio_dim).astype(np.float32),
        }
        obs = buf.push(frame)
        batched = {
            "images": {c: v[None] for c, v in obs["images"].items()},
            "proprio": obs["proprio"][None],
        }
        pos, quat = serve(batched)
        print(f"step {step}: pos={np.round(pos[0], 3)} "
              f"quat={np.round(quat[0], 3)}")


if __name__ == "__main__":
    main()
