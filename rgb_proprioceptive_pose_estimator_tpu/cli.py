"""CLI on top of the public API (SURVEY.md section 2 L5).

Usage:
    python -m rgb_proprioceptive_pose_estimator_tpu.cli train \
        --preset pr3 --set data.path=/data/demo.hdf5 --set train.steps=20000
    python -m rgb_proprioceptive_pose_estimator_tpu.cli eval \
        --preset pr3 --set train.ckpt_dir=/tmp/ckpt
    python -m rgb_proprioceptive_pose_estimator_tpu.cli config --preset pr4
"""

from __future__ import annotations

import argparse
import json
import sys

from rgb_proprioceptive_pose_estimator_tpu.config import Config, preset, PRESETS


def _parse_value(s: str):
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return s


def load_config(args) -> Config:
    if args.config:
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = preset(args.preset)
    overrides = {}
    for item in args.set or []:
        if "=" not in item:
            raise SystemExit(f"--set expects key=value, got {item!r}")
        k, v = item.split("=", 1)
        overrides[k] = _parse_value(v)
    if overrides:
        cfg = cfg.override(**overrides)
    return cfg


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rppe")
    ap.add_argument("command", choices=["train", "eval", "config", "presets"])
    ap.add_argument("--preset", default="pr1", choices=sorted(PRESETS))
    ap.add_argument("--config", default="", help="JSON config file")
    ap.add_argument("--set", action="append", metavar="KEY=VALUE",
                    help="dotted config override, repeatable")
    ap.add_argument("--ckpt-dir", default="", help="eval: checkpoint dir")
    args = ap.parse_args(argv)

    if args.command == "presets":
        for name in sorted(PRESETS):
            print(f"{name}: {PRESETS[name]().name}")
        return 0

    cfg = load_config(args)
    if args.command == "config":
        print(cfg.to_json())
        return 0

    import rgb_proprioceptive_pose_estimator_tpu as rppe

    if args.command == "train":
        out = rppe.train(cfg)
        print(json.dumps({k: v for k, v in out["metrics"].items()}, indent=2))
        return 0

    if args.command == "eval":
        m = rppe.evaluate(cfg, ckpt_dir=args.ckpt_dir or None)
        print(json.dumps(m, indent=2))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
