"""Grid hyperparameter sweeps over fit() (`cli sweep`).

The reference's users run LR/regularization sweeps by hand — N shell
invocations, results collated by eye (SURVEY.md §1.3: research repo,
script-driven). This makes the workflow a first-class, resumable
primitive: a grid spec expands to the cross product of dotted config
overrides, every combination trains in-process (one compile cache, one
device handshake — on this environment's tunneled TPU the per-process
startup alone is ~30 s, so in-process beats N processes by minutes),
and each run appends one JSON line to <out>/sweep.jsonl as it finishes.

Grid spec syntax (`--grid`):

    "train.lr=1e-3|3e-4; model.proprio_dropout=0|0.5"

`;` separates keys, `|` separates the alternatives of one key (comma
stays available for tuple-valued settings like data.crop_scale=0.8,1.0).
Values parse exactly like `--set` (cli._parse_value).

Resume semantics: finished combinations are keyed by their override
dict in sweep.jsonl and skipped on re-invocation; a run that was
preempted mid-train (train.save_on_signal) is NOT recorded, so the next
invocation re-enters it and fit()'s resume="auto" continues from the
preemption checkpoint. A sweep is therefore safe to run on preemptible
capacity: re-run the same command until it reports done.
"""

from __future__ import annotations

import itertools
import json
import os
from typing import Any, Dict, List, Optional, Tuple

from rgb_proprioceptive_pose_estimator_tpu.config import Config


def parse_grid(spec: str) -> List[Dict[str, Any]]:
    """Expand "k1=a|b; k2=c" into the cross product of override dicts
    (order: first key varies slowest, like nested for-loops)."""
    from rgb_proprioceptive_pose_estimator_tpu.cli import _parse_value

    keys: List[str] = []
    alts: List[List[Any]] = []
    for part in filter(None, (p.strip() for p in spec.split(";"))):
        if "=" not in part:
            raise ValueError(
                f"grid entry {part!r} is not KEY=V1|V2|... "
                '(separate keys with ";", alternatives with "|")')
        key, vals = part.split("=", 1)
        key = key.strip()
        if key in keys:
            raise ValueError(f"grid key {key!r} appears twice")
        raw = [v.strip() for v in vals.split("|")]
        if any(not v for v in raw):
            # "KEY=".split("|") -> [""] -- catch the stray '=' here
            # instead of setting '' on a config field and failing later
            raise ValueError(f"grid key {key!r} has an empty value")
        keys.append(key)
        alts.append([_parse_value(v) for v in raw])
    if not keys:
        raise ValueError("empty grid spec")
    return [dict(zip(keys, combo)) for combo in itertools.product(*alts)]


def run_sweep(cfg: Config, grid: str, out_dir: str,
              metric: str = "eval_pos_mae_cm",
              resume: bool = True) -> Dict[str, Any]:
    """Train every grid combination; returns a summary with the best run.

    Each combination trains under <out_dir>/run_<hash-of-overrides> (the
    directory is keyed by the COMBINATION, not its grid position, so
    editing/reordering the grid can never resume one combination from
    another's checkpoints) with the overrides applied on top of cfg; its
    final fit() metrics row appends to <out_dir>/sweep.jsonl. `metric`
    selects the winner (lower = better; any key of the metrics row, e.g.
    eval_pos_mae_cm / eval_rot_mae_deg / loss)."""
    import hashlib

    from rgb_proprioceptive_pose_estimator_tpu.api import evaluate, train

    combos = parse_grid(grid)
    if any("train.ckpt_dir" in c for c in combos):
        raise ValueError("train.ckpt_dir cannot be swept -- the sweep "
                         "assigns each run its own directory under out_dir")
    os.makedirs(out_dir, exist_ok=True)
    results_path = os.path.join(out_dir, "sweep.jsonl")

    done: Dict[str, Dict[str, Any]] = {}
    if resume and os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                row = json.loads(line)
                done[json.dumps(row["overrides"], sort_keys=True)] = row

    rows: List[Dict[str, Any]] = []
    cached = 0
    preempted: Optional[int] = None
    for i, combo in enumerate(combos):
        key = json.dumps(combo, sort_keys=True)
        if key in done:
            rows.append(done[key])
            cached += 1
            continue
        # the run directory is keyed by the combination's identity: a
        # reordered/widened grid must never resume one combination from
        # another combination's checkpoints
        run_dir = os.path.join(
            out_dir, f"run_{hashlib.sha1(key.encode()).hexdigest()[:10]}")
        run_cfg = cfg.override(**combo, **{"train.ckpt_dir": run_dir})
        out = train(run_cfg)
        m = out["metrics"]
        if "preempted_at" in m:
            # not recorded: the next invocation re-enters this run and
            # fit()'s resume="auto" continues from the saved step
            preempted = i
            break
        row = {"run": i, "overrides": combo, "ckpt_dir": run_dir,
               **{k: float(v) for k, v in m.items()
                  if isinstance(v, (int, float))}}
        if metric not in row:
            # fit() reports no metrics when resume found the run already
            # at its final step (e.g. a previous invocation crashed
            # between training and recording), and eval metrics are
            # absent when the eval cadence never fired: score the saved
            # checkpoint directly instead of discarding the finished run
            try:
                em = evaluate(run_cfg, split="val")
                row.update({f"eval_{k}": float(v) for k, v in em.items()
                            if isinstance(v, (int, float))})
            except Exception:
                pass   # no val split / no checkpoint: the raise below says so
        if metric not in row:
            raise KeyError(
                f"sweep metric {metric!r} not in run metrics "
                f"{sorted(k for k in row if k not in ('run', 'overrides', 'ckpt_dir'))} "
                "-- set train.eval_every (and a val split) so fit() "
                "reports eval metrics, or pick a train metric like 'loss'")
        with open(results_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        rows.append(row)

    summary: Dict[str, Any] = {
        "grid_size": len(combos),
        "completed": len(rows),
        "cached": cached,
        "metric": metric,
        "out_dir": out_dir,
        "results": results_path,
    }
    if preempted is not None:
        summary["preempted_in_run"] = preempted
        summary["next"] = ("preempted mid-sweep; re-run the same command "
                           "to continue from the saved step")
    scored = [r for r in rows if metric in r]
    if len(scored) < len(rows):
        # older cached rows may predate this --metric; report, don't crash
        summary["rows_missing_metric"] = len(rows) - len(scored)
    if scored:
        best = min(scored, key=lambda r: r[metric])
        summary["best"] = {"run": best["run"],
                           "overrides": best["overrides"],
                           metric: best[metric],
                           "ckpt_dir": best.get("ckpt_dir", "")}
    return summary
