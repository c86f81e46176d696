"""Grid sweep driver (utils/sweep.py, `cli sweep`): grid parsing, the
resumable run loop, and best-run selection."""

import json
import os

import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.utils.sweep import (
    parse_grid,
    run_sweep,
)


def test_parse_grid_cross_product():
    combos = parse_grid("train.lr=1e-3|3e-4; model.proprio_dropout=0|0.5")
    assert len(combos) == 4
    assert combos[0] == {"train.lr": 1e-3, "model.proprio_dropout": 0}
    # first key varies slowest
    assert [c["train.lr"] for c in combos] == [1e-3, 1e-3, 3e-4, 3e-4]
    # tuple values keep their commas ("|" separates alternatives; the
    # bare comma list is the --set convention for tuple fields)
    combos = parse_grid("data.crop_scale=0.8,1.0|0.5,1.0")
    assert combos[0]["data.crop_scale"] == [0.8, 1.0]
    assert combos[1]["data.crop_scale"] == [0.5, 1.0]
    with pytest.raises(ValueError, match="not KEY"):
        parse_grid("train.lr")
    with pytest.raises(ValueError, match="twice"):
        parse_grid("train.lr=1|2; train.lr=3")
    with pytest.raises(ValueError, match="empty"):
        parse_grid("  ;  ")
    # a stray trailing '=' or '|' must fail HERE, not later inside the
    # optimizer with '' set on a float field
    with pytest.raises(ValueError, match="empty value"):
        parse_grid("train.lr=")
    with pytest.raises(ValueError, match="empty value"):
        parse_grid("train.lr=1e-3|")


def _sweep_cfg(tmp_path):
    return rppe.preset("pr1").override(**{
        "train.steps": 6,
        "train.eval_every": 6,
        "train.eval_steps": 2,
        "train.ckpt_every": 6,
        "train.log_every": 3,
        "data.synthetic_size": 96,
        "data.batch_size": 16,
        "data.val_fraction": 0.25,
        "data.num_workers": 1,
    })


def test_run_sweep_and_resume(tmp_path):
    cfg = _sweep_cfg(tmp_path)
    out = str(tmp_path / "sweep")
    summary = run_sweep(cfg, "train.lr=1e-3|1e-4", out)
    assert summary["grid_size"] == 2
    assert summary["completed"] == 2 and summary["cached"] == 0
    assert summary["best"]["run"] in (0, 1)
    assert "eval_pos_mae_cm" in summary["best"]
    assert summary["best"]["overrides"]["train.lr"] in (1e-3, 1e-4)
    rows = [json.loads(line) for line in open(summary["results"])]
    assert len(rows) == 2
    assert {r["run"] for r in rows} == {0, 1}
    # the winner is genuinely the row with the lower metric
    best_val = min(r["eval_pos_mae_cm"] for r in rows)
    assert summary["best"]["eval_pos_mae_cm"] == best_val
    # each run trained under its own combo-keyed directory (NOT its grid
    # position: a reordered grid must never inherit another combination's
    # checkpoints)
    dirs = {r["ckpt_dir"] for r in rows}
    assert len(dirs) == 2
    for d in dirs:
        assert (tmp_path / "sweep").samefile(os.path.dirname(d))
        assert os.path.isdir(d)

    # re-invocation: everything cached, nothing retrains, same best
    again = run_sweep(cfg, "train.lr=1e-3|1e-4", out)
    assert again["cached"] == 2 and again["completed"] == 2
    assert again["best"] == summary["best"]
    assert len(open(summary["results"]).readlines()) == 2

    # REORDERING the grid stays fully cached (combo identity, not index)
    flipped = run_sweep(cfg, "train.lr=1e-4|1e-3", out)
    assert flipped["cached"] == 2 and flipped["completed"] == 2

    # widening the grid trains only the new combination
    wider = run_sweep(cfg, "train.lr=1e-3|1e-4|3e-3", out)
    assert wider["grid_size"] == 3
    assert wider["cached"] == 2 and wider["completed"] == 3


def test_sweep_recovers_unrecorded_finished_run(tmp_path):
    """A run that trained fully but whose jsonl row was lost (crash between
    train() and the append) must be recovered by scoring its checkpoint,
    not retrained and not wedged."""
    cfg = _sweep_cfg(tmp_path)
    out = str(tmp_path / "sweep")
    first = run_sweep(cfg, "train.lr=1e-3", out)
    os.remove(first["results"])              # simulate the lost record
    again = run_sweep(cfg, "train.lr=1e-3", out)
    # fit() resumes at the final step (zero training iterations -> no fit
    # metrics); the evaluate() fallback recovers the eval row
    assert again["completed"] == 1 and again["cached"] == 0
    assert np.isfinite(again["best"]["eval_pos_mae_cm"])
    assert again["best"]["ckpt_dir"] == first["best"]["ckpt_dir"]


def test_sweep_rejects_bad_metric_and_ckpt_key(tmp_path):
    # no eval cadence AND no val split: the evaluate() fallback cannot
    # score the run either, so the missing metric fails loudly
    cfg = _sweep_cfg(tmp_path).override(**{"train.eval_every": 0,
                                           "data.val_fraction": 0.0})
    with pytest.raises(KeyError, match="eval_pos_mae_cm"):
        run_sweep(cfg, "train.lr=1e-3", str(tmp_path / "s1"))
    with pytest.raises(ValueError, match="ckpt_dir"):
        run_sweep(_sweep_cfg(tmp_path), "train.ckpt_dir=/tmp/x",
                  str(tmp_path / "s2"))


def test_cli_sweep(tmp_path, capsys):
    from rgb_proprioceptive_pose_estimator_tpu.cli import main

    rc = main(["sweep", "--preset", "pr1",
               "--grid", "train.lr=1e-3|1e-4",
               "--out", str(tmp_path / "sw"),
               "--set", "train.steps=6", "--set", "train.eval_every=6",
               "--set", "train.eval_steps=2", "--set", "train.ckpt_every=6",
               "--set", "data.synthetic_size=96",
               "--set", "data.batch_size=16",
               "--set", "data.val_fraction=0.25",
               "--set", "data.num_workers=1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["completed"] == 2
    assert np.isfinite(summary["best"]["eval_pos_mae_cm"])
