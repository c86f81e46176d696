"""Checkpoint correctness (C9, SURVEY.md section 5.2): save -> restore ->
continue must equal the uninterrupted run bitwise on CPU, including the
data-iterator position; plus the mid-run kill fault-injection test
(SURVEY.md section 6.3)."""

import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe


def _base(tmp_path, name, steps, ckpt_every):
    return rppe.preset("pr1").override(**{
        "train.steps": steps,
        "train.ckpt_every": ckpt_every,
        "train.eval_every": 0,
        "train.log_every": 1000,
        "train.ckpt_dir": str(tmp_path / name),
        "data.synthetic_size": 256,
        "data.num_workers": 2,
    })


def _params_of(out):
    import jax

    return jax.device_get(out["state"].params)


def test_resume_equals_uninterrupted_bitwise(tmp_path):
    # uninterrupted: 40 steps
    full = rppe.train(_base(tmp_path, "full", 40, 40))

    # interrupted: 20 steps, then resume to 40 in the same dir
    rppe.train(_base(tmp_path, "resumed", 20, 20))
    resumed = rppe.train(_base(tmp_path, "resumed", 40, 40))

    pa = _params_of(full)
    pb = _params_of(resumed)
    import jax

    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # optimizer state must also match bitwise
    oa = jax.device_get(full["state"].opt_state)
    ob = jax.device_get(resumed["state"].opt_state)
    for a, b in zip(jax.tree.leaves(oa), jax.tree.leaves(ob)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fault_injection_mid_epoch_resume(tmp_path):
    """Kill the loop mid-epoch (epoch = 8 batches at 256/32); resume must
    restore the exact sample position, not restart the epoch."""
    cfg = _base(tmp_path, "fault", 11, 11)  # 11 steps = 1 epoch + 3 batches
    ref = rppe.train(cfg)

    cfg2 = _base(tmp_path, "fault2", 5, 5)  # "crash" after 5 steps
    rppe.train(cfg2)
    cfg2_cont = _base(tmp_path, "fault2", 11, 11)
    out = rppe.train(cfg2_cont)

    import jax

    for a, b in zip(jax.tree.leaves(_params_of(ref)),
                    jax.tree.leaves(_params_of(out))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_rejects_missing_dir(tmp_path):
    cfg = _base(tmp_path, "nope", 10, 10)
    with pytest.raises(FileNotFoundError):
        rppe.evaluate(cfg, ckpt_dir=str(tmp_path / "empty"))


def test_rerun_completed_config_is_noop(tmp_path):
    """Re-running an already-finished run must not crash on the duplicate
    final checkpoint step (resume lands at step == steps)."""
    cfg = _base(tmp_path, "done", 10, 10)
    first = rppe.train(cfg)
    again = rppe.train(cfg)   # resumes at 10, loop body skipped
    import jax

    for a, b in zip(jax.tree.leaves(jax.device_get(first["state"].params)),
                    jax.tree.leaves(jax.device_get(again["state"].params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_explicit_step(tmp_path):
    """train.resume='<step>' restores that exact step, not the latest."""
    cfg = _base(tmp_path, "explicit", 30, 10)   # ckpts at 10, 20, 30
    rppe.train(cfg)
    cont = cfg.override(**{"train.steps": 20, "train.resume": "20"})
    out = rppe.train(cont)   # start_step == steps -> loop skipped
    assert int(out["state"].step) == 20, (
        "explicit-step resume must not restore the latest checkpoint")


def test_resume_explicit_step_overwrites_later_ckpts(tmp_path):
    """Explicit-step resume that re-walks steps a previous run already
    checkpointed must delete-then-save instead of crashing on orbax's
    duplicate-step refusal (ADVICE r1)."""
    cfg = _base(tmp_path, "rewalk", 30, 10)     # ckpts at 10, 20, 30
    rppe.train(cfg)
    cont = cfg.override(**{"train.resume": "10"})
    out = rppe.train(cont)                      # re-saves 20 and 30
    assert int(out["state"].step) == 30


def test_evaluate_val_requires_split(tmp_path):
    """evaluate(split='val') with no held-out fraction must fail loudly, not
    silently score the training set as held-out (ADVICE r1)."""
    cfg = _base(tmp_path, "valguard", 10, 10)
    rppe.train(cfg)
    with pytest.raises(ValueError, match="val_fraction"):
        rppe.evaluate(cfg, split="val")
