"""Graceful preemption (train.save_on_signal) and the persistent
compilation cache (train.compile_cache_dir) — SURVEY.md §6.3's
failure-detection/recovery subsystem, extended to the signal cloud
schedulers actually send (SIGTERM with a grace window) instead of only
the kill -9 case test_checkpoint.py covers."""

import os
import signal
import threading
import time

import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe


def _cfg(tmp_path, name, steps, **over):
    base = {
        "train.steps": steps,
        "train.ckpt_every": 0,
        "train.eval_every": 0,
        "train.log_every": 5,
        "train.ckpt_dir": str(tmp_path / name),
        "data.synthetic_size": 256,
        "data.num_workers": 2,
    }
    base.update(over)
    return rppe.preset("pr1").override(**base)


def _sigterm_when(path, timeout=60.0):
    """Background thread: SIGTERM ourselves once `path` exists (i.e. the
    training loop has demonstrably started logging)."""

    def run():
        deadline = time.time() + timeout
        while time.time() < deadline:
            if os.path.exists(path) and os.path.getsize(path) > 0:
                os.kill(os.getpid(), signal.SIGTERM)
                return
            time.sleep(0.01)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def test_sigterm_checkpoints_and_resumes(tmp_path):
    cfg = _cfg(tmp_path, "pre", 5000)
    prev_handler = signal.getsignal(signal.SIGTERM)
    trigger = _sigterm_when(str(tmp_path / "pre" / "metrics.jsonl"))
    out = rppe.train(cfg)
    trigger.join(timeout=5)

    # the loop stopped early, reported the step, and saved exactly there
    assert "preempted_at" in out["metrics"]
    stop = int(out["metrics"]["preempted_at"])
    assert 0 < stop < 5000
    assert int(out["state"].step) == stop

    # the previous handler is restored (fit() must not leak a handler
    # whose closure points at a finished run)
    assert signal.getsignal(signal.SIGTERM) is prev_handler

    # resume="auto" continues from the preemption checkpoint to completion
    out2 = rppe.train(cfg)
    assert int(out2["state"].step) == 5000
    assert "preempted_at" not in out2["metrics"]


def test_save_on_signal_off_keeps_default_sigterm(tmp_path):
    cfg = _cfg(tmp_path, "off", 4, **{"train.save_on_signal": False,
                                      "train.log_every": 2})
    prev = signal.getsignal(signal.SIGTERM)
    rppe.train(cfg)
    assert signal.getsignal(signal.SIGTERM) is prev


def test_fit_in_background_thread_skips_handler(tmp_path):
    """Signal handlers are main-thread-only in Python; fit() on another
    thread must train normally instead of crashing in signal.signal."""
    result = {}

    def run():
        result["out"] = rppe.train(_cfg(tmp_path, "bg", 4,
                                        **{"train.log_every": 2}))

    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=300)
    assert not t.is_alive()
    assert int(result["out"]["state"].step) == 4


def test_compile_cache_populates_then_refuses_retarget(tmp_path):
    """One test for both properties because the cache is process-global:
    splitting them makes the outcome depend on test order."""
    from rgb_proprioceptive_pose_estimator_tpu.utils import compile_cache

    already = compile_cache._enabled_dir
    cache = already or str(tmp_path / "jaxcache")
    cfg = _cfg(tmp_path, "cc", 4, **{"train.log_every": 2,
                                     "train.compile_cache_dir": cache})
    rppe.train(cfg)
    import os

    assert os.listdir(cache), \
        "compilation cache directory is empty after training"
    with pytest.raises(ValueError, match="process-global"):
        compile_cache.enable_compile_cache(str(tmp_path / "elsewhere"))
