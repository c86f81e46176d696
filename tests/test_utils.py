"""Coverage for the observability utilities (metrics logger, trace window,
CLI config-file loading)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.cli import main
from rgb_proprioceptive_pose_estimator_tpu.config import preset
from rgb_proprioceptive_pose_estimator_tpu.utils.metrics import MetricsLogger
from rgb_proprioceptive_pose_estimator_tpu.utils.prof import TraceWindow


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log(1, {"loss": jnp.asarray(0.5), "note": "warmup"}, prefix="train/")
    log.log(2, {"loss": 0.25})
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1
    assert lines[0]["train/loss"] == 0.5
    assert lines[0]["train/note"] == "warmup"
    assert lines[1]["loss"] == 0.25
    assert "ts" in lines[1]


def test_metrics_logger_disabled_is_noop():
    log = MetricsLogger("")        # no path, no tensorboard
    log.log(1, {"loss": 1.0})      # must not raise
    log.close()


def test_trace_window_lifecycle(tmp_path):
    trace_dir = str(tmp_path / "trace")
    w = TraceWindow(trace_dir, start_step=2, num_steps=2)
    x = jnp.ones((4,))
    for step in range(1, 6):
        x = x * 2
        w.on_step(step, sync=x)
    w.close(sync=x)
    assert w._done and not w._active
    # a capture directory was produced
    found = []
    for root, _, files in os.walk(trace_dir):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_trace_window_disabled():
    w = TraceWindow("", 1, 1)
    w.on_step(1)
    w.close()
    assert not w._active


def test_cli_config_file_roundtrip(tmp_path, capsys):
    cfg = preset("pr3").override(**{"train.lr": 0.0123})
    path = tmp_path / "cfg.json"
    path.write_text(cfg.to_json())
    assert main(["config", "--config", str(path)]) == 0
    loaded = json.loads(capsys.readouterr().out)
    assert loaded["train"]["lr"] == 0.0123
    assert loaded["model"]["backbone"] == "resnet18"


def test_metrics_logger_survives_nonscalar(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log(1, {"arr": np.ones(3), "ok": 1.0})   # must not raise
    log.close()
    rec = json.loads(open(path).read())
    assert rec["ok"] == 1.0 and isinstance(rec["arr"], str)


def test_config_rejects_unknown_section_and_bad_enums():
    from rgb_proprioceptive_pose_estimator_tpu.config import (
        Config, ModelConfig,
    )

    with pytest.raises(KeyError, match="unknown config sections"):
        Config.from_dict({"trainer": {"lr": 1e-5}})
    with pytest.raises(ValueError, match="model.dtype"):
        ModelConfig(dtype="bf16")
    with pytest.raises(ValueError, match="temporal_mode"):
        ModelConfig(temporal_mode="LSTM")
    with pytest.raises(ValueError, match="backbone"):
        ModelConfig(backbone="resnet101")


def test_config_r2_field_validation():
    """r2 knobs: jitter_hue bounds, crop_ratio ordering, device-aug
    incompatibility, steps_per_call cadence handled in fit (see
    tests/test_train_smoke.py)."""
    import pytest

    from rgb_proprioceptive_pose_estimator_tpu.config import preset

    with pytest.raises(ValueError, match="jitter_hue"):
        preset("pr2").override(**{"data.jitter_hue": 0.6})
    with pytest.raises(ValueError, match="crop_ratio"):
        preset("pr2").override(**{"data.crop_ratio": (1.5, 0.5)})
    # valid combos construct fine (device-aug supports hue + aspect via
    # the continuous RandomResizedCrop path, ops/image_augment_device.py)
    preset("pr2").override(**{"data.crop_ratio": (0.75, 4 / 3),
                              "data.jitter_hue": 0.25})
    preset("pr2").override(**{"data.augment_device": True,
                              "data.jitter_hue": 0.1,
                              "data.crop_ratio": (0.75, 4 / 3)})
