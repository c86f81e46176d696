"""AOT serving export (utils/export.py): train -> export -> load -> serve."""

import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.utils.export import (
    export_predictor,
    load_predictor,
)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("exp") / "ckpt")
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 40,
        "train.eval_every": 0,
        "train.ckpt_every": 40,
        "train.log_every": 100,
        "train.ckpt_dir": ckpt,
        "data.synthetic_size": 128,
    })
    rppe.train(cfg)
    return cfg


def test_export_load_matches_predictor(trained, tmp_path):
    cfg = trained
    path = export_predictor(str(tmp_path / "pose.rppe"), cfg, max_batch=4)

    serve = load_predictor(path)
    assert serve.meta["max_batch"] == 4

    rs = np.random.RandomState(0)
    batch = {"proprio": rs.randn(3, cfg.model.proprio_dim).astype(np.float32)}
    pos_a, quat_a = serve(batch)

    pred = rppe.Predictor(cfg, max_batch=4)
    pos_b, quat_b = pred(dict(batch))

    assert pos_a.shape == (3, 3) and quat_a.shape == (3, 4)
    np.testing.assert_allclose(pos_a, pos_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(quat_a, quat_b, rtol=1e-5, atol=1e-6)


def test_export_rejects_oversize_and_bad_file(trained, tmp_path):
    cfg = trained
    path = export_predictor(str(tmp_path / "pose2.rppe"), cfg, max_batch=2)
    serve = load_predictor(path)
    with pytest.raises(ValueError):
        serve({"proprio": np.zeros((5, cfg.model.proprio_dim), np.float32)})

    bad = tmp_path / "bad.rppe"
    import zipfile

    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("meta.json", "{}")
    with pytest.raises((ValueError, KeyError)):
        load_predictor(str(bad))


def test_serving_casts_list_and_float64_inputs(trained, tmp_path):
    cfg = trained
    path = export_predictor(str(tmp_path / "pose3.rppe"), cfg, max_batch=2)
    serve = load_predictor(path)
    d = cfg.model.proprio_dim
    # python list input
    pos, _ = serve({"proprio": [[0.1] * d]})
    assert pos.shape == (1, 3)
    # float64 input
    pos64, _ = serve({"proprio": np.zeros((2, d), np.float64)})
    assert pos64.shape == (2, 3)


def test_int8_export_smaller_and_accurate(trained, tmp_path):
    """Weight-only int8 export: materially smaller artifact, outputs close
    to the f32 export."""
    import os

    cfg = trained
    p32 = export_predictor(str(tmp_path / "f32.rppe"), cfg, max_batch=4)
    p8 = export_predictor(str(tmp_path / "i8.rppe"), cfg, max_batch=4,
                          quantize="int8")
    assert os.path.getsize(p8) < 0.6 * os.path.getsize(p32)

    s32, s8 = load_predictor(p32), load_predictor(p8)
    assert s8.meta["quantize"] == "int8"
    rs = np.random.RandomState(0)
    batch = {"proprio": rs.randn(4, cfg.model.proprio_dim).astype(np.float32)}
    pos32, quat32 = s32(batch)
    pos8, quat8 = s8(batch)
    # per-channel int8 on a trained small MLP: small but nonzero error
    np.testing.assert_allclose(pos8, pos32, atol=0.05)
    np.testing.assert_allclose(np.abs(np.sum(quat8 * quat32, axis=-1)),
                               1.0, atol=0.01)


def test_int8_export_rejects_unknown_mode(trained, tmp_path):
    with pytest.raises(ValueError):
        export_predictor(str(tmp_path / "x.rppe"), trained, quantize="int4")


def test_export_carries_proprio_norm_stats(tmp_path):
    """proprio_normalize stats live in batch_stats, so the StableHLO export
    bakes them in: exported output == in-process Predictor, and both differ
    from an (incorrectly) unnormalized forward."""
    ckpt = str(tmp_path / "ckpt")
    cfg = rppe.preset("pr1").override(**{
        "model.proprio_normalize": True,
        "train.steps": 8,
        "train.eval_every": 0,
        "train.ckpt_every": 8,
        "train.log_every": 100,
        "train.ckpt_dir": ckpt,
        "data.synthetic_size": 128,
    })
    rppe.train(cfg)

    path = export_predictor(str(tmp_path / "pose.rppe"), cfg, max_batch=2)
    serve = load_predictor(path)
    rs = np.random.RandomState(1)
    batch = {"proprio": rs.randn(2, cfg.model.proprio_dim)
             .astype(np.float32) * 5.0 + 3.0}
    pos_e, quat_e = serve(batch)
    pred = rppe.Predictor(cfg, max_batch=2)
    pos_p, quat_p = pred(dict(batch))
    np.testing.assert_allclose(pos_e, pos_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(quat_e, quat_p, rtol=1e-5, atol=1e-5)

    # a normalize-trained checkpoint must NOT load with normalize off:
    # silently skipping the affine would corrupt every prediction, so the
    # structure mismatch fails loudly at restore time
    cfg_raw = cfg.override(**{"model.proprio_normalize": False})
    with pytest.raises(ValueError, match="do not match"):
        rppe.Predictor(cfg_raw, max_batch=2)
