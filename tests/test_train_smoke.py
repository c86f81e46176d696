"""End-to-end learning smoke tests (SURVEY.md section 5.2 integration):
config-1 (synthetic proprio) must actually learn on CPU; the image path
must learn pose from the fixture's informative images; the public
train/eval/predict API round-trips (C7, C8)."""

import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.models.fusion import example_batch


def test_pr1_synthetic_learns(tmp_path):
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 200,
        "train.log_every": 50,
        "train.eval_every": 200,
        "train.eval_steps": 4,
        "train.ckpt_every": 200,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "data.synthetic_size": 512,
    })
    out = rppe.train(cfg)
    m = out["metrics"]
    # untrained loss is ~1.0 (pos var ~0.3 + chordal ~0.7); must drop well below
    assert m["loss"] < 0.15, m
    assert m["eval_loss"] < 0.15, m


def test_pr1_huber_pos_loss_learns(tmp_path):
    """train.pos_loss='huber' end-to-end: the threaded config reaches the
    jitted step's loss (train metric reflects huber units) and learns."""
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 200,
        "train.log_every": 50,
        "train.eval_every": 200,
        "train.eval_steps": 4,
        "train.ckpt_every": 200,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "train.pos_loss": "huber",
        # delta scaled to the synthetic task's ~unit position spread
        # (a 5 cm delta on ~0.6 m errors caps the pos gradient at ~1/20
        # of MSE's -- correct outlier behavior, but this test wants
        # convergence in 200 steps, not a robustness study)
        "train.huber_delta": 0.5,
        "data.synthetic_size": 512,
    })
    out = rppe.train(cfg)
    m = out["metrics"]
    # huber <= 0.5*mse everywhere; untrained pos_loss is ~0.15 here
    assert m["pos_loss"] < 5e-3, m
    assert m["eval_pos_loss"] < 5e-3, m


def test_image_path_learns_from_fixture(tmp_path, demo_h5):
    """4-layer CNN regresses position from the fixture's drawn marker
    (config-2 style, BASELINE.json:8)."""
    cfg = rppe.preset("pr2").override(**{
        "model.image_size": 64,
        "model.image_features": 64,
        "model.head_hidden": [64],
        "data.path": demo_h5,
        "data.batch_size": 16,
        "data.num_workers": 2,
        "data.hflip_prob": 0.0,      # flips break image->pose geometry
        "data.jitter_prob": 0.0,
        "train.steps": 150,
        "train.lr": 3e-3,
        "train.log_every": 50,
        "train.eval_every": 150,
        "train.eval_steps": 3,
        "train.ckpt_every": 150,
        "train.ckpt_dir": str(tmp_path / "ckpt2"),
    })
    out = rppe.train(cfg)
    # position is visually encoded; 60 samples, 150 steps -> pos loss must fall
    assert out["metrics"]["pos_loss"] < 0.02, out["metrics"]


def test_evaluate_and_predict_api(tmp_path):
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 120,
        "train.eval_every": 0,
        "train.ckpt_every": 120,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "data.synthetic_size": 256,
    })
    rppe.train(cfg)

    # evaluate() restores the checkpoint and reports cm/deg MAE
    m = rppe.evaluate(cfg, max_batches=4)
    assert "pos_mae_cm" in m and "rot_mae_deg" in m
    assert m["step"] == 120

    # predict(): unbatched obs -> unbatched pose
    obs = {"proprio": np.random.RandomState(0).randn(
        cfg.model.proprio_dim).astype(np.float32)}
    pos, quat = rppe.predict(cfg, obs)
    assert pos.shape == (3,) and quat.shape == (4,)
    np.testing.assert_allclose(np.linalg.norm(quat), 1.0, atol=1e-5)

    # Predictor: batched obs, no recompile across calls, padding exercised;
    # warmup() pre-compiles the one served shape and chains
    pred = rppe.Predictor(cfg, max_batch=8).warmup()
    batch_obs = {"proprio": np.random.RandomState(1).randn(
        3, cfg.model.proprio_dim).astype(np.float32)}
    pos_b, quat_b = pred(batch_obs)
    assert pos_b.shape == (3, 3) and quat_b.shape == (3, 4)
    # single row of the batch == unbatched call on that row (consistency)
    p0, q0 = pred({"proprio": batch_obs["proprio"][0]})
    np.testing.assert_allclose(p0, pos_b[0], atol=1e-5)


def test_resume_auto_continues(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    base = rppe.preset("pr1").override(**{
        "train.steps": 50,
        "train.ckpt_every": 50,
        "train.eval_every": 0,
        "train.ckpt_dir": ckpt_dir,
        "data.synthetic_size": 256,
    })
    rppe.train(base)
    # continue to 80 from the step-50 checkpoint
    cont = base.override(**{"train.steps": 80, "train.ckpt_every": 80})
    out = rppe.train(cont)
    assert int(out["state"].step) == 80


def test_pr5_shape_dualcam_temporal_dp(tmp_path, demo_h5):
    """Config-5 shape (BASELINE.json:11) at tiny scale: dual-camera
    two-encoder fusion + temporal stacking + data-parallel over all 8
    fake devices, trained end-to-end through the real pipeline."""
    cfg = rppe.preset("pr5").override(**{
        "model.backbone": "cnn_small",  # keep the CPU-mesh compile fast
        "model.image_size": 32,
        "model.image_features": 32,
        "model.proprio_dim": 16,
        "model.proprio_hidden": [32],
        "model.proprio_features": 16,
        "model.head_hidden": [32],
        "model.dtype": "float32",      # CPU mesh: bf16 is slow and untested here
        "data.path": demo_h5,
        "data.batch_size": 16,
        "data.num_workers": 2,
        "train.steps": 6,
        "train.steps_per_call": 1,     # preset ships 8; tiny run here
        "train.log_every": 3,
        "train.eval_every": 6,
        "train.eval_steps": 2,
        "train.ckpt_every": 6,
        "train.ckpt_dir": str(tmp_path / "ckpt5"),
    })
    out = rppe.train(cfg)
    assert out["mesh"].devices.size == 8
    m = out["metrics"]
    assert np.isfinite(m["loss"])
    assert "eval_pos_mae_cm" in m
    # both encoders + temporal stacking actually in the graph
    params = out["state"].params
    assert "encoder_agentview" in params
    assert "encoder_robot0_eye_in_hand" in params


def test_evaluate_on_different_demo_file(tmp_path, demo_h5):
    """evaluate(data_path=...) scores a checkpoint against a demo file
    other than the training one (held-out collection workflow)."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    cfg = rppe.preset("pr2").override(**{
        "model.backbone": "cnn_small",
        "model.image_size": 64,
        "model.image_features": 32,
        "model.head_hidden": [32],
        "model.use_proprio": False,
        "data.path": demo_h5,
        "data.batch_size": 16,
        "data.num_workers": 0,
        "train.steps": 10,
        "train.eval_every": 0,
        "train.ckpt_every": 10,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
    })
    rppe.train(cfg)

    other = write_demo_fixture(str(tmp_path / "other.hdf5"), n_demos=2,
                               steps=16, cameras=("agentview",),
                               image_hw=84, proprio_dim=16, seed=99)
    m = rppe.evaluate(cfg, data_path=other, max_batches=2)
    assert "pos_mae_cm" in m and np.isfinite(m["pos_mae_cm"])


def test_image_path_learns_with_mirror_consistent_flips(tmp_path, demo_h5):
    """With hflip_pose_mirror, flips become label-consistent for the
    fixture's geometry (marker x = pos_x * (W-1)), so training WITH flips
    must still drive pos loss down (VERDICT r1 missing-2: unmirrored flips
    broke image->pose learning)."""
    cfg = rppe.preset("pr2").override(**{
        "model.image_size": 64,
        "model.image_features": 64,
        "model.head_hidden": [64],
        "data.path": demo_h5,
        "data.batch_size": 16,
        "data.num_workers": 2,
        "data.hflip_prob": 0.5,
        "data.hflip_pose_mirror": True,
        "data.hflip_mirror_axis": 0,
        "data.hflip_mirror_center": 0.5,
        "data.jitter_prob": 0.0,
        "train.steps": 150,
        "train.lr": 3e-3,
        "train.log_every": 50,
        "train.eval_every": 0,
        "train.ckpt_every": 150,
        "train.ckpt_dir": str(tmp_path / "ckptm"),
    })
    out = rppe.train(cfg)
    assert out["metrics"]["pos_loss"] < 0.02, out["metrics"]


def test_image_path_learns_from_jpeg_fixture(tmp_path):
    """The image path trains end-to-end from JPEG-encoded observations
    (decode -> augment -> train; VERDICT r1 missing-3)."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    demo = write_demo_fixture(str(tmp_path / "demo_jpeg.hdf5"), n_demos=3,
                              steps=20, cameras=("agentview",), image_hw=84,
                              proprio_dim=16, seed=0, encoding="jpeg")
    cfg = rppe.preset("pr2").override(**{
        "model.image_size": 64,
        "model.image_features": 64,
        "model.head_hidden": [64],
        "data.path": demo,
        "data.batch_size": 16,
        "data.num_workers": 2,
        "data.jitter_prob": 0.0,
        "train.steps": 150,
        "train.lr": 3e-3,
        "train.log_every": 50,
        "train.eval_every": 0,
        "train.ckpt_every": 150,
        "train.ckpt_dir": str(tmp_path / "ckptj"),
    })
    out = rppe.train(cfg)
    assert out["metrics"]["pos_loss"] < 0.02, out["metrics"]


def test_steps_per_call_unroll_equivalence(tmp_path):
    """train.steps_per_call=k (lax.scan unrolled dispatch) must reproduce
    the step-by-step run exactly -- same data order, same RNG folding,
    same optimizer trajectory (engine/train_step.make_train_step unroll)."""
    import jax

    results = {}
    for spc in (1, 4):
        cfg = rppe.preset("pr1").override(**{
            "train.steps": 8,
            "train.steps_per_call": spc,
            "train.log_every": 4,
            "train.eval_every": 0,
            "train.ckpt_every": 0,
            "data.batch_size": 16,
            "data.synthetic_size": 128,
            "train.ckpt_dir": str(tmp_path / f"spc{spc}"),
        })
        out = rppe.train(cfg)
        results[spc] = jax.tree.leaves(out["state"].params)
    for a, b in zip(results[1], results[4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_steps_per_call_cadence_validation(tmp_path):
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 8, "train.steps_per_call": 3,
        "train.ckpt_dir": str(tmp_path),
    })
    with pytest.raises(ValueError, match="steps_per_call"):
        rppe.train(cfg)


def test_pallas_bn_requires_single_device_mesh(tmp_path):
    """bn_stats='pallas' is not SPMD-partitionable; fit() must refuse a
    multi-device mesh instead of silently computing per-shard BN stats
    (VERDICT r2 weak-2)."""
    cfg = rppe.preset("pr1").override(**{
        "model.bn_stats": "pallas",
        "dist.num_devices": 8,
        "train.ckpt_dir": str(tmp_path),
    })
    with pytest.raises(ValueError, match="pallas.*single-device"):
        rppe.train(cfg)


def test_stack_microbatches_is_cached():
    """The jitted stack function must be built once per sharding, not per
    call -- a per-call @jax.jit closure retraces every training iteration
    (ADVICE r2)."""
    import jax
    import jax.numpy as jnp

    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        _stack_fn,
        stack_microbatches,
    )

    batches = [{"x": jnp.ones((4, 2)) * i} for i in range(2)]
    stack_microbatches(batches)
    before = _stack_fn.cache_info()
    out = stack_microbatches(batches)
    after = _stack_fn.cache_info()
    assert after.hits == before.hits + 1
    assert out["x"].shape == (2, 4, 2)
    np.testing.assert_allclose(np.asarray(out["x"][1]), 1.0)


def test_evaluate_per_demo(tmp_path, demo_h5):
    """evaluate(per_demo=True): one MAE row per HDF5 trajectory; the
    sample-weighted mean of the rows matches the aggregate metric."""
    import numpy as np

    import rgb_proprioceptive_pose_estimator_tpu as rppe

    cfg = rppe.preset("pr2").override(**{
        "model.backbone": "cnn_small",
        "model.proprio_dim": 16,
        "model.image_size": 64,
        "model.image_features": 32,
        "model.head_hidden": (32,),
        "data.path": demo_h5,
        "data.batch_size": 12,   # divides the 60 eval samples: the
        # aggregate pipeline then covers every sample exactly once, so
        # the per-demo rows must recombine to it
        "dist.num_devices": 4,   # 12 % 4 == 0 on the fake 8-dev mesh
        "data.num_workers": 0,
        "train.steps": 4,
        "train.eval_every": 0,
        "train.log_every": 8,
        "train.ckpt_every": 4,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
    })
    rppe.train(cfg)
    npz_path = str(tmp_path / "preds.npz")
    out = rppe.evaluate(cfg, per_demo=True, percentiles=True,
                        success_at=[(1e-4, 1e-4), (5.0, 30.0), (1e6, 1e6)],
                        dump_predictions=npz_path)
    rows = out["per_demo"]
    assert set(rows) == {"demo_0", "demo_1", "demo_2"}
    assert all(r["steps"] == 20 for r in rows.values())
    # demo rows recombine to the aggregate (same eval transform, full
    # dataset, mean over samples)
    n = sum(r["steps"] for r in rows.values())
    pos = sum(r["pos_mae_cm"] * r["steps"] for r in rows.values()) / n
    np.testing.assert_allclose(pos, out["pos_mae_cm"], rtol=1e-3)

    # percentiles share the same per-sample pass: monotone quantile
    # ladder over every sample of the split
    assert out["n_samples"] == 60
    for key in ("pos_err_cm", "rot_err_deg"):
        q = out[key]
        assert 0.0 <= q["p50"] <= q["p90"] <= q["p95"] <= q["max"], q
    # the median must bracket the per-demo range (it is a statistic of
    # the same errors)
    lo = min(r["pos_mae_cm"] for r in rows.values())
    hi = max(r["pos_mae_cm"] for r in rows.values())
    assert lo * 0.1 <= out["pos_err_cm"]["p50"] <= hi * 10

    # success_at shares the pass too: joint rate bounded by each
    # marginal, rates monotone in the thresholds, trivial bounds exact
    s = out["success"]
    assert [(r["pos_cm"], r["rot_deg"]) for r in s] == [
        (1e-4, 1e-4), (5.0, 30.0), (1e6, 1e6)]
    for r in s:
        assert r["rate"] <= min(r["pos_rate"], r["rot_rate"]) + 1e-9
    assert s[0]["rate"] <= s[1]["rate"] <= s[2]["rate"]
    assert s[0]["rate"] == 0.0    # an untrained net is never within 1e-4 cm
    assert s[2]["rate"] == 1.0    # every sample is within 10 km / 1e6 deg

    # dump_predictions: the npz carries the same per-sample pass
    assert out["predictions_path"] == npz_path
    dump = np.load(npz_path)
    assert dump["pred_pos"].shape == (60, 3)
    assert dump["pred_quat"].shape == (60, 4)
    # quantiles recompute exactly from the dumped errors
    np.testing.assert_allclose(
        np.percentile(dump["pos_err_cm"], 50), out["pos_err_cm"]["p50"],
        atol=5e-4)
    # per-demo rows recompute from the dumped trajectory coordinates
    d0 = dump["demo_idx"] == 0
    key0 = str(dump["demo_keys"][0])
    np.testing.assert_allclose(dump["pos_err_cm"][d0].mean(),
                               rows[key0]["pos_mae_cm"], atol=5e-4)
    assert list(dump["t"][d0]) == list(range(20))

    # synthetic source: loud error, not a silent missing key
    cfg_syn = rppe.preset("pr1").override(**{
        "train.ckpt_dir": str(tmp_path / "ckpt2")})
    import pytest
    with pytest.raises(ValueError, match="hdf5"):
        rppe.evaluate(cfg_syn, per_demo=True)


def test_vit_backbone_learns_from_fixture(tmp_path, demo_h5):
    """The ViT backbone (TPU-native addition, models/vit.py) regresses
    position from the fixture's drawn marker through the full fit() path."""
    cfg = rppe.preset("pr2").override(**{
        "model.backbone": "vit",
        "model.image_size": 64,
        "model.image_features": 64,
        "model.head_hidden": [64],
        "model.vit_patch": 8,
        "model.vit_dim": 64,
        "model.vit_depth": 2,
        "model.vit_heads": 4,
        "data.path": demo_h5,
        "data.batch_size": 16,
        "data.num_workers": 2,
        "data.hflip_prob": 0.0,
        "data.jitter_prob": 0.0,
        "train.steps": 200,
        "train.lr": 1e-3,
        "train.log_every": 50,
        "train.eval_every": 0,
        "train.ckpt_every": 200,
        "train.ckpt_dir": str(tmp_path / "ckpt_vit"),
    })
    out = rppe.train(cfg)
    assert out["metrics"]["pos_loss"] < 0.03, out["metrics"]


def test_rot6d_head_learns_orientation(tmp_path):
    """model.rot_rep='rot6d' trains end-to-end through the standard
    quaternion loss and beats chance on orientation (the continuous
    representation must not break the jitted train step or the eval path)."""
    cfg = rppe.preset("pr1").override(**{
        "model.rot_rep": "rot6d",
        "train.steps": 300,
        "train.log_every": 100,
        "train.eval_every": 300,
        "train.eval_steps": 4,
        "train.ckpt_every": 300,
        "train.ckpt_dir": str(tmp_path / "ckpt6d"),
        "data.synthetic_size": 512,
    })
    out = rppe.train(cfg)
    m = out["metrics"]
    assert m["loss"] < 0.15, m
    assert m["eval_loss"] < 0.15, m
    # predict path: unit quaternions out
    batch = example_batch(cfg.model, batch_size=4)
    pred = rppe.Predictor(cfg, max_batch=4)
    pos, quat = pred(batch)
    assert pos.shape == (4, 3) and quat.shape == (4, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(quat), axis=-1), 1.0, atol=1e-4)


def test_predictor_warmup_image_temporal():
    """warmup() builds a correctly-shaped zero observation for every input
    modality (multi-camera images x temporal window x proprio) and leaves
    the predictor serving real calls."""
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import (
        create_state,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
    )

    cfg = rppe.preset("pr2").override(**{
        "model.backbone": "cnn_small",
        "model.image_size": 32,
        "model.image_features": 16,
        "model.head_hidden": (16,),
        "model.proprio_dim": 8,
        "model.proprio_hidden": (16,),
        "model.proprio_features": 8,
        "model.cameras": ("agentview", "wrist"),
        "model.temporal_frames": 2,
    })
    tx = make_optimizer(cfg.train)
    state = create_state(cfg, tx, seed=0)
    model = build_model(cfg.model)
    pred = rppe.Predictor(cfg, state=state, model=model,
                          max_batch=2).warmup()

    rs = np.random.RandomState(0)
    obs = {
        "images": {c: rs.randint(0, 255, (2, 32, 32, 3), np.uint8)
                   for c in cfg.model.cameras},
        "proprio": rs.randn(2, 8).astype(np.float32),
    }
    pos, quat = pred(obs)
    assert pos.shape == (3,) and quat.shape == (4,)   # unbatched (T, ...)

    # dead-camera signatures pre-compile and then serve (the first call
    # after a sensor dies must not pay a fresh jit compile mid-loop)
    pred2 = rppe.Predictor(cfg, state=state, model=model, max_batch=2,
                           allow_missing_cameras=True).warmup(
        dead_camera_sets=[("agentview",)])
    dpos, dquat = pred2({
        "images": {"wrist": obs["images"]["wrist"]},
        "proprio": obs["proprio"]})
    assert dpos.shape == (3,) and dquat.shape == (4,)
    assert not np.allclose(dpos, pos)
    with pytest.raises(ValueError, match="not in"):
        pred2.warmup(dead_camera_sets=[("bogus",)])
