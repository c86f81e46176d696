"""Device-resident dataset cache (data.device_cache): ship int32 frame
indices, gather from HBM inside the jitted step. Must be bit-equivalent
to the host pipeline (both read the same memoized resize cache)."""

import os

import jax
import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
    write_demo_fixture,
)
from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import build_dataset


@pytest.fixture(scope="module")
def demo_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dc") / "d.hdf5")
    write_demo_fixture(p, n_demos=4, steps=16, image_hw=72, seed=3)
    return p


def _cfg(demo_path, tmp_path, dc: bool, **over):
    return rppe.preset("pr2").override(**{
        "data.path": demo_path, "data.batch_size": 8,
        "data.val_fraction": 0.25,
        "data.augment_device": True, "data.crop_margin": 2,
        "data.device_cache": dc, "model.image_size": 64,
        "train.steps": 6, "train.eval_every": 6, "train.eval_steps": 0,
        "train.ckpt_every": 0, "train.log_every": 3,
        "train.ckpt_dir": str(tmp_path / f"dc{dc}"), **over})


def test_batches_carry_indices_and_gather_matches(demo_path):
    """Pipeline emits image_idx; gathering the device cache reproduces the
    host-shipped pixels exactly."""
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        gather_cached_images,
    )

    cfg_host = _cfg(demo_path, __import__("pathlib").Path("/tmp"), False)
    cfg_dev = cfg_host.override(**{"data.device_cache": True})
    host_ds = build_dataset(cfg_host, split="train")
    dev_ds = build_dataset(cfg_dev, split="train")
    idx = np.arange(8)
    hb = host_ds.get_batch(idx, augment=True, seed=5)
    db = dev_ds.get_batch(idx, augment=True, seed=5)
    assert "image_idx" in db and "images" not in db
    assert db["image_idx"].dtype == np.int32
    hw = cfg_dev.model.image_size + 2 * cfg_dev.data.crop_margin
    cache = {c: jax.numpy.asarray(a)
             for c, a in dev_ds.build_resized_cache(hw).items()}
    gathered = gather_cached_images(cache, {
        "image_idx": jax.numpy.asarray(db["image_idx"])})
    for cam in hb["images"]:
        np.testing.assert_array_equal(
            np.asarray(gathered["images"][cam]), hb["images"][cam])
    # targets identical too (pr2 is RGB-only, no proprio)
    np.testing.assert_array_equal(hb["target_pos"], db["target_pos"])
    np.testing.assert_array_equal(hb["target_quat"], db["target_quat"])


def test_training_bitwise_matches_host_path(demo_path, tmp_path):
    res = {}
    for dc in (False, True):
        out = rppe.train(_cfg(demo_path, tmp_path, dc))
        res[dc] = jax.tree.leaves(out["state"].params)
    for a, b in zip(res[False], res[True]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_evaluate_with_device_cache(demo_path, tmp_path):
    cfg = _cfg(demo_path, tmp_path, True)
    rppe.train(cfg)
    ev_dc = rppe.evaluate(cfg, split="val")
    ev_host = rppe.evaluate(cfg.override(**{"data.device_cache": False}),
                            split="val")
    for k in ("pos_mae_cm", "rot_mae_deg"):
        np.testing.assert_allclose(ev_dc[k], ev_host[k], rtol=1e-5)


def test_device_cache_validation():
    with pytest.raises(ValueError, match="augment_device"):
        rppe.preset("pr2").override(**{"data.device_cache": True})
    with pytest.raises(ValueError, match="hdf5"):
        rppe.preset("pr1").override(**{"data.device_cache": True,
                                       "data.augment": False})


def test_device_cache_temporal_frames(demo_path, tmp_path):
    """Temporal stacking: (B, T) index gather matches host stacking."""
    over = {"model.temporal_frames": 3, "train.steps": 2,
            "train.eval_every": 0, "train.log_every": 2}
    res = {}
    for dc in (False, True):
        cfg = _cfg(demo_path, tmp_path, dc, **over).override(
            **{"train.ckpt_dir": str(tmp_path / f"t{dc}")})
        out = rppe.train(cfg)
        res[dc] = jax.tree.leaves(out["state"].params)
    for a, b in zip(res[False], res[True]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_device_cache_requires_image_backbone():
    """device_cache with a proprio-only model would ship dead image_idx
    arrays and silently train without images (ADVICE r2)."""
    from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import (
        build_dataset,
    )

    cfg = rppe.preset("pr3").override(**{
        "model.backbone": "none",
        "data.device_cache": True,
        "data.augment": False,
        "data.path": "/nonexistent.hdf5",
    })
    with pytest.raises(ValueError, match="backbone"):
        build_dataset(cfg)


def test_evaluate_drop_camera_with_device_cache(tmp_path):
    """evaluate(drop_cameras=) through the device-cache path: the dead
    camera is skipped at cache UPLOAD (no HBM spent on frames that will
    never be encoded), the in-graph gather only materializes live cameras,
    and the metrics match the raw-pixel host path exactly."""
    p = str(tmp_path / "d2.hdf5")
    write_demo_fixture(p, n_demos=3, steps=12, image_hw=72, seed=5,
                       cameras=("agentview", "robot0_eye_in_hand"))
    cfg = _cfg(p, tmp_path, True, **{
        "model.cameras": ("agentview", "robot0_eye_in_hand"),
        "model.camera_dropout": 0.3, "model.image_features": 32,
        "model.head_hidden": (32,)})
    rppe.train(cfg)
    dead_dc = rppe.evaluate(cfg, split="val", drop_cameras=("agentview",))
    dead_host = rppe.evaluate(cfg.override(**{"data.device_cache": False}),
                              split="val", drop_cameras=("agentview",))
    for k in ("pos_mae_cm", "rot_mae_deg"):
        np.testing.assert_allclose(dead_dc[k], dead_host[k], rtol=1e-5)
    full = rppe.evaluate(cfg, split="val")
    assert dead_dc["pos_mae_cm"] != full["pos_mae_cm"]
