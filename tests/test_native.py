"""Native C++ augment engine vs the numpy backend (SURVEY.md section 3.1
contingency shim; runtime/csrc/augment.cc)."""

import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.data import augment as aug
from rgb_proprioceptive_pose_estimator_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (no g++?)")


def _frames(n=6, hw=84, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (n, hw, hw, 3),
                                               np.uint8)


def test_center_crop_resize_matches_numpy():
    frames = _frames()
    out = native.center_crop_resize_batch(frames, 64)
    ref = np.stack([aug.center_crop_resize(f, 64) for f in frames])
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1   # cv2 fixed-point vs float bilinear: 1 LSB


def test_augment_batch_matches_numpy_backend():
    frames = _frames(8)
    rs = np.random.RandomState(3)
    params = [aug.sample_aug_params(84, 84, rs) for _ in range(8)]
    crops = np.asarray([[p.y0, p.x0, p.ch, p.cw] for p in params], np.int32)
    flips = np.asarray([p.flip for p in params], np.uint8)
    jit = np.asarray([[p.brightness, p.contrast, p.saturation, p.hue]
                      for p in params], np.float32)
    out = native.augment_batch(frames, 64, crops, flips, jit)
    ref = np.stack([aug.apply_aug_params(f, p, 64)
                    for f, p in zip(frames, params)])
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 2
    assert diff.mean() < 0.5


def test_native_deterministic():
    frames = _frames(4)
    crops = np.asarray([[0, 0, 84, 84]] * 4, np.int32)
    flips = np.asarray([1, 0, 1, 0], np.uint8)
    jit = np.asarray([[1.2, 0.8, 1.1, 0.1]] * 4, np.float32)
    a = native.augment_batch(frames, 64, crops, flips, jit)
    b = native.augment_batch(frames, 64, crops, flips, jit)
    np.testing.assert_array_equal(a, b)


def test_store_native_vs_numpy_paths(demo_h5):
    """The HDF5 store produces near-identical batches via both backends
    (same params; pixel backends within 2 LSB)."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        HDF5DemoStore,
    )

    kw = dict(cameras=("agentview",), image_size=64)
    sn = HDF5DemoStore(demo_h5, use_native=True, **kw)
    sp = HDF5DemoStore(demo_h5, use_native=False, **kw)
    idx = np.arange(8)
    bn = sn.get_batch(idx, augment=True, seed=5)
    bp = sp.get_batch(idx, augment=True, seed=5)
    diff = np.abs(bn["images"]["agentview"].astype(int)
                  - bp["images"]["agentview"].astype(int))
    assert diff.max() <= 2
    np.testing.assert_array_equal(bn["target_pos"], bp["target_pos"])
