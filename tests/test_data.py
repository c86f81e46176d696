"""Data layer: HDF5 reader vs generated fixture, augmentation determinism,
pipeline determinism + checkpointable sampler state (SURVEY.md section 5.2)."""

import os

import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.config import Config, DataConfig, ModelConfig
from rgb_proprioceptive_pose_estimator_tpu.data import augment as aug
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import HDF5DemoStore
from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import (
    HostPipeline,
    build_dataset,
)
from rgb_proprioceptive_pose_estimator_tpu.data.synthetic import (
    SyntheticProprioDataset,
)


# ---- synthetic (C15) -------------------------------------------------------

def test_synthetic_deterministic_and_unit_quats():
    d1 = SyntheticProprioDataset(size=64, proprio_dim=8, seed=3)
    d2 = SyntheticProprioDataset(size=64, proprio_dim=8, seed=3)
    b1 = d1.get_batch(np.arange(16))
    b2 = d2.get_batch(np.arange(16))
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])
    np.testing.assert_allclose(
        np.linalg.norm(b1["target_quat"], axis=-1), 1.0, atol=1e-5)


# ---- hdf5 store (C1) -------------------------------------------------------

def test_hdf5_index_and_shapes(demo_h5):
    store = HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                          proprio_key="obs/robot0_proprio-state")
    assert len(store) == 3 * 20
    assert store.proprio_dim == 16
    b = store.get_batch(np.arange(8), augment=False, seed=0)
    assert b["images"]["agentview"].shape == (8, 64, 64, 3)
    assert b["images"]["agentview"].dtype == np.uint8
    assert b["proprio"].shape == (8, 16)
    assert b["target_pos"].shape == (8, 3)
    np.testing.assert_allclose(
        np.linalg.norm(b["target_quat"], axis=-1), 1.0, atol=1e-5)


def test_hdf5_temporal_stacking_clamps_at_episode_start(demo_h5):
    store = HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                          temporal_frames=3)
    # flat index 0 == (demo_0, t=0): all 3 frames must be the t=0 frame
    b = store.get_batch(np.array([0]), augment=False, seed=0)
    img = b["images"]["agentview"]
    assert img.shape == (1, 3, 64, 64, 3)
    np.testing.assert_array_equal(img[0, 0], img[0, 1])
    np.testing.assert_array_equal(img[0, 1], img[0, 2])
    assert b["proprio"].shape == (1, 3, 16)


def test_hdf5_dual_camera(demo_h5):
    store = HDF5DemoStore(
        demo_h5, cameras=("agentview", "robot0_eye_in_hand"), image_size=48)
    b = store.get_batch(np.array([5, 7]), augment=False, seed=0)
    assert set(b["images"].keys()) == {"agentview", "robot0_eye_in_hand"}


def test_hdf5_no_cache_matches_cache(demo_h5):
    a = HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                      cache_images=True)
    b = HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                      cache_images=False)
    idx = np.array([0, 13, 41])
    ba = a.get_batch(idx, augment=False, seed=0)
    bb = b.get_batch(idx, augment=False, seed=0)
    np.testing.assert_array_equal(
        ba["images"]["agentview"], bb["images"]["agentview"])


# ---- augmentation (C2) -----------------------------------------------------

def test_augment_deterministic_under_fixed_seed():
    img = np.random.RandomState(0).randint(0, 256, (84, 84, 3), np.uint8)
    a = aug.augment_image(img, 64, np.random.RandomState(42))
    b = aug.augment_image(img, 64, np.random.RandomState(42))
    np.testing.assert_array_equal(a, b)
    c = aug.augment_image(img, 64, np.random.RandomState(43))
    assert not np.array_equal(a, c)


def test_augment_temporal_consistency(demo_h5):
    """Frames of one temporal stack must share the same crop/flip/jitter."""
    store = HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                          temporal_frames=3, jitter_prob=1.0, hflip_prob=1.0)
    b = store.get_batch(np.array([0]), augment=True, seed=7)
    img = b["images"]["agentview"]
    # t=0 sample: underlying frames identical, so augmented frames must be too
    np.testing.assert_array_equal(img[0, 0], img[0, 1])


def test_eval_transform_deterministic():
    img = np.random.RandomState(0).randint(0, 256, (100, 80, 3), np.uint8)
    a = aug.center_crop_resize(img, 64)
    b = aug.center_crop_resize(img, 64)
    assert a.shape == (64, 64, 3)
    np.testing.assert_array_equal(a, b)


# ---- pipeline (SURVEY.md section 4.4) ---------------------------------------

def _pipe_cfg(workers):
    return DataConfig(source="synthetic", batch_size=16, num_workers=workers,
                      prefetch=2, seed=11, synthetic_size=128)


def test_pipeline_deterministic_across_worker_counts():
    ds = SyntheticProprioDataset(size=128, proprio_dim=8, seed=1)
    seq = {}
    for workers in (0, 4):
        pipe = HostPipeline(ds, _pipe_cfg(workers), sharding=None, train=True)
        seq[workers] = [np.asarray(next(pipe)["proprio"]) for _ in range(10)]
        pipe.close()
    for a, b in zip(seq[0], seq[4]):
        np.testing.assert_array_equal(a, b)


def test_pipeline_epoch_covers_dataset_once():
    ds = SyntheticProprioDataset(size=128, proprio_dim=8, seed=1)
    pipe = HostPipeline(ds, _pipe_cfg(0), sharding=None, train=False)
    seen = []
    for batch in pipe.epoch():
        seen.append(np.asarray(batch["proprio"]))
    allb = np.concatenate(seen)
    assert allb.shape[0] == 128
    # eval order is sequential (no shuffle)
    np.testing.assert_array_equal(allb, ds._states)
    pipe.close()


def test_pipeline_state_resume_mid_epoch():
    """Save/restore of sampler state reproduces the exact batch stream
    (SURVEY.md section 6.4)."""
    ds = SyntheticProprioDataset(size=128, proprio_dim=8, seed=1)
    pipe = HostPipeline(ds, _pipe_cfg(2), sharding=None, train=True)
    ref = [np.asarray(next(pipe)["proprio"]) for _ in range(12)]
    pipe.close()

    pipe1 = HostPipeline(ds, _pipe_cfg(2), sharding=None, train=True)
    for _ in range(5):
        next(pipe1)
    state = pipe1.state_dict()
    pipe1.close()

    pipe2 = HostPipeline(ds, _pipe_cfg(2), sharding=None, train=True)
    pipe2.load_state_dict(state)
    got = [np.asarray(next(pipe2)["proprio"]) for _ in range(7)]
    pipe2.close()
    for a, b in zip(ref[5:], got):
        np.testing.assert_array_equal(a, b)


def test_pipeline_epochs_reshuffle():
    ds = SyntheticProprioDataset(size=64, proprio_dim=8, seed=1)
    cfg = DataConfig(source="synthetic", batch_size=64, num_workers=0,
                     seed=5, synthetic_size=64)
    pipe = HostPipeline(ds, cfg, sharding=None, train=True)
    e0 = np.asarray(next(pipe)["proprio"])
    e1 = np.asarray(next(pipe)["proprio"])
    assert not np.array_equal(e0, e1), "epochs must reshuffle"
    # same multiset of samples
    np.testing.assert_allclose(
        np.sort(e0.sum(-1)), np.sort(e1.sum(-1)), rtol=1e-6)
    pipe.close()


def test_build_dataset_hdf5(demo_h5):
    cfg = Config(
        model=ModelConfig(backbone="cnn_small", image_size=64,
                          cameras=("agentview",), use_proprio=True),
        data=DataConfig(source="hdf5", path=demo_h5, batch_size=8),
    )
    ds = build_dataset(cfg)
    assert len(ds) == 60


def test_hdf5_missing_key_error_is_helpful(demo_h5):
    with pytest.raises(KeyError, match="available obs keys"):
        HDF5DemoStore(demo_h5, cameras=("no_such_cam",), image_size=64)
    with pytest.raises(KeyError, match="target_key"):
        HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                      target_key="obs/not_there")


def test_eval_epoch_rotation_covers_different_batches():
    """Partial eval passes rotate across the split (VERDICT r1 weak-5):
    epoch(start=k) begins at batch k (mod split size), wraps around, and is
    deterministic for a given start."""
    ds = SyntheticProprioDataset(size=128, proprio_dim=8, seed=1)
    pipe = HostPipeline(ds, _pipe_cfg(0), sharding=None, train=False)

    def window(start):
        return [np.asarray(b["proprio"])
                for b in pipe.epoch(max_batches=2, start=start)]

    w0, w2 = window(0), window(2)
    # deterministic per start
    for a, b in zip(w0, window(0)):
        np.testing.assert_array_equal(a, b)
    # different windows see different data
    assert not np.array_equal(w0[0], w2[0])
    # start=2 begins at batch 2 of the sequential eval order
    np.testing.assert_array_equal(w2[0], ds._states[32:48])
    # wraparound: start=7 of 8 batches -> batches 7 then 0
    w7 = window(7)
    np.testing.assert_array_equal(w7[0], ds._states[112:128])
    np.testing.assert_array_equal(w7[1], ds._states[0:16])
    # a FULL pass ignores start (covers everything exactly once, in order)
    full = np.concatenate([np.asarray(b["proprio"])
                           for b in pipe.epoch(start=3)])
    np.testing.assert_array_equal(full, ds._states)
    pipe.close()


def test_hflip_pose_mirror_host_path(demo_h5):
    """Pose-mirroring flips on the host path (VERDICT r1 missing-2): the
    image is horizontally flipped, the target is mirrored, and the flip is
    SHARED across cameras."""
    kw = dict(cameras=("agentview", "robot0_eye_in_hand"), image_size=64,
              crop_scale=(1.0, 1.0), jitter_prob=0.0)
    plain = HDF5DemoStore(demo_h5, **kw)
    flipped = HDF5DemoStore(demo_h5, hflip_prob=1.0, hflip_pose_mirror=True,
                            hflip_mirror_axis=0, hflip_mirror_center=0.5,
                            **kw)
    idx = np.arange(8)
    b0 = plain.get_batch(idx, augment=False, seed=5)
    b1 = flipped.get_batch(idx, augment=True, seed=5)
    for cam in kw["cameras"]:
        # full-area crop + flip == horizontal mirror of the eval transform
        np.testing.assert_array_equal(
            b1["images"][cam], b0["images"][cam][:, :, ::-1])
    # position mirrored about x=0.5; other axes untouched
    np.testing.assert_allclose(b1["target_pos"][:, 0],
                               1.0 - b0["target_pos"][:, 0], atol=1e-6)
    np.testing.assert_array_equal(b1["target_pos"][:, 1:],
                                  b0["target_pos"][:, 1:])
    # quaternion: w and v_x kept, v_y/v_z negated
    np.testing.assert_array_equal(b1["target_quat"][:, :2],
                                  b0["target_quat"][:, :2])
    np.testing.assert_array_equal(b1["target_quat"][:, 2:],
                                  -b0["target_quat"][:, 2:])


def test_hflip_without_mirror_leaves_targets(demo_h5):
    """hflip without pose-mirroring must not touch the labels (the r1
    behavior, kept for parity; config warns about it)."""
    kw = dict(cameras=("agentview",), image_size=64,
              crop_scale=(1.0, 1.0), jitter_prob=0.0)
    plain = HDF5DemoStore(demo_h5, **kw)
    flipped = HDF5DemoStore(demo_h5, hflip_prob=1.0, **kw)
    idx = np.arange(8)
    b0 = plain.get_batch(idx, augment=False, seed=5)
    b1 = flipped.get_batch(idx, augment=True, seed=5)
    np.testing.assert_array_equal(b1["target_pos"], b0["target_pos"])
    np.testing.assert_array_equal(b1["target_quat"], b0["target_quat"])
    np.testing.assert_array_equal(
        b1["images"]["agentview"], b0["images"]["agentview"][:, :, ::-1])


def test_fixture_proprio_does_not_leak_target():
    """The fixture's proprio must not contain the pose (VERDICT r1 weak-3:
    leaky proprio contaminated the accuracy artifacts)."""
    import tempfile, os
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    with tempfile.TemporaryDirectory() as d:
        p = write_demo_fixture(os.path.join(d, "f.hdf5"), n_demos=2,
                               steps=30, cameras=("agentview",), seed=4)
        store = HDF5DemoStore(p, cameras=("agentview",), image_size=64)
        b = store.get_batch(np.arange(40), augment=False, seed=0)
        # no proprio column IS a target column (the r1 leak copied pos/quat
        # verbatim into proprio[:, :7]); independent smooth walks can still
        # correlate spuriously, so test for copying, not correlation
        tg = np.concatenate([b["target_pos"], b["target_quat"]], 1)
        for j in range(tg.shape[1]):
            dist = np.abs(b["proprio"] - tg[:, j:j + 1]).max(axis=0)
            assert dist.min() > 1e-3, (
                f"proprio column duplicates target column {j}")
        # the leak_pose_into_proprio escape hatch still exists for
        # proprio-learnability tests
        p2 = write_demo_fixture(os.path.join(d, "g.hdf5"), n_demos=2,
                                steps=30, cameras=("agentview",), seed=4,
                                leak_pose_into_proprio=True)
        s2 = HDF5DemoStore(p2, cameras=("agentview",), image_size=64)
        b2 = s2.get_batch(np.arange(40), augment=False, seed=0)
        np.testing.assert_array_equal(b2["proprio"][:, :3], b2["target_pos"])


# ---- encoded (JPEG/PNG) observations (VERDICT r1 missing-3) ----------------

@pytest.fixture(scope="module")
def demo_h5_jpeg(tmp_path_factory):
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    path = tmp_path_factory.mktemp("data") / "demo_jpeg.hdf5"
    return write_demo_fixture(
        str(path), n_demos=3, steps=20, cameras=("agentview",),
        image_hw=84, proprio_dim=16, seed=0, encoding="jpeg")


def test_encoded_roundtrip_png_is_lossless(tmp_path):
    """PNG encode/decode round-trips exactly; the store decodes encoded
    datasets transparently."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    raw = write_demo_fixture(str(tmp_path / "raw.hdf5"), n_demos=2, steps=10,
                             cameras=("agentview",), image_hw=64, seed=7)
    png = write_demo_fixture(str(tmp_path / "png.hdf5"), n_demos=2, steps=10,
                             cameras=("agentview",), image_hw=64, seed=7,
                             encoding="png")
    s_raw = HDF5DemoStore(raw, cameras=("agentview",), image_size=64)
    s_png = HDF5DemoStore(png, cameras=("agentview",), image_size=64)
    idx = np.arange(20)
    b_raw = s_raw.get_batch(idx, augment=False, seed=0)
    b_png = s_png.get_batch(idx, augment=False, seed=0)
    np.testing.assert_array_equal(b_raw["images"]["agentview"],
                                  b_png["images"]["agentview"])
    np.testing.assert_array_equal(b_raw["target_pos"], b_png["target_pos"])


def test_encoded_jpeg_decodes_and_matches_uncached(demo_h5_jpeg):
    """JPEG store: decoded shapes/dtypes are right, decode is deterministic,
    and the RAM-cached path equals the h5py-read path."""
    cached = HDF5DemoStore(demo_h5_jpeg, cameras=("agentview",),
                           image_size=64, cache_images=True)
    uncached = HDF5DemoStore(demo_h5_jpeg, cameras=("agentview",),
                             image_size=64, cache_images=False)
    idx = np.arange(0, 60, 7)
    a = cached.get_batch(idx, augment=False, seed=3)
    b = uncached.get_batch(idx, augment=False, seed=3)
    img = a["images"]["agentview"]
    assert img.shape == (len(idx), 64, 64, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, b["images"]["agentview"])
    # JPEG is lossy but the fixture's marker must survive decode: bright
    # pixels exist where the background is dark noise (<60)
    assert img.max() > 150


def test_encoded_jpeg_augmented_batch(demo_h5_jpeg):
    """Augmented batches build from decoded JPEG frames (decode -> crop ->
    jitter), deterministically per seed."""
    store = HDF5DemoStore(demo_h5_jpeg, cameras=("agentview",),
                          image_size=48, crop_scale=(0.8, 1.0),
                          hflip_prob=0.5, jitter_prob=1.0)
    idx = np.arange(16)
    a = store.get_batch(idx, augment=True, seed=9)
    b = store.get_batch(idx, augment=True, seed=9)
    np.testing.assert_array_equal(a["images"]["agentview"],
                                  b["images"]["agentview"])
    assert a["images"]["agentview"].shape == (16, 48, 48, 3)


def test_vectorized_param_sampler_properties():
    """Counter-based batch sampler: deterministic in seeds, uniform-ish,
    parameters within their configured ranges (VERDICT r1 weak-4)."""
    seeds = np.arange(10_000, dtype=np.int64) * 7 + 3
    u = aug.hashed_uniforms(seeds, 4)
    np.testing.assert_array_equal(u, aug.hashed_uniforms(seeds, 4))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    # different seeds decorrelate columns
    assert abs(np.corrcoef(u[:, 0], u[:, 1])[0, 1]) < 0.05

    hs = np.full(len(seeds), 100, np.int64)
    ws = np.full(len(seeds), 80, np.int64)
    pb = aug.sample_aug_params_batch(
        hs, ws, seeds, crop_scale=(0.5, 1.0), hflip_prob=0.3,
        jitter_brightness=0.2, jitter_contrast=0.0, jitter_saturation=0.4,
        jitter_prob=0.5)
    ch, cw = pb["ch"], pb["cw"]
    assert ch.min() >= 1 and ch.max() <= 100
    assert cw.min() >= 1 and cw.max() <= 80
    np.testing.assert_array_equal(ch, cw)   # ratio (1,1) = square windows
    assert (pb["y0"] >= 0).all() and (pb["y0"] + ch <= 100).all()
    assert (pb["x0"] >= 0).all() and (pb["x0"] + cw <= 80).all()
    assert abs(pb["flip"].mean() - 0.3) < 0.02
    on = pb["brightness"] > 0
    assert abs(on.mean() - 0.5) < 0.02
    assert (pb["brightness"][on] >= 0.8 - 1e-6).all()
    assert (pb["brightness"][on] <= 1.2 + 1e-6).all()
    assert (pb["contrast"] == 0).all()      # disabled component stays 0
    sat_on = pb["saturation"] > 0
    np.testing.assert_array_equal(sat_on, on)   # one jitter on/off gate


def test_fixture_proprio_scale(tmp_path):
    """write_demo_fixture(proprio_scale=...): per-dim multiplier on the
    stored proprio only (labels untouched); proprio_stats() sees it."""
    import numpy as np

    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        HDF5DemoStore,
        write_demo_fixture,
    )

    scale = np.logspace(-1.0, 2.0, 8).astype(np.float32)
    a = str(tmp_path / "a.hdf5")
    b = str(tmp_path / "b.hdf5")
    write_demo_fixture(a, n_demos=2, steps=10, image_hw=32, proprio_dim=8,
                       cameras=("agentview",), seed=3)
    write_demo_fixture(b, n_demos=2, steps=10, image_hw=32, proprio_dim=8,
                       cameras=("agentview",), seed=3, proprio_scale=scale)
    sa = HDF5DemoStore(a, cameras=("agentview",), image_size=32)
    sb = HDF5DemoStore(b, cameras=("agentview",), image_size=32)
    idx = np.arange(4)
    ba, bb = sa.get_batch(idx), sb.get_batch(idx)
    np.testing.assert_allclose(bb["proprio"], ba["proprio"] * scale,
                               rtol=1e-6)
    np.testing.assert_allclose(bb["target_pos"], ba["target_pos"])
    ma, _ = sa.proprio_stats()
    mb, stdb = sb.proprio_stats()
    np.testing.assert_allclose(mb, ma * scale, rtol=1e-5, atol=1e-6)
    assert stdb[-1] > stdb[0] * 100  # the scale really is per-dim


# ---- multi-file datasets ---------------------------------------------------

def test_multi_file_dataset(tmp_path):
    """data.path as a glob / comma list: demos from every file concatenate
    into one dataset; batches match the per-file stores sample-for-sample;
    demo names are unique and file-qualified."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        expand_paths, write_demo_fixture,
    )

    a = write_demo_fixture(str(tmp_path / "lift.hdf5"), n_demos=2, steps=10,
                           image_hw=32, proprio_dim=8, seed=1)
    b = write_demo_fixture(str(tmp_path / "can.hdf5"), n_demos=3, steps=7,
                           image_hw=32, proprio_dim=8, seed=2)

    assert expand_paths(f"{a},{b}") == [a, b]
    assert expand_paths(str(tmp_path / "*.hdf5")) == [b, a]  # sorted: can<lift
    with pytest.raises(FileNotFoundError):
        expand_paths(str(tmp_path / "nope*.hdf5"))
    with pytest.raises(ValueError, match="more than once"):
        expand_paths(f"{a},{a}")
    # same file via a different spelling (resolved-path dedup)
    rel = os.path.join(str(tmp_path), "..", os.path.basename(str(tmp_path)),
                       "lift.hdf5")
    with pytest.raises(ValueError, match="more than once"):
        expand_paths(f"{a},{rel}")

    kw = dict(cameras=("agentview",), image_size=32,
              proprio_key="obs/robot0_proprio-state")
    multi = HDF5DemoStore(f"{a},{b}", **kw)
    sa, sb = HDF5DemoStore(a, **kw), HDF5DemoStore(b, **kw)
    assert len(multi) == len(sa) + len(sb) == 2 * 10 + 3 * 7
    assert multi._demo_keys == (
        [f"lift/demo_{i}" for i in range(2)]
        + [f"can/demo_{i}" for i in range(3)])

    # samples land at the concatenated offsets, identical content
    ba = sa.get_batch(np.arange(len(sa)), augment=False, seed=0)
    bb = sb.get_batch(np.arange(len(sb)), augment=False, seed=0)
    bm = multi.get_batch(np.arange(len(multi)), augment=False, seed=0)
    for k in ("target_pos", "target_quat", "proprio"):
        np.testing.assert_array_equal(
            bm[k], np.concatenate([ba[k], bb[k]]))
    np.testing.assert_array_equal(
        bm["images"]["agentview"],
        np.concatenate([ba["images"]["agentview"],
                        bb["images"]["agentview"]]))

    # uncached path (per-thread, per-file handles) reads the same bytes
    nocache = HDF5DemoStore(f"{a},{b}", cache_images=False, **kw)
    bn = nocache.get_batch(np.arange(0, len(multi), 3), augment=False, seed=0)
    np.testing.assert_array_equal(
        bn["images"]["agentview"],
        bm["images"]["agentview"][np.arange(0, len(multi), 3)])


def test_multi_file_split_and_stats(tmp_path):
    """Demo-granularity train/val split runs over the concatenated demo
    list (no leak, all demos covered), and proprio_stats/device-cache work
    through the multi-file path."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    a = write_demo_fixture(str(tmp_path / "a.hdf5"), n_demos=3, steps=6,
                           image_hw=24, proprio_dim=4, seed=3)
    b = write_demo_fixture(str(tmp_path / "b.hdf5"), n_demos=3, steps=6,
                           image_hw=24, proprio_dim=4, seed=4)
    kw = dict(cameras=("agentview",), image_size=24,
              proprio_key="obs/robot0_proprio-state")
    tr = HDF5DemoStore(f"{a},{b}", split="train", val_fraction=0.34, **kw)
    va = HDF5DemoStore(f"{a},{b}", split="val", val_fraction=0.34, **kw)
    assert sorted(tr._demo_keys + va._demo_keys) == sorted(
        [f"a/demo_{i}" for i in range(3)] + [f"b/demo_{i}" for i in range(3)])
    assert not (set(tr._demo_keys) & set(va._demo_keys))
    assert len(va._demo_keys) == 2  # round(6 * 0.34)

    mean, std = tr.proprio_stats()
    assert mean.shape == (4,) and np.all(std > 0)

    cache = tr.build_resized_cache(24)
    assert cache["agentview"].shape == (len(tr), 24, 24, 3)


def test_max_demos_and_multikey_proprio(tmp_path):
    """data.max_demos caps the concatenated demo list before splitting;
    data.proprio_key accepts a comma list of low-dim obs keys concatenated
    along the feature dim (robomimic idiom)."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    p = write_demo_fixture(str(tmp_path / "f.hdf5"), n_demos=4, steps=6,
                           image_hw=24, proprio_dim=6, seed=7)
    # add two extra low-dim keys per demo: one (T, 3), one 1-D (T,)
    with h5py.File(p, "r+") as f:
        for dk in f["data"]:
            t = f["data"][dk]["obs/robot0_proprio-state"].shape[0]
            f["data"][dk]["obs/eef_pos"] = np.arange(
                t * 3, dtype=np.float32).reshape(t, 3)
            f["data"][dk]["obs/gripper"] = np.full(t, 0.5, np.float32)

    kw = dict(cameras=("agentview",), image_size=24)
    capped = HDF5DemoStore(p, max_demos=2, **kw)
    assert capped._demo_keys == ["demo_0", "demo_1"]
    assert len(capped) == 2 * 6

    multi = HDF5DemoStore(
        p, proprio_key="obs/robot0_proprio-state,obs/eef_pos,obs/gripper",
        **kw)
    assert multi.proprio_dim == 6 + 3 + 1
    b = multi.get_batch(np.arange(6), augment=False, seed=0)
    single = HDF5DemoStore(p, **kw).get_batch(
        np.arange(6), augment=False, seed=0)
    np.testing.assert_array_equal(b["proprio"][:, :6], single["proprio"])
    np.testing.assert_array_equal(
        b["proprio"][:, 6:9],
        np.arange(18, dtype=np.float32).reshape(6, 3))
    np.testing.assert_array_equal(b["proprio"][:, 9], np.full(6, 0.5))

    # missing key in the comma list names the missing one
    with pytest.raises(KeyError, match="obs/nope"):
        HDF5DemoStore(p, proprio_key="obs/eef_pos,obs/nope", **kw)

    # max_demos applies before the split: train+val partition the cap
    tr = HDF5DemoStore(p, max_demos=3, split="train", val_fraction=0.34,
                       **kw)
    va = HDF5DemoStore(p, max_demos=3, split="val", val_fraction=0.34, **kw)
    assert sorted(tr._demo_keys + va._demo_keys) == [
        "demo_0", "demo_1", "demo_2"]


def test_filter_key(tmp_path):
    """data.filter_key: robomimic mask/<key> demo subsets, applied before
    max_demos and the split."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    p = write_demo_fixture(str(tmp_path / "f.hdf5"), n_demos=5, steps=4,
                           image_hw=24, proprio_dim=4, seed=9,
                           filter_keys={"train_40": [0, 2], "valid": [4]})
    kw = dict(cameras=("agentview",), image_size=24)
    st = HDF5DemoStore(p, filter_key="train_40", **kw)
    assert st._demo_keys == ["demo_0", "demo_2"]
    assert len(st) == 2 * 4
    b = st.get_batch(np.arange(4), augment=False, seed=0)
    assert b["images"]["agentview"].shape == (4, 24, 24, 3)

    assert HDF5DemoStore(p, filter_key="valid", **kw)._demo_keys == [
        "demo_4"]
    # filter_key composes with max_demos (filter first, then cap)
    assert HDF5DemoStore(p, filter_key="train_40", max_demos=1,
                         **kw)._demo_keys == ["demo_0"]

    with pytest.raises(KeyError, match="nope.*available filter keys"):
        HDF5DemoStore(p, filter_key="nope", **kw)

    # a file with no mask group names the problem too
    q = write_demo_fixture(str(tmp_path / "g.hdf5"), n_demos=2, steps=4,
                           image_hw=24, proprio_dim=4, seed=10)
    with pytest.raises(KeyError, match="mask/train_40"):
        HDF5DemoStore(q, filter_key="train_40", **kw)


def test_val_path_separate_heldout_file(tmp_path):
    """data.val_path: train on ALL of data.path, evaluate on ALL of a
    separate held-out file."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    a = write_demo_fixture(str(tmp_path / "train.hdf5"), n_demos=3,
                           steps=8, image_hw=24, proprio_dim=4, seed=1)
    b = write_demo_fixture(str(tmp_path / "heldout.hdf5"), n_demos=2,
                           steps=5, image_hw=24, proprio_dim=4, seed=2)
    cfg = Config(
        model=ModelConfig(backbone="cnn_small", image_size=24,
                          use_proprio=True, proprio_dim=4,
                          proprio_hidden=(8,), proprio_features=8,
                          image_features=8, head_hidden=(8,)),
        data=DataConfig(source="hdf5", path=a, val_path=b, batch_size=4,
                        augment=False, num_workers=0),
    )
    tr = build_dataset(cfg, split="train")
    va = build_dataset(cfg, split="val")
    assert len(tr) == 3 * 8          # the FULL training file
    assert len(va) == 2 * 5          # the FULL held-out file
    assert va._demo_keys == ["demo_0", "demo_1"]

    with pytest.raises(ValueError, match="mutually exclusive"):
        DataConfig(source="hdf5", path=a, val_path=b, val_fraction=0.2)
    with pytest.raises(ValueError, match="hdf5"):
        DataConfig(source="synthetic", val_path=b)


def test_val_path_e2e_fit_eval(tmp_path):
    """fit() with data.val_path runs its periodic eval on the held-out
    file, and evaluate(split='val') scores it from the checkpoint."""
    import rgb_proprioceptive_pose_estimator_tpu as rppe
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    a = write_demo_fixture(str(tmp_path / "train.hdf5"), n_demos=2,
                           steps=10, image_hw=32, proprio_dim=4, seed=3)
    b = write_demo_fixture(str(tmp_path / "heldout.hdf5"), n_demos=2,
                           steps=8, image_hw=32, proprio_dim=4, seed=4)
    cfg = rppe.preset("pr2").override(**{
        "model.image_size": 32, "model.image_features": 16,
        "model.head_hidden": [16],
        "data.path": a, "data.val_path": b, "data.batch_size": 8,
        "data.num_workers": 0,
        "train.steps": 10, "train.eval_every": 10, "train.eval_steps": 0,
        "train.ckpt_every": 10, "train.log_every": 10,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
    })
    out = rppe.train(cfg)
    assert np.isfinite(out["metrics"]["eval_pos_mae_cm"])
    ev = rppe.evaluate(cfg)          # auto -> val -> the held-out file
    np.testing.assert_allclose(ev["pos_mae_cm"],
                               out["metrics"]["eval_pos_mae_cm"], rtol=1e-5)
    rows = rppe.evaluate(cfg, per_demo=True)
    assert list(rows["per_demo"]) == ["demo_0", "demo_1"]  # held-out demos
    assert rows["per_demo"]["demo_0"]["steps"] == 8


def test_val_path_ignores_train_selectors(tmp_path):
    """Regression (code review r3): max_demos / filter_key are TRAIN-set
    selectors and must not truncate or gate the separate held-out file."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    a = write_demo_fixture(str(tmp_path / "train.hdf5"), n_demos=4,
                           steps=5, image_hw=24, proprio_dim=4, seed=5,
                           filter_keys={"good": [0, 1, 2]})
    b = write_demo_fixture(str(tmp_path / "heldout.hdf5"), n_demos=3,
                           steps=5, image_hw=24, proprio_dim=4, seed=6)
    cfg = Config(
        model=ModelConfig(backbone="cnn_small", image_size=24,
                          use_proprio=True, proprio_dim=4,
                          proprio_hidden=(8,), proprio_features=8,
                          image_features=8, head_hidden=(8,)),
        data=DataConfig(source="hdf5", path=a, val_path=b, batch_size=4,
                        max_demos=2, filter_key="good",
                        augment=False, num_workers=0),
    )
    tr = build_dataset(cfg, split="train")
    assert tr._demo_keys == ["demo_0", "demo_1"]  # filter then cap
    va = build_dataset(cfg, split="val")
    # the held-out file has no mask/good and MORE demos than max_demos:
    # neither selector applies -- ALL of val_path
    assert va._demo_keys == ["demo_0", "demo_1", "demo_2"]


def test_multikey_target(tmp_path):
    """data.target_key accepts a comma list (robomimic stores pos/quat
    separately): targets concatenate in order and match the single-key
    load; step-count mismatches across the parts raise loudly."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    p = write_demo_fixture(str(tmp_path / "t.hdf5"), n_demos=2, steps=6,
                           image_hw=24, proprio_dim=6, seed=3)
    # split obs/object's pose into separate pos/quat keys
    with h5py.File(p, "r+") as f:
        for dk in f["data"]:
            obj = np.asarray(f["data"][dk]["obs/object"])
            f["data"][dk]["obs/cube_pos"] = obj[:, :3]
            f["data"][dk]["obs/cube_quat"] = obj[:, 3:7]

    kw = dict(cameras=("agentview",), image_size=24)
    single = HDF5DemoStore(p, **kw)
    multi = HDF5DemoStore(p, target_key="obs/cube_pos,obs/cube_quat", **kw)
    bs = single.get_batch(np.arange(12), augment=False, seed=0)
    bm = multi.get_batch(np.arange(12), augment=False, seed=0)
    np.testing.assert_array_equal(bm["target_pos"], bs["target_pos"])
    np.testing.assert_array_equal(bm["target_quat"], bs["target_quat"])

    with pytest.raises(KeyError, match="obs/cube_nope"):
        HDF5DemoStore(p, target_key="obs/cube_pos,obs/cube_nope", **kw)

    # step-count mismatch across target parts is a loud error
    with h5py.File(p, "r+") as f:
        for dk in f["data"]:
            f["data"][dk]["obs/cube_pos_short"] = np.zeros(
                (3, 3), np.float32)
    with pytest.raises(ValueError, match="disagree on"):
        HDF5DemoStore(p, target_key="obs/cube_pos_short,obs/cube_quat",
                      **kw)


def test_fixture_label_outliers_corrupt_labels_not_pixels(tmp_path):
    """label_outlier_frac replaces ~that fraction of stored position
    labels AFTER rendering: a clean same-seed twin has bit-identical
    images/proprio/quats, and only position labels differ."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    kw = dict(n_demos=3, steps=40, cameras=("agentview",), image_hw=48,
              proprio_dim=8, seed=7)
    clean = write_demo_fixture(str(tmp_path / "clean.hdf5"), **kw)
    dirty = write_demo_fixture(str(tmp_path / "dirty.hdf5"),
                               label_outlier_frac=0.25, **kw)

    n_bad = n_total = 0
    with h5py.File(clean) as fc, h5py.File(dirty) as fd:
        for d in ("demo_0", "demo_1", "demo_2"):
            oc = fc[f"data/{d}/obs"]
            od = fd[f"data/{d}/obs"]
            np.testing.assert_array_equal(oc["agentview_image"][:],
                                          od["agentview_image"][:])
            np.testing.assert_array_equal(oc["robot0_proprio-state"][:],
                                          od["robot0_proprio-state"][:])
            np.testing.assert_array_equal(oc["object"][:, 3:7],
                                          od["object"][:, 3:7])
            diff = np.any(oc["object"][:, :3] != od["object"][:, :3],
                          axis=-1)
            n_bad += int(diff.sum())
            n_total += diff.size
    assert 0.10 <= n_bad / n_total <= 0.45   # ~0.25, binomial slack


def test_target_lookahead_shifts_labels(demo_h5):
    """data.target_lookahead=K: label[t] = pose[t+K] within the demo; the
    last K steps carry no sample (every label exists); images/proprio stay
    at time t."""
    import h5py

    k = 3
    base = HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                         proprio_key="obs/robot0_proprio-state")
    store = HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                          proprio_key="obs/robot0_proprio-state",
                          target_lookahead=k)
    # 3 demos x 20 steps; K excluded per demo
    assert len(base) == 60 and len(store) == 3 * (20 - k)

    with h5py.File(demo_h5) as f:
        obj0 = np.asarray(f["data/demo_0/obs/object"])
    idx = np.arange(5)                   # (demo_0, t=0..4)
    b = store.get_batch(idx, augment=False, seed=0)
    bb = base.get_batch(idx, augment=False, seed=0)
    # labels come from t+K...
    np.testing.assert_allclose(b["target_pos"], obj0[k:k + 5, :3],
                               atol=1e-6)
    # ...while the observation side is unchanged (same frames/proprio)
    np.testing.assert_array_equal(b["images"]["agentview"],
                                  bb["images"]["agentview"])
    np.testing.assert_allclose(b["proprio"], bb["proprio"], atol=1e-6)

    # temporal windows compose with lookahead: window ends at t, label at
    # t+K; the last in-range sample of demo_0 is t = 19 - K
    store_t = HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                            proprio_key="obs/robot0_proprio-state",
                            temporal_frames=2, target_lookahead=k)
    last = 20 - k - 1
    bt = store_t.get_batch(np.array([last]), augment=False, seed=0)
    np.testing.assert_allclose(bt["target_pos"][0], obj0[last + k, :3],
                               atol=1e-6)
    assert bt["images"]["agentview"].shape == (1, 2, 64, 64, 3)


def test_target_lookahead_exhausting_demos_is_clear_error(demo_h5):
    """target_lookahead >= every demo's length leaves zero samples; that
    must be a ValueError naming the knob and the demo lengths, not a
    cryptic 1-D-index crash later (ADVICE r4)."""
    with pytest.raises(ValueError, match="target_lookahead=20 leaves zero"):
        HDF5DemoStore(demo_h5, cameras=("agentview",), image_size=64,
                      proprio_key="obs/robot0_proprio-state",
                      target_lookahead=20)   # demos are 20 steps each


def test_target_lookahead_config_plumbing(demo_h5):
    """build_dataset plumbs data.target_lookahead; synthetic rejects it."""
    cfg = Config(
        model=ModelConfig(backbone="cnn_small", image_size=64,
                          cameras=("agentview",), use_proprio=False,
                          image_features=32, head_hidden=(32,)),
        data=DataConfig(source="hdf5", path=demo_h5, target_lookahead=2),
    )
    ds = build_dataset(cfg)
    assert len(ds) == 3 * 18
    with pytest.raises(ValueError, match="hdf5 source only"):
        Config(data=DataConfig(source="synthetic", target_lookahead=2))
    with pytest.raises(ValueError, match=">= 0"):
        Config(data=DataConfig(source="hdf5", path="x", target_lookahead=-1))
