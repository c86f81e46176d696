"""Offline dataset repack (data/repack.py, `cli repack`): pixel parity
with the runtime resize path, verbatim copy of everything else, and the
CLI driver."""

import json

import h5py
import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.cli import main as cli_main
from rgb_proprioceptive_pose_estimator_tpu.data import augment as aug
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
    HDF5DemoStore,
    write_demo_fixture,
)
from rgb_proprioceptive_pose_estimator_tpu.data.repack import repack_file


def _store(path, size, cameras=("agentview",)):
    return HDF5DemoStore(path, cameras=cameras, image_size=size)


def test_repack_matches_runtime_resize(tmp_path):
    """A file repacked at size S must produce the byte-identical device
    cache the original produces at runtime (the whole point: the runtime
    resize becomes a no-op read)."""
    src = str(tmp_path / "src.hdf5")
    out = str(tmp_path / "out.hdf5")
    write_demo_fixture(src, n_demos=3, steps=10, image_hw=48)
    r = repack_file(src, out, cameras=("agentview",), size=32)
    assert r["demos"] == 3 and r["frames"] == 30

    cache_src = _store(src, 32).build_resized_cache(32)
    cache_out = _store(out, 32).build_resized_cache(32)
    np.testing.assert_array_equal(cache_src["agentview"],
                                  cache_out["agentview"])


def test_repack_copies_everything_else(tmp_path):
    """Proprio / target / unconfigured-camera datasets, mask filter keys,
    and attrs survive verbatim."""
    src = str(tmp_path / "src.hdf5")
    out = str(tmp_path / "out.hdf5")
    write_demo_fixture(src, n_demos=2, steps=6, image_hw=40,
                       filter_keys={"extra": [0]})
    with h5py.File(src, "a") as f:
        f["data/demo_0"].attrs["num_samples"] = 6
        f["data"].attrs["env"] = "fixture"
        f["data/demo_0/obs/agentview_image"].attrs["camera_fov"] = 45.0
        f.create_group("env_metadata").create_dataset(
            "timestep", data=np.float64(0.02))

    repack_file(src, out, cameras=("agentview",), size=32)
    with h5py.File(src) as a, h5py.File(out) as b:
        np.testing.assert_array_equal(
            a["data/demo_0/obs/robot0_proprio-state"][...],
            b["data/demo_0/obs/robot0_proprio-state"][...])
        np.testing.assert_array_equal(a["data/demo_0/obs/object"][...],
                                      b["data/demo_0/obs/object"][...])
        # the unconfigured second camera copies through untouched
        np.testing.assert_array_equal(
            a["data/demo_0/obs/robot0_eye_in_hand_image"][...],
            b["data/demo_0/obs/robot0_eye_in_hand_image"][...])
        assert b["data"].attrs["env"] == "fixture"
        assert b["data/demo_0"].attrs["num_samples"] == 6
        assert list(np.asarray(b["mask/extra"])) == [b"demo_0"]
        # dataset-level attrs survive the re-encode; extra top-level
        # groups copy through (the output is a complete dataset)
        assert (b["data/demo_0/obs/agentview_image"].attrs["camera_fov"]
                == 45.0)
        assert float(b["env_metadata/timestep"][()]) == 0.02


def test_repack_jpeg_roundtrip_trains(tmp_path):
    """jpeg repack yields vlen datasets the store decodes; sizes shrink."""
    src = str(tmp_path / "src.hdf5")
    out = str(tmp_path / "out.hdf5")
    write_demo_fixture(src, n_demos=2, steps=8, image_hw=64)
    r = repack_file(src, out, cameras=("agentview",
                                       "robot0_eye_in_hand"), size=32,
                    encode="jpeg")
    with h5py.File(out) as f:
        ds = f["data/demo_0/obs/agentview_image"]
        assert h5py.check_vlen_dtype(ds.dtype) is not None
    st = _store(out, 32, cameras=("agentview", "robot0_eye_in_hand"))
    batch = st.get_batch(np.arange(4), augment=False, seed=0)
    assert batch["images"]["agentview"].shape == (4, 32, 32, 3)
    assert r["bytes_out"] < r["bytes_in"]


def test_repack_from_encoded_source(tmp_path):
    """vlen (jpeg) source frames decode before the resize."""
    src = str(tmp_path / "src.hdf5")
    enc = str(tmp_path / "enc.hdf5")
    out = str(tmp_path / "out.hdf5")
    write_demo_fixture(src, n_demos=2, steps=6, image_hw=48)
    # build an encoded-source file via a png repack at native size
    repack_file(src, enc, cameras=("agentview",), size=48, encode="png")
    repack_file(enc, out, cameras=("agentview",), size=32)
    # png is lossless, so this equals repacking the original directly
    direct = str(tmp_path / "direct.hdf5")
    repack_file(src, direct, cameras=("agentview",), size=32)
    with h5py.File(out) as a, h5py.File(direct) as b:
        np.testing.assert_array_equal(
            a["data/demo_0/obs/agentview_image"][...],
            b["data/demo_0/obs/agentview_image"][...])


def test_repack_max_demos_and_errors(tmp_path):
    src = str(tmp_path / "src.hdf5")
    out = str(tmp_path / "out.hdf5")
    write_demo_fixture(src, n_demos=3, steps=6, image_hw=40)
    r = repack_file(src, out, cameras=("agentview",), size=32,
                    max_demos=2)
    assert r["demos"] == 2
    with pytest.raises(ValueError, match="raw|jpeg|png"):
        repack_file(src, out, cameras=("agentview",), size=32,
                    encode="webp")
    # atomicity: a failed repack must not leave out.tmp or clobber out
    import os

    with pytest.raises(ValueError):
        repack_file(src, str(tmp_path / "bad.hdf5"),
                    cameras=("agentview",), size=-3)
    assert not os.path.exists(str(tmp_path / "bad.hdf5.tmp"))
    assert not os.path.exists(str(tmp_path / "bad.hdf5"))


def test_cli_repack(tmp_path, capsys):
    src = str(tmp_path / "src.hdf5")
    out = str(tmp_path / "out.hdf5")
    write_demo_fixture(src, n_demos=2, steps=6, image_hw=64)
    rc = cli_main(["repack", "--preset", "pr2", "--src", src,
                   "--out", out, "--encode", "jpeg",
                   "--set", "model.image_size=32"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["demos"] == 2 and summary["size"] == 32
    assert "data.path=" in summary["next"]
    with h5py.File(out) as f:
        assert "agentview_image" in f["data/demo_0/obs"]
