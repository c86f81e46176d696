"""State-playback ingestion tests (data/playback.py): robosuite-layout
`states` demos re-rendered through MuJoCo offscreen EGL into the
robomimic layout the rest of the framework consumes.

Rendering tests carry @needs_egl and skip where headless GL is
unavailable (they need an EGL-capable libGL; this CI image has software
mesa); the metadata-only inspect test always runs."""

import os

import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe


def _egl_available() -> bool:
    # probe in a CHILD process, like the converter itself renders
    # (playback.py isolate=True): the pytest process must never host GL
    # next to XLA (see render_playback_dataset's isolate doc)
    import subprocess
    import sys

    # reuse the converter's own GL env setup (_import_mujoco) so this
    # probe can't drift from what render_playback_dataset actually does
    code = (
        "from rgb_proprioceptive_pose_estimator_tpu.data.playback "
        "import _import_mujoco;"
        "mujoco=_import_mujoco();"
        "m=mujoco.MjModel.from_xml_string(\"<mujoco><worldbody>"
        "<geom type='sphere' size='.1'/></worldbody></mujoco>\");"
        "mujoco.Renderer(m,16,16).close()")
    env = dict(os.environ)
    env["_RPPE_RENDER_WORKER"] = "1"   # jax-free child, like the converter
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(
        rppe.__file__)))
    prev = env.get("PYTHONPATH")
    env["PYTHONPATH"] = pkg_root + (os.pathsep + prev if prev else "")
    try:
        return subprocess.run([sys.executable, "-c", code],
                              capture_output=True, env=env,
                              timeout=180).returncode == 0
    except Exception:
        return False


needs_egl = pytest.mark.skipif(
    not _egl_available(), reason="no headless MuJoCo GL (EGL) available")


@pytest.fixture(scope="module")
def rendered(tmp_path_factory):
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_states_fixture,
    )

    d = tmp_path_factory.mktemp("playback")
    src = write_states_fixture(str(d / "states.hdf5"), n_demos=3, steps=14)
    out = str(d / "rendered.hdf5")
    summary = render_playback_dataset(
        src, out, cameras=("agentview", "sideview"), image_hw=64,
        target_body="cube")
    return src, out, summary


@needs_egl
def test_converter_layout_and_label_consistency(rendered):
    """The rendered file is robomimic-layout; the object pose equals the
    cube's free-joint state (up to quaternion sign); proprio excludes
    every target-body dof (no label leak)."""
    import h5py

    src, out, summary = rendered
    assert summary == {"demos": 3, "frames": 42, "cameras": 2,
                       "image_hw": 64}
    with h5py.File(src) as fs, h5py.File(out) as fo:
        for dk in ("demo_0", "demo_1", "demo_2"):
            g = fo[f"data/{dk}/obs"]
            states = fs[f"data/{dk}/states"][:]
            assert g["agentview_image"].shape == (14, 64, 64, 3)
            assert g["agentview_image"].dtype == np.uint8
            # arm joints only: 2 qpos + 2 qvel (cube's 7+6 excluded)
            assert g["qpos"].shape == (14, 2)
            assert g["qvel"].shape == (14, 2)
            np.testing.assert_allclose(g["qpos"][:], states[:, 1:3],
                                       atol=1e-6)
            # object = cube free-joint state ([time, arm(2), pos(3),
            # quat(4), qvel...] flattening in write_states_fixture)
            np.testing.assert_allclose(g["object"][:, :3],
                                       states[:, 3:6], atol=1e-6)
            q, qs = g["object"][:, 3:], states[:, 6:10]
            sign = np.sign((q * qs).sum(-1, keepdims=True))
            np.testing.assert_allclose(q, sign * qs, atol=1e-5)
            assert fo[f"data/{dk}"].attrs["num_samples"] == 14


@needs_egl
def test_rendered_images_track_the_cube(rendered):
    """The render is informative: the cube's red pixels move with its
    position across frames (not a constant splat)."""
    import h5py

    _, out, _ = rendered
    with h5py.File(out) as f:
        imgs = f["data/demo_0/obs/agentview_image"][:]
    red = (imgs[:, :, :, 0].astype(np.int32)
           - imgs[:, :, :, 2].astype(np.int32)) > 60
    counts = red.reshape(len(imgs), -1).sum(-1)
    assert (counts > 10).all(), counts          # cube visible every frame
    centers = np.array([np.argwhere(r).mean(0) for r in red])
    spread = centers.std(0)
    assert spread.max() > 1.0, spread           # and it moves

    # determinism: re-rendering the same states gives the same pixels
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_states_fixture,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        src2 = write_states_fixture(os.path.join(d, "s.hdf5"),
                                    n_demos=1, steps=5)
        a = os.path.join(d, "a.hdf5")
        b = os.path.join(d, "b.hdf5")
        render_playback_dataset(src2, a, cameras=("agentview",),
                                image_hw=48, target_body="cube")
        render_playback_dataset(src2, b, cameras=("agentview",),
                                image_hw=48, target_body="cube")
        with h5py.File(a) as fa, h5py.File(b) as fb:
            np.testing.assert_array_equal(
                fa["data/demo_0/obs/agentview_image"][:],
                fb["data/demo_0/obs/agentview_image"][:])


@needs_egl
def test_rendered_file_feeds_the_standard_pipeline(rendered, tmp_path):
    """The materialized file trains through the UNCHANGED pipeline (C1):
    HDF5DemoStore + HostPipeline + fit with multi-key proprio, and the
    image path learns the cube position from the rendered pixels."""
    _, out, _ = rendered
    cfg = rppe.preset("pr2").override(**{
        "model.backbone": "cnn_small",
        "model.image_size": 64,
        "model.image_features": 48,
        "model.head_hidden": [48],
        "model.proprio_dim": 4,          # qpos(2) + qvel(2)
        "model.proprio_hidden": [16],
        "model.proprio_features": 8,
        "data.path": out,
        "data.proprio_key": "obs/qpos,obs/qvel",
        "data.target_key": "obs/object",
        "data.batch_size": 16,
        "data.num_workers": 0,
        "data.jitter_prob": 0.0,
        "train.steps": 120,
        "train.lr": 3e-3,
        "train.eval_every": 120,
        "train.eval_steps": 2,
        "train.ckpt_every": 120,
        "train.log_every": 60,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
    })
    result = rppe.train(cfg)
    m = result["metrics"]
    # untrained pos_loss on this fixture is ~0.03 (cube wanders +-0.25 m);
    # the rendered cube is plainly visible, so it must collapse
    assert m["pos_loss"] < 8e-3, m
    assert np.isfinite(m["eval_rot_mae_deg"])


@needs_egl
def test_errors_are_loud(tmp_path):
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        split_state,
        write_states_fixture,
    )

    src = write_states_fixture(str(tmp_path / "s.hdf5"), n_demos=1,
                               steps=4)
    with pytest.raises(ValueError, match="not in model"):
        render_playback_dataset(src, str(tmp_path / "o1.hdf5"),
                                cameras=("agentview",), image_hw=32,
                                target_body="nope")
    with pytest.raises(ValueError, match="camera"):
        render_playback_dataset(src, str(tmp_path / "o2.hdf5"),
                                cameras=("nocam",), image_hw=32,
                                target_body="cube")
    with pytest.raises(ValueError, match="state width"):
        split_state(np.zeros(5), nq=9, nv=8)


def test_inspect_detects_states_only_files(tmp_path, capsys):
    """cli inspect on a states-only file counts its steps and points the
    user at cli render. Metadata + pure-numpy fixture writing only, so
    this one runs even where EGL rendering is unavailable."""
    import json

    from rgb_proprioceptive_pose_estimator_tpu.cli import main
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        write_states_fixture,
    )

    src = write_states_fixture(str(tmp_path / "s.hdf5"), n_demos=2,
                               steps=9)
    assert main(["inspect", "--preset", "pr2",
                 "--set", f"data.path={src}"]) == 0
    rep = json.loads(capsys.readouterr().out)
    row = rep["files"][0]
    assert row["states_only_demos"] == 2
    assert "cli render" in row["hint"]
    assert rep["steps_total"] == 18
    # target candidates enumerated from the embedded MJCF (model load
    # only, no GL)
    assert row["target_body_candidates (free bodies)"] == ["cube"]
    assert row["target_site_candidates"] == ["grip"]
    assert row["cameras_in_model (model.cameras)"] == [
        "agentview", "sideview"]


@needs_egl
def test_max_demos_natural_order_and_no_partial_output(tmp_path):
    """max_demos takes the first N demos in NATURAL order (demo_2 before
    demo_10, matching HDF5DemoStore); a mid-conversion error removes the
    partial output instead of leaving a truncated dataset that
    existence-caching callers would silently train on."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_states_fixture,
    )

    src = write_states_fixture(str(tmp_path / "s.hdf5"), n_demos=11,
                               steps=3)
    out = str(tmp_path / "o.hdf5")
    render_playback_dataset(src, out, cameras=("agentview",),
                            image_hw=32, target_body="cube",
                            max_demos=3)
    with h5py.File(out) as f:
        assert sorted(f["data"].keys()) == ["demo_0", "demo_1", "demo_2"]

    # corrupt a later demo: too-narrow states must abort AND clean up
    bad_src = str(tmp_path / "bad.hdf5")
    write_states_fixture(bad_src, n_demos=3, steps=3)
    with h5py.File(bad_src, "r+") as f:
        states = f["data/demo_1/states"][:]
        del f["data/demo_1/states"]
        f["data/demo_1/states"] = states[:, :4]   # < nq+nv: loud error
    out2 = str(tmp_path / "o2.hdf5")
    with pytest.raises(ValueError, match="state width"):
        render_playback_dataset(bad_src, out2, cameras=("agentview",),
                                image_hw=32, target_body="cube")
    assert not os.path.exists(out2)
    assert not os.path.exists(out2 + ".tmp")


@needs_egl
def test_cli_render_multi_file(tmp_path, capsys):
    """--src accepts comma lists / globs: each source file renders to
    <out-dir>/<stem>_rendered.hdf5 and the summary's `next` line carries
    the comma list data.path trains from."""
    import json

    from rgb_proprioceptive_pose_estimator_tpu.cli import main
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        write_states_fixture,
    )

    write_states_fixture(str(tmp_path / "sess_a.hdf5"), n_demos=2, steps=3)
    write_states_fixture(str(tmp_path / "sess_b.hdf5"), n_demos=1, steps=4,
                         seed=5)
    out_dir = str(tmp_path / "rendered")
    assert main(["render", "--preset", "pr2",
                 "--src", f"{tmp_path}/sess_*.hdf5",
                 "--out", out_dir,
                 "--set", "model.image_size=32",
                 "--target-body", "cube"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["files"] == 2 and rep["demos"] == 3 and rep["frames"] == 10
    assert [os.path.basename(p) for p in rep["out"]] == [
        "sess_a_rendered.hdf5", "sess_b_rendered.hdf5"]

    # the suggested comma list feeds the multi-file dataset reader
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        HDF5DemoStore,
    )

    store = HDF5DemoStore(",".join(rep["out"]),
                          proprio_key="obs/qpos,obs/qvel",
                          target_key="obs/object", cameras=("agentview",),
                          image_size=32)
    assert len(store) == 10


@needs_egl
def test_model_xml_override_for_files_without_model_attr(tmp_path):
    """Demo files that reference an external model (no model_file attr)
    render via the explicit model_xml= argument; without it the error is
    loud and names the fix."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        _FIXTURE_XML,
        render_playback_dataset,
        write_states_fixture,
    )

    src = str(tmp_path / "s.hdf5")
    write_states_fixture(src, n_demos=1, steps=3)
    with h5py.File(src, "r+") as f:
        del f["data"].attrs["model_file"]

    with pytest.raises(ValueError, match="model_xml"):
        render_playback_dataset(src, str(tmp_path / "o.hdf5"),
                                cameras=("agentview",), image_hw=32,
                                target_body="cube")

    out = str(tmp_path / "o.hdf5")
    s = render_playback_dataset(src, out, cameras=("agentview",),
                                image_hw=32, target_body="cube",
                                model_xml=_FIXTURE_XML)
    assert s["demos"] == 1 and s["frames"] == 3


@needs_egl
def test_site_target_for_eef_pose(tmp_path):
    """target_site renders an end-effector-style pose target (SURVEY.md
    section 1.3: 'object or end-effector pose'): the grip site's world
    position is the arm body's frame plus the site offset, and the
    site's parent-body dofs are excluded from proprio."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_states_fixture,
    )

    src = write_states_fixture(str(tmp_path / "s.hdf5"), n_demos=1,
                               steps=6)
    out = str(tmp_path / "o.hdf5")
    render_playback_dataset(src, out, cameras=("agentview",),
                            image_hw=32, target_site="grip")
    with h5py.File(src) as fs, h5py.File(out) as fo:
        states = fs["data/demo_0/states"][:]
        g = fo["data/demo_0/obs"]
        # arm slides move in x/y; site offset is +0.22 z above the arm
        # body origin (0, 0, 0.3)
        np.testing.assert_allclose(g["object"][:, :2], states[:, 1:3],
                                   atol=1e-6)
        np.testing.assert_allclose(g["object"][:, 2], 0.52, atol=1e-6)
        # identity orientation (slide joints cannot rotate the site)
        np.testing.assert_allclose(np.abs(g["object"][:, 3]), 1.0,
                                   atol=1e-6)
        # proprio excludes the ARM joints now (site's parent body), so
        # only the cube's free joint remains
        assert g["qpos"].shape == (6, 7)
        assert g["qvel"].shape == (6, 6)

    with pytest.raises(ValueError, match="site"):
        render_playback_dataset(src, str(tmp_path / "o2.hdf5"),
                                cameras=("agentview",), image_hw=32,
                                target_site="nope")


@needs_egl
def test_jpeg_encoded_render_roundtrips(tmp_path):
    """encoding='jpeg' writes per-frame vlen bytes the store decodes;
    pixels match the raw render to JPEG tolerance and the file shrinks."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        HDF5DemoStore,
    )
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_states_fixture,
    )

    src = write_states_fixture(str(tmp_path / "s.hdf5"), n_demos=1,
                               steps=6)
    raw = str(tmp_path / "raw.hdf5")
    jpg = str(tmp_path / "jpg.hdf5")
    render_playback_dataset(src, raw, cameras=("agentview",),
                            image_hw=64, target_body="cube")
    render_playback_dataset(src, jpg, cameras=("agentview",),
                            image_hw=64, target_body="cube",
                            encoding="jpeg")
    with h5py.File(jpg) as f:
        ds = f["data/demo_0/obs/agentview_image"]
        assert h5py.check_vlen_dtype(ds.dtype) is not None

    kw = dict(proprio_key="obs/qpos,obs/qvel", target_key="obs/object",
              cameras=("agentview",), image_size=64)
    a = HDF5DemoStore(raw, **kw).get_batch(np.arange(6), augment=False,
                                           seed=0)
    b = HDF5DemoStore(jpg, **kw).get_batch(np.arange(6), augment=False,
                                           seed=0)
    diff = np.abs(a["images"]["agentview"].astype(np.int16)
                  - b["images"]["agentview"].astype(np.int16))
    assert diff.mean() < 3.0, diff.mean()     # JPEG tolerance
    np.testing.assert_allclose(a["target_pos"], b["target_pos"])

    with pytest.raises(ValueError, match="encoding"):
        render_playback_dataset(src, str(tmp_path / "x.hdf5"),
                                cameras=("agentview",), image_hw=32,
                                target_body="cube", encoding="webp")


@needs_egl
def test_worldbody_target_and_src_typo_are_loud(tmp_path, capsys):
    """A worldbody-attached target is constant (not learnable) and the
    descendant walk would strip every dof -- loud error instead; a
    typo'd --src token fails before any rendering."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.cli import main
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_states_fixture,
    )

    src = write_states_fixture(str(tmp_path / "s.hdf5"), n_demos=1,
                               steps=3)
    # put a worldbody site into the embedded MJCF
    with h5py.File(src, "r+") as f:
        xml = f["data"].attrs["model_file"]
        xml = xml.replace("<camera name=\"agentview\"",
                          "<site name=\"worldmark\" size=\".01\"/>"
                          "<camera name=\"agentview\"")
        f["data"].attrs["model_file"] = xml
    with pytest.raises(ValueError, match="worldbody"):
        render_playback_dataset(src, str(tmp_path / "o.hdf5"),
                                cameras=("agentview",), image_hw=32,
                                target_site="worldmark")

    with pytest.raises(SystemExit, match="not found"):
        main(["render", "--preset", "pr2",
              "--src", f"{src},{tmp_path}/typo.hdf5",
              "--out", str(tmp_path / "d")])
    capsys.readouterr()


@needs_egl
def test_multi_file_same_stem_no_overwrite(tmp_path, capsys):
    """Same-named source files in different directories render to
    distinct outputs instead of silently overwriting each other."""
    import json

    from rgb_proprioceptive_pose_estimator_tpu.cli import main
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        write_states_fixture,
    )

    for sub, demos in (("runA", 2), ("runB", 1)):
        os.makedirs(tmp_path / sub)
        write_states_fixture(str(tmp_path / sub / "sess.hdf5"),
                             n_demos=demos, steps=3, seed=demos)
    out_dir = str(tmp_path / "rendered")
    assert main(["render", "--preset", "pr2",
                 "--src", f"{tmp_path}/runA/sess.hdf5,"
                          f"{tmp_path}/runB/sess.hdf5",
                 "--out", out_dir,
                 "--set", "model.image_size=32"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert len(set(rep["out"])) == 2 and rep["demos"] == 3
    for p in rep["out"]:
        assert os.path.isfile(p)

    # directory mode is sticky: a later single-source render pointed at
    # the same --out directory lands INSIDE it, not on top of it
    assert main(["render", "--preset", "pr2",
                 "--src", f"{tmp_path}/runA/sess.hdf5",
                 "--out", out_dir,
                 "--set", "model.image_size=32"]) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert os.path.dirname(rep2["out"]) == out_dir


# ---- flagship-shape fixture (VERDICT r3 next-4) -----------------------------


@pytest.fixture(scope="module")
def flagship_rendered(tmp_path_factory):
    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        render_playback_dataset,
        write_flagship_states_fixture,
    )

    d = tmp_path_factory.mktemp("flagship")
    src = write_flagship_states_fixture(str(d / "states.hdf5"),
                                        n_demos=10, steps=12, seed=3)
    out = str(d / "rendered.hdf5")
    summary = render_playback_dataset(
        src, out, cameras=("agentview", "robot0_eye_in_hand"),
        image_hw=96, target_body="cube")
    return src, out, summary


def _cube_pixels(img):
    """Count the cube body's saturated-orange pixels (nothing else in the
    flagship scene shares that color)."""
    r = img[..., 0].astype(int)
    g = img[..., 1].astype(int)
    b = img[..., 2].astype(int)
    return int(((r > 150) & (g < 120) & (b < 90)).sum())


@needs_egl
def test_flagship_layout_and_proprio_masking(flagship_rendered):
    """pr5-shaped rendered data: both preset cameras, arm-only proprio
    (the free cube's 7+6 dofs are the label and must be excluded), unit
    quaternions."""
    import h5py

    _, out, summary = flagship_rendered
    assert summary == {"demos": 10, "frames": 120, "cameras": 2,
                       "image_hw": 96}
    with h5py.File(out) as f:
        g = f["data/demo_0/obs"]
        assert g["agentview_image"].shape == (12, 96, 96, 3)
        assert g["robot0_eye_in_hand_image"].shape == (12, 96, 96, 3)
        assert g["qpos"].shape == (12, 4) and g["qvel"].shape == (12, 4)
        obj = np.asarray(g["object"])
        np.testing.assert_allclose(np.linalg.norm(obj[:, 3:], axis=1), 1.0,
                                   atol=1e-5)


@needs_egl
def test_flagship_physical_occlusion_asymmetry(flagship_rendered):
    """The occluder wall blinds the agentview on a substantial fraction
    of frames while the wrist camera (servoing with the arm) still sees
    the cube -- the PHYSICAL per-camera occlusion that makes dual-camera
    fusion necessary on this data (measured at scene-design time: ~41%
    agentview-blind, ~93% wrist-visible, ~0% both-blind)."""
    import h5py

    _, out, _ = flagship_rendered
    rows = []
    with h5py.File(out) as f:
        for dk in f["data"]:
            g = f[f"data/{dk}/obs"]
            av = np.asarray(g["agentview_image"])
            wr = np.asarray(g["robot0_eye_in_hand_image"])
            for t in range(av.shape[0]):
                rows.append((_cube_pixels(av[t]), _cube_pixels(wr[t])))
    n = len(rows)
    av_blind = [r for r in rows if r[0] <= 12]
    wr_sees = sum(1 for r in rows if r[1] > 12)
    assert len(av_blind) >= 0.15 * n, (
        f"occluder ineffective: only {len(av_blind)}/{n} agentview-blind")
    assert len(av_blind) <= 0.75 * n, "agentview nearly always blind"
    assert wr_sees >= 0.6 * n, f"wrist tracking too weak: {wr_sees}/{n}"
    # the dual-cam payoff: the wrist covers most agentview-blind frames
    covered = sum(1 for r in av_blind if r[1] > 12)
    assert covered >= 0.5 * len(av_blind)


def test_flagship_states_velocity_and_tracking(tmp_path):
    """No GL needed: per-episode cube velocity is constant between
    bounces (future-pose labels are single-frame-ambiguous -> temporal
    context has signal) and the arm's base yaw tracks the cube laterally
    (proprio correlates with the label without copying it)."""
    import h5py

    from rgb_proprioceptive_pose_estimator_tpu.data.playback import (
        write_flagship_states_fixture,
    )

    src = write_flagship_states_fixture(str(tmp_path / "s.hdf5"),
                                        n_demos=6, steps=20, seed=0)
    yaws, cube_ys = [], []
    with h5py.File(src) as f:
        for dk in f["data"]:
            st = np.asarray(f[f"data/{dk}/states"])
            pos = st[:, 5:8]                     # cube qpos
            d = np.diff(pos, axis=0)
            speeds = np.linalg.norm(d, axis=1)
            # most consecutive steps keep the same direction (no bounce)
            cosims = (d[1:] * d[:-1]).sum(1) / (
                np.linalg.norm(d[1:], axis=1) * np.linalg.norm(d[:-1], axis=1))
            assert (cosims > 0.99).mean() > 0.5
            # constant speed between bounces (a bounce step is shortened
            # by the wall clip, so test that the vast majority of steps
            # move at exactly the episode's one speed)
            med = np.median(speeds)
            assert (np.abs(speeds - med) < 0.01 * med).mean() > 0.7
            yaws.extend(st[:, 1])                # j1 base yaw
            cube_ys.extend(pos[:, 1])
    corr = np.corrcoef(yaws, cube_ys)[0, 1]
    assert abs(corr) > 0.3, f"arm does not track the cube (corr={corr:.2f})"
