"""Train/val splits, LSTM temporal variant, torch weight import."""

import jax
import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
)
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import HDF5DemoStore
from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import build_dataset
from rgb_proprioceptive_pose_estimator_tpu.data.synthetic import (
    SyntheticProprioDataset,
)
from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
    build_model,
    example_batch,
)
from rgb_proprioceptive_pose_estimator_tpu.utils.torch_import import (
    import_torch_resnet,
    load_pretrained_backbone,
)


# ---- splits -----------------------------------------------------------------

def test_synthetic_split_partition():
    full = SyntheticProprioDataset(size=100, proprio_dim=8, seed=1)
    tr = SyntheticProprioDataset(size=100, proprio_dim=8, seed=1,
                                 split="train", val_fraction=0.2)
    va = SyntheticProprioDataset(size=100, proprio_dim=8, seed=1,
                                 split="val", val_fraction=0.2)
    assert len(tr) == 80 and len(va) == 20
    # same universe, disjoint halves
    np.testing.assert_array_equal(tr._states, full._states[:80])
    np.testing.assert_array_equal(va._states, full._states[80:])


def test_hdf5_split_by_demo(demo_h5):
    kw = dict(cameras=("agentview",), image_size=64, val_fraction=1 / 3,
              split_seed=0)
    tr = HDF5DemoStore(demo_h5, split="train", **kw)
    va = HDF5DemoStore(demo_h5, split="val", **kw)
    assert len(tr) == 40 and len(va) == 20       # 3 demos x 20 steps
    assert set(tr._demo_keys).isdisjoint(va._demo_keys)
    assert set(tr._demo_keys) | set(va._demo_keys) == {
        "demo_0", "demo_1", "demo_2"}


def test_build_dataset_split_plumbing():
    cfg = Config(data=DataConfig(source="synthetic", val_fraction=0.25,
                                 synthetic_size=64))
    tr = build_dataset(cfg, split="train")
    va = build_dataset(cfg, split="val")
    assert len(tr) == 48 and len(va) == 16


# ---- LSTM temporal variant ---------------------------------------------------

def test_lstm_temporal_mode():
    cfg = ModelConfig(backbone="cnn_small", image_size=64, temporal_frames=3,
                      temporal_mode="lstm", use_proprio=True, proprio_dim=8,
                      image_features=32, head_hidden=(32,))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    assert "lstm_agentview" in variables["params"]
    pos, quat = model.apply(variables, batch, train=False)
    assert pos.shape == (2, 3) and quat.shape == (2, 4)
    # train mode works too (BN over B*T frames)
    (_, _), mut = model.apply(variables, batch, train=True,
                              mutable=["batch_stats"])


def test_lstm_differs_from_channel_stack():
    kw = dict(backbone="cnn_small", image_size=64, temporal_frames=3,
              use_proprio=False, image_features=32, head_hidden=(32,))
    m_l = build_model(ModelConfig(temporal_mode="lstm", **kw))
    m_c = build_model(ModelConfig(temporal_mode="channel", **kw))
    batch = example_batch(ModelConfig(temporal_mode="lstm", **kw), 2)
    v_l = m_l.init(jax.random.PRNGKey(0), batch, train=False)
    v_c = m_c.init(jax.random.PRNGKey(0), batch, train=False)
    # channel mode sees T*C input channels; lstm mode sees C
    k_l = v_l["params"]["encoder_agentview"]["block0"]["conv"]["kernel"]
    k_c = v_c["params"]["encoder_agentview"]["block0"]["conv"]["kernel"]
    assert k_l.shape[2] == 3 and k_c.shape[2] == 9


# ---- torch weight import -------------------------------------------------------

def _fake_torch_sd_from_flax(params, stats, arch):
    """Inverse-map a flax ResNet tree into torchvision state_dict naming."""
    sd = {}

    def put_convbn(tconv, tbn, node_p, node_s):
        sd[f"{tconv}.weight"] = np.transpose(
            np.asarray(node_p["conv"]["kernel"]), (3, 2, 0, 1))
        sd[f"{tbn}.weight"] = np.asarray(node_p["bn"]["scale"])
        sd[f"{tbn}.bias"] = np.asarray(node_p["bn"]["bias"])
        sd[f"{tbn}.running_mean"] = np.asarray(node_s["bn"]["mean"])
        sd[f"{tbn}.running_var"] = np.asarray(node_s["bn"]["var"])

    put_convbn("conv1", "bn1", params["stem"], stats["stem"])
    stages = (2, 2, 2, 2) if arch == "resnet18" else (3, 4, 6, 3)
    n_convs = 2 if arch == "resnet18" else 3
    for s, nb in enumerate(stages, start=1):
        for b in range(nb):
            name = f"stage{s}_block{b}"
            for k in range(1, n_convs + 1):
                put_convbn(f"layer{s}.{b}.conv{k}", f"layer{s}.{b}.bn{k}",
                           params[name][f"conv{k}"], stats[name][f"conv{k}"])
            if "downsample" in params[name]:
                put_convbn(f"layer{s}.{b}.downsample.0",
                           f"layer{s}.{b}.downsample.1",
                           params[name]["downsample"],
                           stats[name]["downsample"])
    return sd


def test_torch_import_roundtrip():
    """flax -> fake torch sd -> import == identity (validates key mapping
    and the OIHW<->HWIO transposes both ways)."""
    cfg = ModelConfig(backbone="resnet18", image_size=64, use_proprio=False,
                      image_features=64, head_hidden=(32,))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=1)
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)

    enc_p = variables["params"]["encoder_agentview"]
    enc_s = variables["batch_stats"]["encoder_agentview"]
    sd = _fake_torch_sd_from_flax(enc_p, enc_s, "resnet18")

    merged = load_pretrained_backbone(variables, "agentview", sd, "resnet18")
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(merged["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(variables["batch_stats"]),
                    jax.tree.leaves(merged["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_torch_import_rejects_bad_arch():
    with pytest.raises(ValueError):
        import_torch_resnet({}, "resnet101")


def test_torch_import_shape_mismatch_raises():
    cfg = ModelConfig(backbone="resnet50", image_size=64, use_proprio=False,
                      image_features=64, head_hidden=(32,))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=1)
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    # resnet18-shaped weights into a resnet50 encoder must fail loudly
    cfg18 = ModelConfig(backbone="resnet18", image_size=64,
                        use_proprio=False, image_features=64,
                        head_hidden=(32,))
    m18 = build_model(cfg18)
    v18 = m18.init(jax.random.PRNGKey(1), example_batch(cfg18, 1),
                   train=False)
    sd18 = _fake_torch_sd_from_flax(
        v18["params"]["encoder_agentview"],
        v18["batch_stats"]["encoder_agentview"], "resnet18")
    with pytest.raises((KeyError, ValueError)):
        load_pretrained_backbone(variables, "agentview", sd18, "resnet18")


def _fake_torch_vit_sd_from_flax(params, depth, heads):
    """Inverse-map a flax ViT encoder tree into torchvision
    VisionTransformer state_dict naming (inverts import_torch_vit; same
    torch-free oracle approach as _fake_torch_sd_from_flax)."""
    dim = np.asarray(params["cls_token"]).shape[-1]
    sd = {
        "conv_proj.weight": np.transpose(
            np.asarray(params["patch_embed"]["kernel"]), (3, 2, 0, 1)),
        "conv_proj.bias": np.asarray(params["patch_embed"]["bias"]),
        "class_token": np.asarray(params["cls_token"]),
        "encoder.pos_embedding": np.asarray(params["pos_embed"]),
        "encoder.ln.weight": np.asarray(params["ln_out"]["scale"]),
        "encoder.ln.bias": np.asarray(params["ln_out"]["bias"]),
    }
    for i in range(depth):
        blk = params[f"block{i}"]
        t = f"encoder.layers.encoder_layer_{i}"
        sd[f"{t}.ln_1.weight"] = np.asarray(blk["ln1"]["scale"])
        sd[f"{t}.ln_1.bias"] = np.asarray(blk["ln1"]["bias"])
        rows, brows = [], []
        for name in ("query", "key", "value"):
            k = np.asarray(blk["attn"][name]["kernel"]).reshape(dim, dim)
            rows.append(k.T)
            brows.append(np.asarray(blk["attn"][name]["bias"]).reshape(dim))
        sd[f"{t}.self_attention.in_proj_weight"] = np.concatenate(rows, 0)
        sd[f"{t}.self_attention.in_proj_bias"] = np.concatenate(brows, 0)
        sd[f"{t}.self_attention.out_proj.weight"] = np.asarray(
            blk["attn"]["out"]["kernel"]).reshape(dim, dim).T
        sd[f"{t}.self_attention.out_proj.bias"] = np.asarray(
            blk["attn"]["out"]["bias"])
        sd[f"{t}.ln_2.weight"] = np.asarray(blk["ln2"]["scale"])
        sd[f"{t}.ln_2.bias"] = np.asarray(blk["ln2"]["bias"])
        sd[f"{t}.mlp.0.weight"] = np.asarray(blk["mlp1"]["kernel"]).T
        sd[f"{t}.mlp.0.bias"] = np.asarray(blk["mlp1"]["bias"])
        sd[f"{t}.mlp.3.weight"] = np.asarray(blk["mlp2"]["kernel"]).T
        sd[f"{t}.mlp.3.bias"] = np.asarray(blk["mlp2"]["bias"])
    return sd


def test_init_from_torch_vit_fit_and_resume(tmp_path, demo_h5):
    """ViT arm of train.init_from_torch end-to-end through fit(), THEN a
    second train() call resuming from the saved checkpoint. A BN-free ViT
    init has no batch_stats entry for its encoders; the import merge must
    not create an empty-dict node there, or every checkpoint becomes
    unrestorable against a fresh create_state template (orbax 'tree
    structures do not match') and preemption-resume dies (ADVICE r3)."""
    import rgb_proprioceptive_pose_estimator_tpu as rppe
    from rgb_proprioceptive_pose_estimator_tpu.utils.checkpoint import (
        restore_variables,
    )

    mkw = {
        "model.backbone": "vit",
        "model.image_size": 32,
        "model.vit_patch": 16,
        "model.vit_dim": 32,
        "model.vit_depth": 2,
        "model.vit_heads": 4,
        "model.vit_pool": "cls",
        "model.image_features": 32,
        "model.head_hidden": [32],
        "model.use_proprio": False,
    }
    mcfg = rppe.preset("pr2").override(**mkw).model
    donor = build_model(mcfg)
    v = donor.init(jax.random.PRNGKey(99), example_batch(mcfg, 1),
                   train=False)
    assert "batch_stats" not in v  # precondition: ViT is BN-free
    sd = _fake_torch_vit_sd_from_flax(v["params"]["encoder_agentview"],
                                      depth=2, heads=4)
    npz = tmp_path / "vit.npz"
    np.savez(npz, **sd)

    cfg = rppe.preset("pr2").override(**mkw, **{
        "data.path": demo_h5,
        "data.batch_size": 8,
        "data.num_workers": 0,
        "train.steps": 2,
        "train.seed": 0,
        "train.log_every": 1,
        "train.eval_every": 0,
        "train.ckpt_every": 2,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "train.init_from_torch": str(npz),
    })
    rppe.train(cfg)

    loaded = restore_variables(str(tmp_path / "ckpt"))
    # no empty batch_stats node was invented for the BN-free encoder
    assert "encoder_agentview" not in (loaded.get("batch_stats") or {})
    # imported (frozen-free) backbone keys exist alongside the fresh head
    assert "block1" in loaded["params"]["encoder_agentview"]
    assert "pose_out" in loaded["params"]

    # resume: before the fix this raised orbax 'tree structures do not
    # match' on restore because of the phantom batch_stats entry
    out = rppe.train(cfg.override(**{"train.steps": 4}))
    assert int(out["state"].step) == 4


def test_load_state_dict_file_extensions(tmp_path):
    """Torch-pickled state_dicts load under the common published-checkpoint
    suffixes (.pt/.pth/.bin/.ckpt) silently; an unrecognized extension
    warns but still attempts the (weights_only) torch load instead of
    hard-failing -- ADVICE r4 flagged the hard whitelist as a behavior
    regression for existing init_from_torch users."""
    import warnings

    import torch

    from rgb_proprioceptive_pose_estimator_tpu.utils.torch_import import (
        load_state_dict_file,
    )

    sd = {"w": torch.ones(2, 3)}
    for ext in (".pt", ".bin", ".ckpt"):
        p = tmp_path / f"weights{ext}"
        torch.save(sd, str(p))
        with warnings.catch_warnings():
            warnings.simplefilter("error")     # no warning on known exts
            out = load_state_dict_file(str(p))
        np.testing.assert_array_equal(out["w"], np.ones((2, 3)))

    p = tmp_path / "weights.oddext"
    torch.save(sd, str(p))
    with pytest.warns(UserWarning, match="unrecognized state_dict"):
        out = load_state_dict_file(str(p))
    np.testing.assert_array_equal(out["w"], np.ones((2, 3)))

    # container-style checkpoint (Lightning et al.): the weights live UNDER
    # a "state_dict" key next to bookkeeping entries -- the dominant layout
    # for published .ckpt files; the loader unwraps it instead of returning
    # the wrapper (which would fail later as KeyError('conv1.weight'))
    p = tmp_path / "container.ckpt"
    torch.save({"epoch": 3, "global_step": 900, "state_dict": sd}, str(p))
    out = load_state_dict_file(str(p))
    assert set(out) == {"w"}
    np.testing.assert_array_equal(out["w"], np.ones((2, 3)))


def test_init_from_torch_npz_through_fit(tmp_path, demo_h5):
    """train.init_from_torch: a torchvision-style .npz state_dict
    initializes every camera encoder inside fit() (the reference's
    `pretrained=True` workflow, SURVEY.md section 1.3); combined with
    freeze_backbone, the trained run's encoder params ARE the imported
    weights while the head trains from fresh init."""
    import rgb_proprioceptive_pose_estimator_tpu as rppe
    from rgb_proprioceptive_pose_estimator_tpu.utils.checkpoint import (
        restore_variables,
    )

    # donor init with a seed that differs from fit()'s, so imported values
    # are distinguishable from this run's own random init
    mcfg = ModelConfig(backbone="resnet18", image_size=64,
                       use_proprio=False, image_features=64,
                       head_hidden=(32,))
    donor = build_model(mcfg)
    v = donor.init(jax.random.PRNGKey(99), example_batch(mcfg, 1),
                   train=False)
    sd = _fake_torch_sd_from_flax(v["params"]["encoder_agentview"],
                                  v["batch_stats"]["encoder_agentview"],
                                  "resnet18")
    npz = tmp_path / "r18.npz"
    np.savez(npz, **sd)

    cfg = rppe.preset("pr2").override(**{
        "model.backbone": "resnet18",
        "model.image_size": 64,
        "model.image_features": 64,
        "model.head_hidden": [32],
        "model.use_proprio": False,
        "model.freeze_backbone": True,
        "data.path": demo_h5,
        "data.batch_size": 8,
        "data.num_workers": 2,
        "train.steps": 2,
        "train.seed": 0,
        "train.log_every": 1,
        "train.eval_every": 0,
        "train.ckpt_every": 2,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "train.init_from_torch": str(npz),
    })
    rppe.train(cfg)

    loaded = restore_variables(str(tmp_path / "ckpt"))
    got = jax.tree_util.tree_flatten_with_path(
        loaded["params"]["encoder_agentview"])[0]
    want = {jax.tree_util.keystr(p): leaf for p, leaf in
            jax.tree_util.tree_flatten_with_path(
                v["params"]["encoder_agentview"])[0]}
    assert got and set(want) == {jax.tree_util.keystr(p) for p, _ in got}
    compared = 0
    for path, leaf in got:
        key = jax.tree_util.keystr(path)
        if "proj" in key:
            # the feature-projection head is NOT covered by the import
            # (torchvision's fc is dropped); it keeps this run's fresh init
            continue
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want[key]), atol=1e-7, err_msg=key)
        compared += 1
    assert compared > 50  # the whole resnet18 backbone was checked
    # the pose head exists alongside the imported encoder (fresh init)
    assert "pose_out" in loaded["params"]


def test_init_from_torch_validation(tmp_path, demo_h5):
    """Unsupported backbones and init_from+init_from_torch both fail
    loudly before any training step."""
    import rgb_proprioceptive_pose_estimator_tpu as rppe

    base = {
        "data.path": demo_h5,
        "data.batch_size": 8,
        "train.steps": 1,
        "train.eval_every": 0,
        "train.ckpt_every": 1,
    }
    cfg = rppe.preset("pr2").override(**{
        **base,
        "model.use_proprio": False,
        "train.ckpt_dir": str(tmp_path / "c1"),
        "train.init_from_torch": str(tmp_path / "missing.npz"),
    })
    # pr2's cnn_small has no torchvision mapping
    with pytest.raises(ValueError, match="no torchvision import mapping"):
        rppe.train(cfg)

    cfg2 = rppe.preset("pr2").override(**{
        **base,
        "model.use_proprio": False,
        "train.ckpt_dir": str(tmp_path / "c2"),
        "train.init_from": str(tmp_path / "other_run"),
        "train.init_from_torch": str(tmp_path / "missing.npz"),
    })
    with pytest.raises(ValueError, match="mutually exclusive"):
        rppe.train(cfg2)


def test_load_state_dict_file_npz_roundtrip(tmp_path):
    from rgb_proprioceptive_pose_estimator_tpu.utils.torch_import import (
        load_state_dict_file,
    )

    sd = {"conv1.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
          "bn1.running_mean": np.ones(3, dtype=np.float32)}
    path = tmp_path / "sd.npz"
    np.savez(path, **sd)
    out = load_state_dict_file(str(path))
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k])


def test_lstm_learns_velocity_task(tmp_path):
    """LSTM temporal variant LEARNING test (VERDICT r2 missing-3): on the
    velocity fixture the position label = marker + velocity, so a model
    must integrate consecutive frames; the LSTM path trained end-to-end
    must drive train pos loss well below the single-frame floor's scale
    and produce sane held-out MAE."""
    import rgb_proprioceptive_pose_estimator_tpu as rppe
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    path = str(tmp_path / "vel.hdf5")
    write_demo_fixture(path, n_demos=4, steps=30, image_hw=32,
                       cameras=("agentview",), seed=5, velocity_alpha=1.0)
    cfg = rppe.preset("pr2").override(**{
        "model.image_size": 32,
        "model.image_features": 32,
        "model.head_hidden": [32],
        "model.temporal_frames": 3,
        "model.temporal_mode": "lstm",
        "data.path": path,
        "data.batch_size": 16,
        "data.num_workers": 2,
        "data.augment": False,      # inter-frame displacement IS the signal
        # fit-capacity test: 4 demos can't support held-out generalization;
        # that bar is scripts/accuracy_artifact.py's velocity rows at 40
        # demos. Here eval==train: the LSTM must FIT the temporal function.
        "data.val_fraction": 0.0,
        "train.steps": 200,
        "train.lr": 3e-3,
        "train.log_every": 100,
        "train.eval_every": 200,
        "train.eval_steps": 0,
        "train.ckpt_every": 0,
        "train.ckpt_dir": str(tmp_path / "ckpt_lstm"),
    })
    out = rppe.train(cfg)
    m = out["metrics"]
    # marker positions span ~[0,1] (~25 cm MAE at chance); fitting the
    # temporal function must get far below that
    assert m["pos_loss"] < 0.02, m
    assert m["eval_pos_mae_cm"] < 10.0, m


def test_camera_dropout_end_to_end(tmp_path, demo_h5):
    """model.camera_dropout trains; evaluate(drop_cameras=) scores the
    dead-sensor case; Predictor with the camera OMITTED from obs matches
    the explicit camera_mask forward exactly."""
    import rgb_proprioceptive_pose_estimator_tpu as rppe

    cfg = rppe.preset("pr2").override(**{
        "model.image_size": 32, "model.image_features": 32,
        "model.head_hidden": [32],
        "model.cameras": ("agentview", "robot0_eye_in_hand"),
        "model.camera_dropout": 0.3,
        "data.path": demo_h5, "data.batch_size": 8,
        "data.num_workers": 0,
        "train.steps": 6, "train.log_every": 3, "train.eval_every": 0,
        "train.ckpt_every": 6, "train.ckpt_dir": str(tmp_path / "cd"),
    })
    rppe.train(cfg)

    full = rppe.evaluate(cfg, max_batches=2)
    dead = rppe.evaluate(cfg, max_batches=2, drop_cameras=("agentview",))
    assert np.isfinite(dead["pos_mae_cm"])
    assert dead["pos_mae_cm"] != full["pos_mae_cm"]
    with pytest.raises(ValueError, match="not in"):
        rppe.evaluate(cfg, drop_cameras=("bogus",))
    with pytest.raises(ValueError, match="every input"):
        rppe.evaluate(cfg, drop_cameras=cfg.model.cameras)
    # duplicates (cli --drop-camera is repeatable) dedup, not spuriously
    # trip the drop-every-input check
    dup = rppe.evaluate(cfg, max_batches=1,
                        drop_cameras=("agentview", "agentview"))
    assert np.isfinite(dup["pos_mae_cm"])
    # proprio-only model: no camera branches to kill -- loud, not a no-op
    with pytest.raises(ValueError, match="proprio-only"):
        rppe.evaluate(rppe.preset("pr1"), drop_cameras=("agentview",))

    ds = build_dataset(cfg, split="all")
    batch = ds.get_batch(np.arange(4), augment=False, seed=0)
    batch.pop("target_pos")
    batch.pop("target_quat")
    pred = rppe.Predictor(cfg, max_batch=4)
    pos_full, _ = pred(batch)
    obs_dead = {
        "images": {
            "robot0_eye_in_hand": batch["images"]["robot0_eye_in_hand"]},
    }   # pr2 is RGB-only: no proprio key
    pos_dead, quat_dead = pred(obs_dead)
    assert pos_dead.shape == (4, 3)
    assert not np.allclose(pos_full, pos_dead)

    # exact parity with the explicit-mask forward (zero placeholder image
    # + zero mask column == what Predictor substitutes)
    mask = np.ones((4, 2), np.float32)
    mask[:, 0] = 0.0
    ref_batch = {
        "images": {
            "agentview": np.zeros_like(batch["images"]["agentview"]),
            "robot0_eye_in_hand": batch["images"]["robot0_eye_in_hand"],
        },
        "camera_mask": mask,
    }
    ref_pos, ref_quat = pred._fn(pred.state.eval_variables(), ref_batch)
    np.testing.assert_allclose(pos_dead, np.asarray(ref_pos), atol=1e-6)
    np.testing.assert_allclose(quat_dead, np.asarray(ref_quat), atol=1e-6)

    # a model trained WITHOUT camera_dropout must fail loudly on a missing
    # camera (a typo'd obs key silently serving the out-of-distribution
    # collapse is the production footgun) -- unless explicitly opted in
    cfg0 = cfg.override(**{"model.camera_dropout": 0.0})
    strict = rppe.Predictor(cfg0, max_batch=4)
    with pytest.raises(KeyError, match="missing cameras"):
        strict(obs_dead)
    opted = rppe.Predictor(cfg0, max_batch=4, allow_missing_cameras=True)
    pos_opt, _ = opted(obs_dead)
    np.testing.assert_allclose(pos_opt, pos_dead, atol=1e-6)
