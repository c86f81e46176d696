"""Model shape/dtype tests across every backbone and fusion variant
(C3-C5, C10, C11, C13)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig
from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
    build_model,
    example_batch,
)


def _init_apply(cfg: ModelConfig, batch_size=2, train=False):
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=batch_size)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    if train:
        (pos, quat), mut = model.apply(variables, batch, train=True,
                                       mutable=["batch_stats"])
    else:
        pos, quat = model.apply(variables, batch, train=False)
    return pos, quat, variables


@pytest.mark.parametrize("backbone,size", [
    ("cnn_small", 64), ("resnet18", 64), ("resnet50", 64)])
def test_backbones_output_pose(backbone, size):
    cfg = ModelConfig(backbone=backbone, image_size=size, use_proprio=True,
                      proprio_dim=8, image_features=64,
                      head_hidden=(32,))
    pos, quat, _ = _init_apply(cfg)
    assert pos.shape == (2, 3) and quat.shape == (2, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(quat), axis=-1), 1.0, atol=1e-5)


def test_proprio_only():
    cfg = ModelConfig(backbone="none", cameras=(), use_proprio=True,
                      proprio_dim=16, head_hidden=(32,))
    pos, quat, _ = _init_apply(cfg)
    assert pos.shape == (2, 3) and quat.shape == (2, 4)


def test_rgb_only():
    cfg = ModelConfig(backbone="cnn_small", image_size=64, use_proprio=False,
                      image_features=64, head_hidden=(32,))
    pos, quat, _ = _init_apply(cfg)
    assert pos.shape == (2, 3)


def test_dual_camera_two_encoders():
    """C10: one encoder per camera, separate parameters."""
    cfg = ModelConfig(backbone="cnn_small", image_size=64,
                      cameras=("agentview", "robot0_eye_in_hand"),
                      use_proprio=True, proprio_dim=8, image_features=64,
                      head_hidden=(32,))
    pos, quat, variables = _init_apply(cfg)
    assert pos.shape == (2, 3)
    params = variables["params"]
    assert "encoder_agentview" in params
    assert "encoder_robot0_eye_in_hand" in params


def test_temporal_stacking():
    """C11: T frames stacked along channels; proprio flattens T*D."""
    cfg = ModelConfig(backbone="cnn_small", image_size=64, temporal_frames=3,
                      use_proprio=True, proprio_dim=8, image_features=64,
                      head_hidden=(32,))
    pos, quat, _ = _init_apply(cfg)
    assert pos.shape == (2, 3) and quat.shape == (2, 4)


def test_bf16_policy_params_stay_f32():
    """C13: bf16 compute, f32 params, finite f32 outputs."""
    cfg = ModelConfig(backbone="cnn_small", image_size=64, dtype="bfloat16",
                      use_proprio=True, proprio_dim=8, image_features=64,
                      head_hidden=(32,))
    pos, quat, variables = _init_apply(cfg, train=True)
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert pos.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(pos)))


def test_train_mode_updates_batch_stats():
    cfg = ModelConfig(backbone="cnn_small", image_size=64, use_proprio=False,
                      image_features=64, head_hidden=(32,))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=4)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    _, mut = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after))
    assert changed, "BN running stats must update in train mode"


def test_eval_mode_is_deterministic_and_frozen():
    cfg = ModelConfig(backbone="cnn_small", image_size=64, use_proprio=False,
                      image_features=64, head_hidden=(32,))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=4)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    p1, q1 = model.apply(variables, batch, train=False)
    p2, q2 = model.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_remat_forward_and_grad():
    """model.remat=True: rematerialized residual blocks still produce
    identical forward results, finite grads, and BN stat updates."""
    kw = dict(backbone="resnet18", image_size=64, use_proprio=False,
              image_features=32, head_hidden=(16,))
    cfg_r = ModelConfig(remat=True, **kw)
    cfg_n = ModelConfig(remat=False, **kw)
    m_r, m_n = build_model(cfg_r), build_model(cfg_n)
    batch = example_batch(cfg_r, batch_size=2)
    variables = m_n.init(jax.random.PRNGKey(0), batch, train=False)

    # same params apply to both; forward must agree exactly
    p_n, _ = m_n.apply(variables, batch, train=False)
    p_r, _ = m_r.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(p_n), np.asarray(p_r),
                               rtol=1e-6, atol=1e-7)

    def loss(params):
        (pos, quat), mut = m_r.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.square(pos)) + jnp.sum(jnp.square(quat))

    g = jax.grad(loss)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(g))


def test_resnet34_backbone():
    """ResNet-34: torchvision topology (BasicBlock x 3,4,6,3), wired
    through config/fusion/torch-import."""
    import jax
    import numpy as np

    from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
        example_batch,
    )

    cfg = ModelConfig(backbone="resnet34", image_size=64, use_proprio=False,
                      image_features=128, head_hidden=(64,))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=2)
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    enc = v["params"]["encoder_agentview"]
    # stage sizes 3/4/6/3
    for stage, n in ((1, 3), (2, 4), (3, 6), (4, 3)):
        blocks = [k for k in enc if k.startswith(f"stage{stage}_block")]
        assert len(blocks) == n, (stage, sorted(blocks))
    # basic blocks (2 convs), not bottleneck
    assert "conv3" not in enc["stage1_block0"]
    n_params = sum(np.asarray(l).size for l in jax.tree.leaves(enc))
    # torchvision resnet34 backbone (no fc) = 21.28M; ours adds the
    # proj head (512*128 + 128)
    assert abs(n_params - (21_284_672 + 512 * 128 + 128)) < 10_000, n_params
    pos, quat = model.apply(v, batch, train=False)
    assert pos.shape == (2, 3) and quat.shape == (2, 4)


def test_proprio_normalize_affine():
    """model.proprio_normalize: (s - mean) / std with dataset stats stored
    in batch_stats; identity until fit() writes stats."""
    import dataclasses

    import jax
    import numpy as np

    from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
        example_batch,
    )

    cfg_n = ModelConfig(backbone="none", cameras=(), use_proprio=True,
                        proprio_dim=6, proprio_hidden=(16,),
                        proprio_features=8, head_hidden=(8,),
                        proprio_normalize=True)
    cfg_r = dataclasses.replace(cfg_n, proprio_normalize=False)
    m_n, m_r = build_model(cfg_n), build_model(cfg_r)
    batch = example_batch(cfg_n, batch_size=4, rng=3)
    v = m_n.init(jax.random.PRNGKey(0), batch, train=False)
    assert set(v["batch_stats"]["proprio"]) == {"proprio_mean",
                                                "proprio_std"}

    # identity stats (the init values): same output as a normalize-off
    # model sharing the params
    pos_id, quat_id = m_n.apply(v, batch, train=False)
    pos_r, quat_r = m_r.apply({"params": v["params"]}, batch, train=False)
    np.testing.assert_allclose(np.asarray(pos_id), np.asarray(pos_r),
                               rtol=1e-6)

    # real stats == feeding the manually standardized vector to the
    # normalize-off model
    mean = np.arange(6, dtype=np.float32)
    std = np.linspace(0.5, 2.0, 6).astype(np.float32)
    bs = {"proprio": {"proprio_mean": mean, "proprio_std": std}}
    pos_n, quat_n = m_n.apply({"params": v["params"], "batch_stats": bs},
                              batch, train=False)
    manual = dict(batch)
    manual["proprio"] = (batch["proprio"] - mean) / std
    pos_m, quat_m = m_r.apply({"params": v["params"]}, manual, train=False)
    np.testing.assert_allclose(np.asarray(pos_n), np.asarray(pos_m),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(quat_n), np.asarray(quat_m),
                               rtol=1e-5, atol=1e-5)


# ---- ViT backbone (TPU-native addition; models/vit.py) ---------------------

def test_vit_backbone_shapes_and_policy():
    cfg = ModelConfig(backbone="vit", image_size=32, use_proprio=True,
                      proprio_dim=8, image_features=64, head_hidden=(32,),
                      vit_patch=8, vit_dim=32, vit_depth=2, vit_heads=4,
                      dtype="bfloat16")
    pos, quat, variables = _init_apply(cfg)
    assert pos.shape == (2, 3) and quat.shape == (2, 4)
    assert pos.dtype == jnp.float32     # head output stays f32
    # params f32 (policy), no batch_stats (LayerNorm only)
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    assert not variables.get("batch_stats")
    # pos_embed sized by the static token count
    enc = variables["params"]["encoder_agentview"]
    assert enc["pos_embed"].shape == (1, 16, 32)   # (32/8)^2 tokens


def test_vit_temporal_channel_stack():
    cfg = ModelConfig(backbone="vit", image_size=32, use_proprio=False,
                      image_features=32, head_hidden=(32,),
                      temporal_frames=3, vit_patch=8, vit_dim=32,
                      vit_depth=1, vit_heads=4)
    pos, quat, variables = _init_apply(cfg)
    assert pos.shape == (2, 3)
    # patch conv consumed 3*3=9 channels
    enc = variables["params"]["encoder_agentview"]
    assert enc["patch_embed"]["kernel"].shape == (8, 8, 9, 32)


def test_vit_remat_matches_plain():
    cfg = ModelConfig(backbone="vit", image_size=32, use_proprio=False,
                      image_features=32, head_hidden=(32,),
                      vit_patch=8, vit_dim=32, vit_depth=2, vit_heads=4)
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    p1, q1 = model.apply(variables, batch, train=False)
    cfg_r = ModelConfig(**{**cfg.__dict__, "remat": True})
    p2, q2 = build_model(cfg_r).apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)


def test_vit_config_validation():
    with pytest.raises(ValueError, match="vit_patch"):
        ModelConfig(backbone="vit", image_size=100, vit_patch=16)
    with pytest.raises(ValueError, match="vit_heads"):
        ModelConfig(backbone="vit", image_size=64, vit_dim=100, vit_heads=6)


def test_rot6d_head_outputs_unit_quat():
    """model.rot_rep='rot6d': the head emits 6 rotation values, converted
    in-graph to a unit quaternion -- public output stays (pos3, quat4)."""
    cfg = ModelConfig(backbone="none", cameras=(), use_proprio=True,
                      proprio_dim=16, head_hidden=(32,), rot_rep="rot6d")
    pos, quat, variables = _init_apply(cfg)
    assert pos.shape == (2, 3) and quat.shape == (2, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(quat), axis=-1), 1.0, atol=1e-5)
    # the head's final Dense carries 3 + 6 outputs
    assert variables["params"]["pose_out"]["kernel"].shape[-1] == 9


def test_rot_rep_validation():
    with pytest.raises(ValueError, match="rot_rep"):
        ModelConfig(rot_rep="euler")


def test_camera_mask_zeroes_camera_features():
    """batch['camera_mask']: a zero column makes the output INDEPENDENT of
    that camera's pixels (its features zero out at the fusion point); an
    all-ones mask is the identity; no mask == all-ones."""
    cfg = ModelConfig(backbone="cnn_small", image_size=32,
                      cameras=("agentview", "robot0_eye_in_hand"),
                      use_proprio=False, image_features=32,
                      head_hidden=(32,))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    pos0, _ = model.apply(variables, batch, train=False)
    ones = np.ones((2, 2), np.float32)
    pos1, _ = model.apply(variables, {**batch, "camera_mask": ones},
                          train=False)
    np.testing.assert_array_equal(np.asarray(pos0), np.asarray(pos1))

    mask = ones.copy()
    mask[:, 0] = 0.0   # agentview dead
    pa, _ = model.apply(variables, {**batch, "camera_mask": mask},
                        train=False)
    scrambled = dict(batch)
    scrambled["images"] = dict(batch["images"])
    scrambled["images"]["agentview"] = 255 - batch["images"]["agentview"]
    pb, _ = model.apply(variables, {**scrambled, "camera_mask": mask},
                        train=False)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    # the same scramble with the camera live DOES change the output
    pc, _ = model.apply(variables, scrambled, train=False)
    assert not np.array_equal(np.asarray(pa), np.asarray(pc))


def test_missing_camera_key_equals_zero_mask():
    """A camera STRUCTURALLY absent from batch['images'] must produce
    bitwise the output of a zero camera_mask column (the dead camera's
    features are exactly 0 either way) -- this is the serving path for a
    failed sensor, and it skips the dead encoder entirely."""
    cfg = ModelConfig(backbone="cnn_small", image_size=32,
                      cameras=("agentview", "robot0_eye_in_hand"),
                      use_proprio=False, image_features=32,
                      head_hidden=(32,))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    mask = np.ones((2, 2), np.float32)
    mask[:, 0] = 0.0   # agentview dead via mask
    pm_, qm = model.apply(variables, {**batch, "camera_mask": mask},
                          train=False)
    absent = {"images": {"robot0_eye_in_hand":
                         batch["images"]["robot0_eye_in_hand"]}}
    ps, qs = model.apply(variables, absent, train=False)
    np.testing.assert_array_equal(np.asarray(pm_), np.asarray(ps))
    np.testing.assert_array_equal(np.asarray(qm), np.asarray(qs))
    # no cameras at all without a proprio branch is a loud error
    with pytest.raises(ValueError, match="none of the model's cameras"):
        model.apply(variables, {"images": {}}, train=False)


def test_camera_dropout_respects_external_mask():
    """The force-one-camera-alive guard must only resurrect cameras that
    were live BEFORE dropout: with an incoming camera_mask declaring
    camera 0 dead, no train-mode sample may depend on camera 0's pixels
    (the old keep+forced ordering could resurrect it)."""
    cfg = ModelConfig(backbone="cnn_small", image_size=32,
                      cameras=("agentview", "robot0_eye_in_hand"),
                      use_proprio=False, image_features=32,
                      head_hidden=(32,), camera_dropout=0.9)
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=16)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    mask = np.ones((16, 2), np.float32)
    mask[:, 0] = 0.0   # agentview dead for every row

    def fwd(b):
        (pos, quat), _ = model.apply(
            variables, {**b, "camera_mask": mask}, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(7)})
        return np.asarray(pos), np.asarray(quat)

    p0, q0 = fwd(batch)
    scrambled = dict(batch)
    scrambled["images"] = dict(batch["images"])
    scrambled["images"]["agentview"] = 255 - batch["images"]["agentview"]
    p1, q1 = fwd(scrambled)
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(q0, q1)
    # ... while the live camera still matters: at p=0.9 most rows lose it
    # to dropout and get it forced back (the only live camera)
    scrambled2 = dict(batch)
    scrambled2["images"] = dict(batch["images"])
    scrambled2["images"]["robot0_eye_in_hand"] = (
        255 - batch["images"]["robot0_eye_in_hand"])
    p2, _ = fwd(scrambled2)
    assert not np.array_equal(p0, p2)


def test_camera_dropout_validation():
    with pytest.raises(ValueError, match="camera_dropout"):
        ModelConfig(camera_dropout=1.5)
    with pytest.raises(ValueError, match="second input"):
        ModelConfig(backbone="cnn_small", cameras=("agentview",),
                    use_proprio=False, camera_dropout=0.2)
    with pytest.raises(ValueError, match="image path"):
        ModelConfig(backbone="none", cameras=(), use_proprio=True,
                    camera_dropout=0.2)
    # two cameras without proprio is a valid dropout configuration
    ModelConfig(backbone="cnn_small", cameras=("a", "b"),
                use_proprio=False, camera_dropout=0.2)


def test_camera_dropout_train_mode_only():
    """camera_dropout samples per-sample camera masks in train mode (the
    'dropout' rng the train step always provides); eval mode is untouched."""
    import dataclasses

    cfg = ModelConfig(backbone="cnn_small", image_size=32,
                      cameras=("agentview", "robot0_eye_in_hand"),
                      use_proprio=True, proprio_dim=8, image_features=32,
                      head_hidden=(32,), camera_dropout=0.5)
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=8)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    (p_drop, _), _ = model.apply(variables, batch, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(3)})
    m0 = build_model(dataclasses.replace(cfg, camera_dropout=0.0))
    (p_full, _), _ = m0.apply(variables, batch, train=True,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(3)})
    # p=0.5 over 8 samples x 2 cameras: some camera dropped w.p. 1-2^-16
    assert not np.array_equal(np.asarray(p_drop), np.asarray(p_full))
    pe1, _ = model.apply(variables, batch, train=False)
    pe0, _ = m0.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(pe1), np.asarray(pe0))
