"""Reproducibility guarantees + the deployment-side observation buffer."""

import jax
import numpy as np

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig
from rgb_proprioceptive_pose_estimator_tpu.utils.obs_buffer import ObsBuffer


def test_same_seed_same_params(tmp_path):
    """Two fresh runs with identical config produce bitwise-identical
    params on CPU (deterministic init, pipeline, and step)."""
    outs = []
    for name in ("a", "b"):
        cfg = rppe.preset("pr1").override(**{
            "train.steps": 30,
            "train.eval_every": 0,
            "train.ckpt_every": 30,
            "train.log_every": 100,
            "train.ckpt_dir": str(tmp_path / name),
            "data.synthetic_size": 128,
            "data.num_workers": 2,
        })
        outs.append(rppe.train(cfg))
    pa = jax.device_get(outs[0]["state"].params)
    pb = jax.device_get(outs[1]["state"].params)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _single_obs(i, cfg):
    rs = np.random.RandomState(i)
    obs = {}
    if cfg.backbone != "none":
        obs["images"] = {cam: rs.randint(0, 256, (cfg.image_size,
                                                  cfg.image_size, 3),
                                         np.uint8)
                         for cam in cfg.cameras}
    if cfg.use_proprio:
        obs["proprio"] = rs.randn(cfg.proprio_dim).astype(np.float32)
    return obs


def test_obs_buffer_windows_match_training_semantics():
    cfg = ModelConfig(backbone="cnn_small", image_size=32, temporal_frames=3,
                      cameras=("agentview",), use_proprio=True, proprio_dim=4)
    buf = ObsBuffer(cfg)

    o0, o1, o2, o3 = (_single_obs(i, cfg) for i in range(4))
    w0 = buf.push(o0)
    # clamp-at-start: all 3 slots are frame 0 (same as hdf5 windowing at t=0)
    np.testing.assert_array_equal(w0["images"]["agentview"][0],
                                  w0["images"]["agentview"][2])
    assert w0["proprio"].shape == (3, 4)

    buf.push(o1)
    w2 = buf.push(o2)
    np.testing.assert_array_equal(w2["images"]["agentview"][0],
                                  o0["images"]["agentview"])
    np.testing.assert_array_equal(w2["images"]["agentview"][2],
                                  o2["images"]["agentview"])

    w3 = buf.push(o3)   # rolls: window = o1, o2, o3
    np.testing.assert_array_equal(w3["images"]["agentview"][0],
                                  o1["images"]["agentview"])

    buf.reset()
    w = buf.push(o3)
    np.testing.assert_array_equal(w["images"]["agentview"][0],
                                  o3["images"]["agentview"])


def test_obs_buffer_dead_camera_whole_window_semantics():
    """A camera missing from ANY frame of the window is omitted from the
    stacked obs (the camera_dropout-consistent whole-window structural
    absence, utils/obs_buffer.py docstring) and revives after T
    consecutive live frames."""
    cfg = ModelConfig(backbone="cnn_small", image_size=32, temporal_frames=3,
                      cameras=("agentview", "wrist"), use_proprio=True,
                      proprio_dim=4)
    buf = ObsBuffer(cfg)
    obs = [_single_obs(i, cfg) for i in range(8)]
    for o in obs[3:5]:                      # wrist dies for frames 3-4
        del o["images"]["wrist"]

    for i in (0, 1, 2):
        w = buf.push(obs[i])
        assert set(w["images"]) == {"agentview", "wrist"}
        assert buf.dead_cameras() == []
        assert len(buf) == i + 1

    w = buf.push(obs[3])                    # window 1,2,3 -> wrist dead
    assert set(w["images"]) == {"agentview"}
    assert buf.dead_cameras() == ["wrist"]
    # the live camera still stacks normally
    np.testing.assert_array_equal(w["images"]["agentview"][0],
                                  obs[1]["images"]["agentview"])
    assert w["proprio"].shape == (3, 4)

    buf.push(obs[4])                        # window 2,3,4 -> still dead
    w = buf.push(obs[5])                    # window 3,4,5 -> still dead
    assert set(w["images"]) == {"agentview"}
    w = buf.push(obs[6])                    # window 4,5,6 -> still dead
    assert buf.dead_cameras() == ["wrist"]
    w = buf.push(obs[7])                    # window 5,6,7: all live again
    assert set(w["images"]) == {"agentview", "wrist"}
    assert buf.dead_cameras() == []

    # clamp-at-start padding replicates a first frame's absence
    buf.reset()
    first = _single_obs(20, cfg)
    del first["images"]["agentview"]
    w = buf.push(first)
    assert set(w["images"]) == {"wrist"} and len(buf) == 1


def test_obs_buffer_t1_passthrough():
    cfg = ModelConfig(backbone="none", cameras=(), use_proprio=True,
                      proprio_dim=4, temporal_frames=1)
    buf = ObsBuffer(cfg)
    obs = {"proprio": np.ones(4, np.float32)}
    assert buf.push(obs) is obs
