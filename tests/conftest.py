"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-stack analogue of a fake distributed backend
(SURVEY.md section 5.2): the *real* sharded train step runs on 8 fake CPU
devices via --xla_force_host_platform_device_count. Must be set before jax
initializes, hence the env mutation at conftest import time.
"""

import os

# force-override: the environment presets JAX_PLATFORMS to the TPU platform
# plugin ('axon'), which ignores the env var -- the config update below is
# what actually pins the backend to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
import re as _re

_flags = os.environ.get("XLA_FLAGS", "")
# force AT LEAST 8 virtual devices (an inherited smaller count would break
# the distributed tests), replacing any existing value
_flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", _flags)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def demo_h5(tmp_path_factory):
    """Tiny generated robosuite-layout HDF5 fixture (SURVEY.md section 5.2)."""
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    path = tmp_path_factory.mktemp("data") / "demo.hdf5"
    return write_demo_fixture(
        str(path), n_demos=3, steps=20,
        cameras=("agentview", "robot0_eye_in_hand"),
        image_hw=84, proprio_dim=16, seed=0)
