from rgb_proprioceptive_pose_estimator_tpu.data.synthetic import SyntheticProprioDataset
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
    HDF5DemoStore,
    write_demo_fixture,
)
from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import HostPipeline, build_dataset

__all__ = [
    "SyntheticProprioDataset",
    "HDF5DemoStore",
    "write_demo_fixture",
    "HostPipeline",
    "build_dataset",
]
