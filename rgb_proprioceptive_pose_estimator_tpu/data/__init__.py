import os as _os

from rgb_proprioceptive_pose_estimator_tpu.data.synthetic import SyntheticProprioDataset
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
    HDF5DemoStore,
    write_demo_fixture,
)

if not _os.environ.get("_RPPE_RENDER_WORKER"):
    # pipeline imports jax; the GL render child stays jax-free (see the
    # package __init__ note)
    from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import (
        HostPipeline, build_dataset,
    )

__all__ = [
    "SyntheticProprioDataset",
    "HDF5DemoStore",
    "write_demo_fixture",
    "HostPipeline",
    "build_dataset",
]
