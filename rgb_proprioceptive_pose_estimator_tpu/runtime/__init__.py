from rgb_proprioceptive_pose_estimator_tpu.runtime.native import (
    available,
    augment_batch,
    center_crop_resize_batch,
)

__all__ = ["available", "augment_batch", "center_crop_resize_batch"]
