from rgb_proprioceptive_pose_estimator_tpu.models.blocks import (
    ConvBNReLU,
    BatchNormAct,
)
from rgb_proprioceptive_pose_estimator_tpu.models.cnn_small import CNNSmall
from rgb_proprioceptive_pose_estimator_tpu.models.resnet import (
    ResNet,
    ResNet18,
    ResNet34,
    ResNet50,
)
from rgb_proprioceptive_pose_estimator_tpu.models.proprio_mlp import ProprioMLP
from rgb_proprioceptive_pose_estimator_tpu.models.fusion import PoseEstimator, build_model

__all__ = [
    "ConvBNReLU",
    "BatchNormAct",
    "CNNSmall",
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ProprioMLP",
    "PoseEstimator",
    "build_model",
]
