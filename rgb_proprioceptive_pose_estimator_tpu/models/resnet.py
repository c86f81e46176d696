"""ResNet-18 / ResNet-50 image encoders (C4, BASELINE.json:9,10).

Architecture matches torchvision's resnet18/resnet50 (NHWC here instead of
NCHW): 7x7/2 stem + 3x3/2 maxpool, four stages, global average pool. The
classifier FC is replaced by a feature projection, the way the reference
swapped the final FC (`[RECALL]` SURVEY.md section 1.3). Weight-for-weight
forward parity with torchvision is asserted in tests/parity/.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rgb_proprioceptive_pose_estimator_tpu.models.blocks import (
    BatchNormAct,
    ConvBNReLU,
    kaiming_out,
)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 -> 3x3, identity or 1x1-conv shortcut."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # explicit symmetric (1,1) padding: flax 'SAME' pads asymmetrically
        # (right/bottom) for stride 2, which silently diverges from torch's
        # pad=1 -- caught by tests/parity/test_e2e_model_parity.py
        pad1 = [(1, 1), (1, 1)]
        residual = x
        y = ConvBNReLU(self.features, (3, 3), self.strides, padding=pad1,
                       dtype=self.dtype,
                       use_pallas=self.use_pallas, name="conv1")(x, train)
        y = ConvBNReLU(self.features, (3, 3), (1, 1), padding=pad1,
                       act=False,
                       dtype=self.dtype, use_pallas=self.use_pallas,
                       name="conv2")(y, train)
        if residual.shape != y.shape:
            residual = ConvBNReLU(self.features, (1, 1), self.strides,
                                  padding="VALID",
                                  act=False, dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3 -> 1x1(x4), stride on the 3x3."""

    features: int                  # bottleneck width; output = 4 * features
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    use_pallas: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out_feat = self.features * self.expansion
        residual = x
        y = ConvBNReLU(self.features, (1, 1), (1, 1), padding="VALID",
                       dtype=self.dtype,
                       use_pallas=self.use_pallas, name="conv1")(x, train)
        # symmetric pad=1 (torch semantics) -- see BasicBlock note
        y = ConvBNReLU(self.features, (3, 3), self.strides,
                       padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       use_pallas=self.use_pallas, name="conv2")(y, train)
        y = ConvBNReLU(out_feat, (1, 1), (1, 1), padding="VALID",
                       act=False, dtype=self.dtype,
                       use_pallas=self.use_pallas, name="conv3")(y, train)
        if residual.shape != y.shape:
            residual = ConvBNReLU(out_feat, (1, 1), self.strides,
                                  padding="VALID", act=False,
                                  dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  name="downsample")(x, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block: str = "basic"           # "basic" | "bottleneck"
    features: int = 512            # output embedding width
    dtype: Any = jnp.float32
    use_pallas: bool = False
    remat: bool = False            # jax.checkpoint each residual block

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = ConvBNReLU(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                       dtype=self.dtype, use_pallas=self.use_pallas,
                       name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        if self.remat:
            # recompute block activations in the backward pass
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        for stage, n_blocks in enumerate(self.stage_sizes):
            width = 64 * (2 ** stage)
            for i in range(n_blocks):
                strides = (2, 2) if (i == 0 and stage > 0) else (1, 1)
                x = block_cls(width, strides, dtype=self.dtype,
                              use_pallas=self.use_pallas,
                              name=f"stage{stage + 1}_block{i}")(x, train)

        x = jnp.mean(x, axis=(-3, -2))        # global average pool
        x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj")(x)
        return nn.relu(x)


def ResNet18(features: int = 512, dtype: Any = jnp.float32,
             use_pallas: bool = False, remat: bool = False,
             name=None) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block="basic", features=features,
                  dtype=dtype, use_pallas=use_pallas, remat=remat, name=name)


def ResNet50(features: int = 1024, dtype: Any = jnp.float32,
             use_pallas: bool = False, remat: bool = False,
             name=None) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block="bottleneck",
                  features=features, dtype=dtype, use_pallas=use_pallas,
                  remat=remat, name=name)
