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
    bn_stats: str = "reduce"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # explicit symmetric (1,1) padding: flax 'SAME' pads asymmetrically
        # (right/bottom) for stride 2, which silently diverges from torch's
        # pad=1 -- caught by tests/parity/test_e2e_model_parity.py
        pad1 = [(1, 1), (1, 1)]
        residual = x
        y = ConvBNReLU(self.features, (3, 3), self.strides, padding=pad1,
                       dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       stats_impl=self.bn_stats, name="conv1")(x, train)
        y = ConvBNReLU(self.features, (3, 3), (1, 1), padding=pad1,
                       act=False,
                       dtype=self.dtype, use_pallas=self.use_pallas,
                       stats_impl=self.bn_stats,
                       name="conv2")(y, train)
        if residual.shape != y.shape:
            residual = ConvBNReLU(self.features, (1, 1), self.strides,
                                  padding="VALID",
                                  act=False, dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                       stats_impl=self.bn_stats,
                                  name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3 -> 1x1(x4), stride on the 3x3."""

    features: int                  # bottleneck width; output = 4 * features
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    use_pallas: bool = False
    bn_stats: str = "reduce"
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out_feat = self.features * self.expansion
        residual = x
        y = ConvBNReLU(self.features, (1, 1), (1, 1), padding="VALID",
                       dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       stats_impl=self.bn_stats, name="conv1")(x, train)
        # symmetric pad=1 (torch semantics) -- see BasicBlock note
        y = ConvBNReLU(self.features, (3, 3), self.strides,
                       padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       stats_impl=self.bn_stats, name="conv2")(y, train)
        y = ConvBNReLU(out_feat, (1, 1), (1, 1), padding="VALID",
                       act=False, dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       stats_impl=self.bn_stats, name="conv3")(y, train)
        if residual.shape != y.shape:
            residual = ConvBNReLU(out_feat, (1, 1), self.strides,
                                  padding="VALID", act=False,
                                  dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                       stats_impl=self.bn_stats,
                                  name="downsample")(x, train)
        return nn.relu(y + residual)


class _S2DStemConv(nn.Module):
    """The 7x7/2 stem conv computed as an equivalent 4x4/1 conv over a
    space-to-depth input (the standard TPU ResNet stem optimization, cf.
    MLPerf TPU submissions): C_in=3 starves the MXU's 128-lane contraction,
    so the input is rearranged to (H/2, W/2, 12) and the 7x7 kernel
    (front-padded to 8x8) is reshaped to 4x4x12 -- mathematically identical
    output, asserted in tests/test_models.py::test_s2d_stem_equivalence.

    The parameter keeps the torchvision shape/path ("conv/kernel",
    (7,7,3,F)) so checkpoints are interchangeable with the plain stem;
    gradients flow through the (linear) weight rearrangement exactly.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f = self.features
        w = self.param("kernel", kaiming_out, (7, 7, 3, f), jnp.float32)
        # y[i,j] = sum_{di,dj<7} x[2i+di-3, 2j+dj-3] w[di,dj]; with
        # di8 = di+1 (front zero row/col), k = di8//2, a = di8%2:
        # x index = 2(i+k-2)+a -> s2d pixel (i+k-2) channel-slot a
        w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        ws = (w8.reshape(4, 2, 4, 2, 3, f)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 12, f))
        n, h, wd, c = x.shape
        xs = (x.reshape(n, h // 2, 2, wd // 2, 2, c)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(n, h // 2, wd // 2, 4 * c))
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), ws.astype(self.dtype),
            window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _S2DStem(nn.Module):
    """conv(s2d) + BN + ReLU with ConvBNReLU('stem')'s exact param tree."""

    dtype: Any = jnp.float32
    use_pallas: bool = False
    stats_impl: str = "reduce"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = _S2DStemConv(64, dtype=self.dtype, name="conv")(x)
        return BatchNormAct(act=True, dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            stats_impl=self.stats_impl,
                            name="bn")(y, train)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block: str = "basic"           # "basic" | "bottleneck"
    features: int = 512            # output embedding width
    dtype: Any = jnp.float32
    use_pallas: bool = False
    bn_stats: str = "reduce"
    stem_s2d: bool = False         # space-to-depth stem (see _S2DStemConv)
    remat: bool = False            # jax.checkpoint each residual block

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.stem_s2d and x.shape[-1] == 3 and x.shape[-3] % 2 == 0 \
                and x.shape[-2] % 2 == 0:
            # param tree (stem/conv/kernel + stem/bn/*) matches the plain
            # branch, so checkpoints are interchangeable
            x = _S2DStem(dtype=self.dtype, use_pallas=self.use_pallas,
                         stats_impl=self.bn_stats, name="stem")(x, train)
        else:
            x = ConvBNReLU(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                           dtype=self.dtype, use_pallas=self.use_pallas,
                           stats_impl=self.bn_stats,
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
                              bn_stats=self.bn_stats,
                              name=f"stage{stage + 1}_block{i}")(x, train)

        x = jnp.mean(x, axis=(-3, -2))        # global average pool
        x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj")(x)
        return nn.relu(x)


def ResNet18(features: int = 512, dtype: Any = jnp.float32,
             use_pallas: bool = False, bn_stats: str = "reduce",
             stem_s2d: bool = False, remat: bool = False,
             name=None) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block="basic", features=features,
                  dtype=dtype, use_pallas=use_pallas, bn_stats=bn_stats,
                  stem_s2d=stem_s2d, remat=remat, name=name)


def ResNet34(features: int = 512, dtype: Any = jnp.float32,
             use_pallas: bool = False, bn_stats: str = "reduce",
             stem_s2d: bool = False, remat: bool = False,
             name=None) -> ResNet:
    """torchvision resnet34 topology: BasicBlock x (3, 4, 6, 3)."""
    return ResNet(stage_sizes=(3, 4, 6, 3), block="basic", features=features,
                  dtype=dtype, use_pallas=use_pallas, bn_stats=bn_stats,
                  stem_s2d=stem_s2d, remat=remat, name=name)


def ResNet50(features: int = 1024, dtype: Any = jnp.float32,
             use_pallas: bool = False, bn_stats: str = "reduce",
             stem_s2d: bool = False, remat: bool = False,
             name=None) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block="bottleneck",
                  features=features, dtype=dtype, use_pallas=use_pallas,
                  bn_stats=bn_stats, stem_s2d=stem_s2d, remat=remat,
                  name=name)
