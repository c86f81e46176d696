"""Small 4-layer CNN image encoder for 64x64 renders (C4, BASELINE.json:8)."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rgb_proprioceptive_pose_estimator_tpu.models.blocks import ConvBNReLU


class CNNSmall(nn.Module):
    """4 stride-2 ConvBNReLU blocks + global average pool + projection.

    64x64 input -> 4x4 spatial at the last block.
    """

    features: int = 256                       # output embedding width
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    dtype: Any = jnp.float32
    use_pallas: bool = False
    bn_stats: str = "reduce"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i, ch in enumerate(self.channels):
            x = ConvBNReLU(
                ch,
                kernel=(3, 3),
                strides=(2, 2),
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                stats_impl=self.bn_stats,
                name=f"block{i}",
            )(x, train)
        x = jnp.mean(x, axis=(-3, -2))        # global average pool (NHWC)
        x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj")(x)
        return nn.relu(x)
