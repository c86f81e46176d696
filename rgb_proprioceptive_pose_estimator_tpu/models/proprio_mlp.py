"""Proprioceptive state encoder: MLP over robot state vectors
(C3, BASELINE.json:5,7)."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ProprioMLP(nn.Module):
    """ReLU MLP: state vector (B, D) -> embedding (B, features).

    A (B, T, D) temporally-stacked input is flattened to (B, T*D)
    (C11, BASELINE.json:11)."""

    hidden: Tuple[int, ...] = (256, 256)
    features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s: jax.Array) -> jax.Array:
        if s.ndim > 2:
            s = s.reshape(s.shape[0], -1)
        x = s.astype(self.dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"dense{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj")(x)
        return nn.relu(x)
