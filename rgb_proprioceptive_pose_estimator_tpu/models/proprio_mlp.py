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
    # z-score the state vector with dataset statistics. The stats live in
    # the "batch_stats" collection (same flavor as BN running stats: data-
    # derived, non-trainable), so they ride checkpoints and StableHLO
    # exports with no extra plumbing; fit() writes them from the train
    # split when model.proprio_normalize is set.
    normalize: bool = False

    @nn.compact
    def __call__(self, s: jax.Array) -> jax.Array:
        if self.normalize:
            d = s.shape[-1]
            mean = self.variable("batch_stats", "proprio_mean",
                                 lambda: jnp.zeros((d,), jnp.float32))
            std = self.variable("batch_stats", "proprio_std",
                                lambda: jnp.ones((d,), jnp.float32))
            # per-state-dim, shared across temporal frames; f32 before the
            # compute-dtype cast
            s = (s.astype(jnp.float32) - mean.value) / std.value
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
