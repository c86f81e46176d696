"""Conv + BatchNorm + ReLU building block (BASELINE.json:5).

BatchNorm is hand-rolled (not `flax.linen.BatchNorm`) for two reasons:

1. **Torch-parity semantics** (SURVEY.md section 8 hard-part 2): the running
   stats use torch's update convention (`running = (1-m_t)*running +
   m_t*batch` with torch momentum `m_t = 1 - self.momentum`), torch's
   *unbiased* variance for the running update, and biased variance for
   normalization -- verified against torch in tests/parity.
2. **Fusion control**: normalization is algebraically folded into a single
   per-channel `scale*x + bias` followed by ReLU, which either fuses in XLA
   or dispatches to the hand-written Pallas epilogue kernel
   (`ops/pallas_fused.scale_bias_relu`) when `use_pallas=True`.

Cross-replica note (C12/C13): under pjit with the batch sharded on the
'data' mesh axis, the batch-statistics reductions below are *global-batch*
reductions -- XLA inserts the psum over ICI automatically. That makes
multi-chip training numerically identical to single-chip training at the
same global batch (asserted in tests/test_distributed.py).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch's nn.init.kaiming_normal_(mode="fan_out", nonlinearity="relu") --
# the torchvision-ResNet conv init.
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BatchNormAct(nn.Module):
    """BatchNorm (torch semantics) + optional ReLU, fused as scale/bias.

    `stats_impl` picks how training-mode batch statistics (and the
    backward reductions) are computed:

    - "reduce": XLA reduce fusions (the round-1 path; 120-370 GB/s
      measured in-step on v5e -- per-channel reductions are VPU
      cross-lane work).
    - "matmul": `ops/fused_bn.bn_train` -- every reduction routed through
      the MXU as a dot_general (streams activations at HBM bandwidth) with
      a hand-written VJP. SPMD-safe (contractions over the sharded batch
      dim psum automatically).
    - "pallas": same fused BN but forward stats from the one-pass Pallas
      kernel (`ops/pallas_fused.channel_stats`). Single-device only
      (pallas_call is not SPMD-partitionable) -- enforced by the
      mesh-size check in engine/loop.fit() (tests/test_train_smoke.py).

    All three share the identical running-stat update and eval path.
    """

    momentum: float = 0.9          # flax convention; torch momentum = 1 - this
    eps: float = 1e-5
    act: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False
    stats_impl: str = "reduce"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        feat = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )

        y = None
        if train:
            if self.stats_impl != "reduce":
                from rgb_proprioceptive_pose_estimator_tpu.ops.fused_bn import (
                    bn_train,
                )

                y, mean, var = bn_train(x, gamma, beta, self.eps,
                                        self.stats_impl)
            else:
                axes = tuple(range(x.ndim - 1))
                # reduce the (possibly bf16) input with an f32 accumulator;
                # XLA fuses the convert into the reduction
                mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
                mean_sq = jnp.mean(
                    jnp.square(x.astype(jnp.float32)), axis=axes)
                # biased variance for normalization (torch behavior)
                var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = math.prod(x.shape[:-1])
                unbiased = var * (n / max(n - 1, 1))
                m_t = 1.0 - self.momentum  # torch momentum
                ra_mean.value = self.momentum * ra_mean.value + m_t * mean
                ra_var.value = self.momentum * ra_var.value + m_t * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        if y is None:
            inv = jax.lax.rsqrt(var + self.eps)
            scale = gamma * inv
            bias = beta - mean * scale

            if self.use_pallas and self.act:
                from rgb_proprioceptive_pose_estimator_tpu.ops.pallas_fused import (
                    scale_bias_relu,
                )

                return scale_bias_relu(x, scale, bias).astype(self.dtype)

            y = x.astype(jnp.float32) * scale + bias
        if self.act:
            y = jnp.maximum(y, 0.0)
        return y.astype(self.dtype)


class ConvBNReLU(nn.Module):
    """conv -> BN -> ReLU, the unit that lowers to a Pallas/XLA fusion
    (BASELINE.json:5)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bn: bool = True
    act: bool = True
    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Any = jnp.float32
    use_pallas: bool = False
    stats_impl: str = "reduce"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_out,
            name="conv",
        )(x)
        if self.use_bn:
            x = BatchNormAct(
                momentum=self.momentum,
                eps=self.eps,
                act=self.act,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                stats_impl=self.stats_impl,
                name="bn",
            )(x, train)
        elif self.act:
            x = nn.relu(x)
        return x
