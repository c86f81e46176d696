"""Training-mode BatchNorm with MXU-routed statistics (custom VJP).

Why this exists (VERDICT r1 next-1/next-2): the profiler shows BN
statistic reductions at ~24% of the pr3 train step sustaining 120-370
GB/s -- per-channel reductions over (N,H,W) are VPU cross-lane work and
run far below HBM peak. Contractions on the MXU have no such limit, so
this module expresses every BN reduction (forward sum/sumsq, backward
sum(g) and sum(g*x)) as `lax.dot_general`s that stream the activation at
HBM bandwidth, and hand-writes the backward so autodiff doesn't turn the
Gram matmul into an extra full-size activation pass.

SPMD note (C12): all reductions are dot_generals contracting over the
batch dim; under pjit with the batch sharded on the 'data' mesh axis the
partitioner inserts the psum -- global-batch (sync-BN) statistics exactly
like the reduce path, asserted in tests/test_distributed.py.

Numerics: products of bf16 values are exact in f32 (8-bit mantissas), and
accumulation is f32 (`preferred_element_type`), so this matches the
reduce path up to summation order. Torch-semantics (biased variance for
normalization) are preserved; the running-stat update stays in the caller
(models/blocks.BatchNormAct).

The `mean`/`var` outputs exist for the caller's running-stat update; they
are treated as non-differentiable (their cotangents are ignored in the
VJP -- running stats never feed the loss). Grounding for the semantics:
BASELINE.json:5 ("conv+BN+ReLU blocks"); torch parity in tests/parity/.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rgb_proprioceptive_pose_estimator_tpu.ops.bn_stats import (
    channel_sum_sumsq_matmul,
)


def _stats(x: jax.Array, impl: str) -> Tuple[jax.Array, jax.Array]:
    """per-channel (sum, sumsq) in f32. impl: 'matmul' | 'pallas'."""
    if impl == "pallas":
        from rgb_proprioceptive_pose_estimator_tpu.ops.pallas_fused import (
            channel_stats,
        )
        return channel_stats(x)
    return channel_sum_sumsq_matmul(x)


def _fwd_impl(x, gamma, beta, eps: float, impl: str):
    n = x.size // x.shape[-1]
    s, ss = _stats(x, impl)
    mean = s / n
    var = jnp.maximum(ss / n - jnp.square(mean), 0.0)  # biased (torch norm)
    inv = jax.lax.rsqrt(var + eps)
    scale = gamma * inv
    bias = beta - mean * scale
    y = (x.astype(jnp.float32) * scale + bias).astype(x.dtype)
    return y, mean, var, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train(x: jax.Array, gamma: jax.Array, beta: jax.Array,
             eps: float = 1e-5, stats_impl: str = "matmul"):
    """Training BatchNorm: normalize x (..., C) by its own batch stats.

    Returns (y, mean, var): y has x's dtype; mean/var are f32 per-channel
    batch statistics (biased variance) for the running-stat update.
    Cotangents of mean/var are ignored by the custom VJP (see module doc).
    """
    y, mean, var, _ = _fwd_impl(x, gamma, beta, eps, stats_impl)
    return y, mean, var


def _bn_fwd(x, gamma, beta, eps, stats_impl):
    y, mean, var, inv = _fwd_impl(x, gamma, beta, eps, stats_impl)
    return (y, mean, var), (x, gamma, beta, mean, inv)


def _bn_bwd(eps, stats_impl, res, cts):
    x, gamma, beta, mean, inv = res
    g, _, _ = cts  # mean/var cotangents ignored (running-stats-only use)
    n = x.size // x.shape[-1]
    nd = x.ndim - 1
    reduce_dims = tuple(range(nd))

    # backward reductions on the MXU:
    #   sum_g  = ones . g
    #   cross  = diag(g^T x) = sum(g * x) per channel
    ones = jnp.ones(x.shape[:-1], g.dtype)
    sum_g = jax.lax.dot_general(
        ones, g, ((reduce_dims, reduce_dims), ((), ())),
        preferred_element_type=jnp.float32)
    cross = jnp.diagonal(jax.lax.dot_general(
        g, x, ((reduce_dims, reduce_dims), ((), ())),
        preferred_element_type=jnp.float32))

    sum_g_xhat = (cross - mean * sum_g) * inv   # = sum(g * xhat)
    dgamma = sum_g_xhat
    dbeta = sum_g

    # dx = (gamma*inv/n) * (n*g - sum_g - xhat*sum_g_xhat)
    #    = g*a + x*b + c   (per-channel a, b, c -- one fused pass over g, x)
    a = gamma * inv
    b = -gamma * jnp.square(inv) * sum_g_xhat / n
    c = -(a * sum_g / n) - b * mean
    dx = (g.astype(jnp.float32) * a + x.astype(jnp.float32) * b + c)
    return (dx.astype(x.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype))


bn_train.defvjp(_bn_fwd, _bn_bwd)
