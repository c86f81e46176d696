"""BatchNorm per-channel statistics routed through the MXU.

The round-1 profiler trace (docs/DESIGN.md roofline) shows the BN
statistics *reduce* fusions at ~24% of the pr3 train step sustaining only
~270 GB/s -- a third of v5e HBM peak: per-channel reductions over
(N, H, W) put the reduction on the lane/sublane axes where the VPU's
cross-lane throughput, not HBM, is the limit.

The MXU has no such limit: a contraction over every non-channel dim
streams the activation at full HBM bandwidth and accumulates in f32.

    sum_c   = ones(N,H,W) . x          (rank-3 contraction -> (C,))
    sumsq_c = diag(x . x)              (Gram matrix, contraction over
                                        N,H,W -> (C, C); the diagonal is
                                        the per-channel sum of squares)

Exactness: bf16 inputs with `preferred_element_type=f32` multiply exactly
(8-bit mantissa products fit f32) and accumulate in f32, matching the
reference path `mean(x.astype(f32)^2)` up to summation order.

The Gram matrix computes C^2 entries to use C of them; at ResNet widths
(C <= 512) the extra FLOPs are noise next to the HBM stream (the op stays
bandwidth-bound), and XLA fuses the diagonal extraction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def channel_sum_sumsq_matmul(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., C) -> per-channel (sum, sum of squares), f32, via the MXU."""
    nd = x.ndim - 1
    reduce_dims = tuple(range(nd))
    ones = jnp.ones(x.shape[:-1], x.dtype)
    s = jax.lax.dot_general(
        ones, x, ((reduce_dims, reduce_dims), ((), ())),
        preferred_element_type=jnp.float32)
    gram = jax.lax.dot_general(
        x, x, ((reduce_dims, reduce_dims), ((), ())),
        preferred_element_type=jnp.float32)
    return s, jnp.diagonal(gram)


def channel_mean_meansq_matmul(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., C) -> per-channel (mean, mean of squares), f32, via the MXU."""
    n = x.size // x.shape[-1]
    s, ss = channel_sum_sumsq_matmul(x)
    return s / n, ss / n
