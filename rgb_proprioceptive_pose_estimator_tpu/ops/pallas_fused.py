"""Hand-written Pallas TPU kernels for the memory-bound hot ops.

Two kernels (SURVEY.md section 3.1 "native-code ledger"):

1. ``pallas_normalize_u8`` -- the fused host-to-device input stage
   (BASELINE.json:5): uint8 image -> compute-dtype ``(x/255 - mean)/std``
   in one pass over HBM. Memory-bound; fusing the cast with the affine
   normalize halves the HBM traffic vs materializing an f32 intermediate.

2. ``scale_bias_relu`` -- the fused per-channel affine + ReLU epilogue of a
   conv+BN+ReLU block (BASELINE.json:5 "conv+BN+ReLU blocks lower to
   Pallas/XLA fusions"), with a custom VJP so it is usable in training.
   BN statistics (reductions) stay in XLA; the elementwise apply is Pallas.

Both are flag-gated (`ModelConfig.use_pallas`); the XLA fusion path is the
default-correct fallback (SURVEY.md section 8 hard-part 4). On CPU backends
the kernels run in Pallas interpreter mode so the unit tests exercise the
same code path.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Pallas TPU kernels only compile on TPU; interpret elsewhere (CPU tests).
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Kernel 1: fused uint8 -> normalized compute-dtype image stage
# ---------------------------------------------------------------------------


def _normalize_kernel(x_ref, scale_ref, shift_ref, o_ref):
    # mosaic has no unsigned->float cast; route uint8 through int32
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (x * scale_ref[:] + shift_ref[:]).astype(o_ref.dtype)


def normalize_u8_supported(shape: Tuple[int, ...]) -> bool:
    """True if pallas_normalize_u8 handles this image shape (the flattened
    element count must tile into LANE = lcm(C, 128) columns)."""
    c = shape[-1]
    lane = (c * 128) // math.gcd(c, 128)
    return math.prod(shape) % lane == 0


def pallas_normalize_u8(
    images: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
    dtype: jnp.dtype,
) -> jax.Array:
    """uint8 (..., C) -> dtype, ((x/255) - mean) / std, one fused pass.

    The image is viewed as (rows, LANE) with LANE = lcm(C, 128) so the
    per-channel constants become a periodic LANE-vector broadcast down the
    sublane axis -- this sidesteps the C=3 lane-tiling problem (TPU lane
    dim wants multiples of 128; see pallas_guide 'Tiling Constraints').

    Raises on unsupported shapes; callers (image_device.normalize_images)
    check `normalize_u8_supported` and keep the single XLA fallback there.
    """
    if images.dtype != jnp.uint8:
        raise ValueError("pallas_normalize_u8 expects uint8 input")
    c = images.shape[-1]
    if len(mean) != c:
        raise ValueError("stats length must equal channel dim")
    if not normalize_u8_supported(images.shape):
        raise ValueError(f"shape {images.shape} does not tile into "
                         "lcm(C,128) lanes; use the XLA path")

    total = math.prod(images.shape)
    lane = (c * 128) // math.gcd(c, 128)
    rows = total // lane
    reps = lane // c
    # x_norm = u8 * (1/(255*std)) + (-mean/std), tiled to the LANE period
    scale_c = [1.0 / (255.0 * s) for s in std]
    shift_c = [-m / s for m, s in zip(mean, std)]
    scale = jnp.asarray(scale_c * reps, jnp.float32).reshape(1, lane)
    shift = jnp.asarray(shift_c * reps, jnp.float32).reshape(1, lane)

    x2d = images.reshape(rows, lane)
    block_rows = min(rows, 1024)
    grid = (pl.cdiv(rows, block_rows),)

    out = pl.pallas_call(
        _normalize_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, lane), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lane), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lane), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, lane), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, lane), dtype),
        interpret=_interpret(),
    )(x2d, scale, shift)
    return out.reshape(images.shape)


# ---------------------------------------------------------------------------
# Kernel: one-pass per-channel (sum, sum of squares) -- BN statistics
# ---------------------------------------------------------------------------


def _channel_stats_kernel(x_ref, sum_ref, ss_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    acc_ref[0:1, :] += jnp.sum(x, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        sum_ref[...] = acc_ref[0:1, :]
        ss_ref[...] = acc_ref[1:2, :]


def channel_stats_supported(shape: Tuple[int, ...]) -> bool:
    """True if `channel_stats` handles this shape: the flattened element
    count must tile into LANE = lcm(C, 128) columns (always true for the
    ResNet activation shapes)."""
    c = shape[-1]
    lane = (c * 128) // math.gcd(c, 128)
    return math.prod(shape) % (lane * 8) == 0


def channel_stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., C) -> per-channel (sum, sum of squares), f32, ONE read of x.

    The alternative stats paths read x once per statistic (XLA reduce
    fusion, 120-370 GB/s measured in-step) or once per matmul operand
    (ops/bn_stats.py); this kernel computes both while streaming x exactly
    once. Layout trick shared with `pallas_normalize_u8`: x is viewed as
    (rows, LANE) with LANE = lcm(C, 128), so channel j lives at lanes
    {j mod C} and the reduction runs down the SUBLANE axis -- the fast VPU
    direction -- producing a (1, LANE) partial that the caller folds to
    (C,) with a tiny XLA reshape-sum. Grid iterations run sequentially on
    the core, so a (2, LANE) f32 VMEM scratch accumulates across blocks.

    Not SPMD-partitionable: under a sharded batch use the matmul path
    (ops/bn_stats.py) -- enforced by the mesh-size check in
    engine/loop.fit() (bn_stats='pallas' requires a 1-device mesh).
    """
    c = x.shape[-1]
    if not channel_stats_supported(x.shape):
        raise ValueError(f"shape {x.shape} does not tile into lcm(C,128) "
                         "lanes; use the matmul/reduce path")
    lane = (c * 128) // math.gcd(c, 128)
    rows = math.prod(x.shape) // lane
    x2d = x.reshape(rows, lane)
    # largest power-of-two block <= 2048 rows that divides rows
    br = 2048
    while rows % br:
        br //= 2
    grid = (rows // br,)
    s, ss = pl.pallas_call(
        _channel_stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((br, lane), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, lane), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lane), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, lane), jnp.float32),
            jax.ShapeDtypeStruct((1, lane), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, lane), jnp.float32)],
        interpret=_interpret(),
    )(x2d)
    # fold the LANE-periodic partials to per-channel values (tiny, fused)
    return (s.reshape(lane // c, c).sum(0),
            ss.reshape(lane // c, c).sum(0))


# ---------------------------------------------------------------------------
# Kernel 2: fused per-channel scale*x + bias -> ReLU (BN-apply epilogue)
# ---------------------------------------------------------------------------


def _sbr_kernel(x_ref, s_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    y = jnp.maximum(x * s_ref[:] + b_ref[:], 0.0)
    o_ref[:] = y.astype(o_ref.dtype)


def _sbr_forward(x2d: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    m, c = x2d.shape
    block_m = min(m, 1024)
    grid = (pl.cdiv(m, block_m),)
    return pl.pallas_call(
        _sbr_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        interpret=_interpret(),
    )(x2d, scale, bias)


@jax.custom_vjp
def scale_bias_relu(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """relu(x * scale + bias) with per-channel (last-dim) scale/bias.

    x: (..., C) any float dtype; scale/bias: (C,) float32. Forward is a
    Pallas kernel; backward is closed-form in XLA:
        mask   = (x*scale + bias) > 0
        dx     = g * mask * scale
        dscale = sum(g * mask * x);  dbias = sum(g * mask)
    """
    c = x.shape[-1]
    y2d = _sbr_forward(x.reshape(-1, c), scale.reshape(1, c), bias.reshape(1, c))
    return y2d.reshape(x.shape)


def _sbr_fwd(x, scale, bias):
    return scale_bias_relu(x, scale, bias), (x, scale, bias)


def _sbr_bwd(res, g):
    x, scale, bias = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    pre = xf * scale + bias
    mask = (pre > 0).astype(jnp.float32)
    gm = gf * mask
    dx = (gm * scale).astype(x.dtype)
    reduce_axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gm * xf, axis=reduce_axes).astype(scale.dtype)
    dbias = jnp.sum(gm, axis=reduce_axes).astype(bias.dtype)
    return dx, dscale, dbias


scale_bias_relu.defvjp(_sbr_fwd, _sbr_bwd)
