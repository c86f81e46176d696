"""On-device image normalization stage.

The host pipeline ships images as uint8 (4x less PCIe/DMA traffic than f32);
the device does ``uint8 -> compute-dtype, (x/255 - mean)/std`` as the first
op of the model graph so XLA fuses it into the first convolution
(BASELINE.json:5 "fused host-to-device preprocessing stage";
SURVEY.md section 3.1 item 2).

An optional Pallas kernel (`ops/pallas_fused.py`) provides the same fusion
hand-written; the XLA path is the default-correct fallback.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def normalize_images(
    images: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
    dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
) -> jax.Array:
    """uint8/float images (..., H, W, C) -> normalized `dtype` images.

    Accepts uint8 in [0,255] or float already scaled to [0,1].
    `mean`/`std` are per-channel in [0,1] units (imagenet convention).
    """
    c = images.shape[-1]
    if len(mean) != len(std):
        raise ValueError(
            f"mean ({len(mean)}) and std ({len(std)}) lengths differ")
    nch = len(mean)
    # temporal channel-stacking replicates channels T times; tile stats to match
    if c != nch:
        if c % nch != 0:
            raise ValueError(f"channel dim {c} not a multiple of stats len {nch}")
        reps = c // nch
        mean = tuple(mean) * reps
        std = tuple(std) * reps

    if use_pallas and images.dtype == jnp.uint8:
        from rgb_proprioceptive_pose_estimator_tpu.ops.pallas_fused import (
            normalize_u8_supported,
            pallas_normalize_u8,
        )

        if normalize_u8_supported(images.shape):
            return pallas_normalize_u8(images, mean, std, dtype)
        # unsupported tiling: fall through to the (single) XLA path below

    m = jnp.asarray(mean, dtype=jnp.float32)
    s = jnp.asarray(std, dtype=jnp.float32)
    if images.dtype == jnp.uint8:
        x = images.astype(jnp.float32) * (1.0 / 255.0)
    else:
        x = images.astype(jnp.float32)
    x = (x - m) / s
    return x.astype(dtype)
