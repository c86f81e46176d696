"""On-device image augmentation, fused into the jitted train step.

BASELINE.json:5's north star: "the image path (decode, resize,
crop/flip/color-jitter, normalize) becomes a fused host-to-device
preprocessing stage". With `data.augment_device=True` the host only
decodes + resizes to `image_size + 2*crop_margin` (deterministic, so the
RAM image cache can hold final-size arrays); random crop, horizontal
flip, and color jitter run INSIDE the train step on uint8/compute-dtype
tensors, where XLA fuses them with the normalize and the stem conv.

Because XLA needs static shapes, the device-side crop is a fixed-size
window at a random offset within the margin (pad-and-crop augmentation)
rather than torchvision's variable-scale RandomResizedCrop -- the
host-side backends keep the torchvision-style version.

Temporal stacks share one draw per (sample, camera): same crop / flip /
jitter across the T frames (matching the host pipeline's temporal
consistency).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def device_augment(
    key: jax.Array,
    images: jax.Array,
    out_hw: int,
    hflip_prob: float = 0.0,
    jitter_brightness: float = 0.2,
    jitter_contrast: float = 0.2,
    jitter_saturation: float = 0.2,
    jitter_prob: float = 0.8,
    flip_mask: jax.Array = None,
) -> jax.Array:
    """(B, [T,] H, W, C) uint8 -> (B, [T,] out_hw, out_hw, C) float32.

    H = W = out_hw + 2*margin; the crop offset is uniform over the margin.
    Output is float32 in [0, 1] (the scale `normalize_images` expects for
    float input; the per-channel normalize downstream fuses with it).
    `flip_mask` (B,) bool, if given, replaces the per-camera flip draw --
    pose-mirror mode shares one flip per sample across cameras so the
    mirrored label stays consistent (VERDICT r1 missing-2).
    """
    temporal = images.ndim == 5
    if not temporal:
        images = images[:, None]
    b, t, h, w, c = images.shape
    if h < out_hw or w < out_hw:
        raise ValueError(f"source {h}x{w} smaller than crop {out_hw}")

    k_oy, k_ox, k_flip, k_jon, k_b, k_c, k_s = jax.random.split(key, 7)
    oy = jax.random.randint(k_oy, (b,), 0, h - out_hw + 1)
    ox = jax.random.randint(k_ox, (b,), 0, w - out_hw + 1)

    def crop_one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (0, y0, x0, 0), (t, out_hw, out_hw, c))

    x = jax.vmap(crop_one)(images, oy, ox).astype(jnp.float32) * (1.0 / 255.0)

    if flip_mask is not None:
        x = jnp.where(flip_mask.reshape(b, 1, 1, 1, 1),
                      x[:, :, :, ::-1, :], x)
    elif hflip_prob > 0:
        flip = jax.random.uniform(k_flip, (b, 1, 1, 1, 1)) < hflip_prob
        x = jnp.where(flip, x[:, :, :, ::-1, :], x)

    if jitter_prob > 0:
        on = (jax.random.uniform(k_jon, (b, 1, 1, 1, 1))
              < jitter_prob).astype(jnp.float32)

        def factor(k, amount):
            lo = max(0.0, 1.0 - amount)
            f = jax.random.uniform(k, (b, 1, 1, 1, 1), minval=lo,
                                   maxval=1.0 + amount)
            return 1.0 + on * (f - 1.0)   # off -> exactly 1.0

        if jitter_brightness > 0:
            x = x * factor(k_b, jitter_brightness)
        if jitter_contrast > 0:
            # per-frame GRAYSCALE mean anchor (torchvision adjust_contrast
            # convention, matching the host backends; ADVICE r1): shared
            # factor, per-frame anchor. Non-RGB falls back to channel mean.
            if c == 3:
                gray_m = (x[..., 0] * 0.299 + x[..., 1] * 0.587
                          + x[..., 2] * 0.114)
                m = jnp.mean(gray_m, axis=(2, 3), keepdims=True)[..., None]
            else:
                m = jnp.mean(x, axis=(2, 3, 4), keepdims=True)
            x = m + (x - m) * factor(k_c, jitter_contrast)
        if jitter_saturation > 0 and c == 3:
            # RGB only; non-3-channel cameras skip saturation
            gray = (x[..., 0:1] * 0.299 + x[..., 1:2] * 0.587
                    + x[..., 2:3] * 0.114)
            x = gray + (x - gray) * factor(k_s, jitter_saturation)
        x = jnp.clip(x, 0.0, 1.0)

    if not temporal:
        x = x[:, 0]
    return x


def augment_batch_images(
    key: jax.Array,
    batch: dict,
    cameras: Sequence[str],
    out_hw: int,
    hflip_prob: float = 0.0,
    hflip_pose_mirror: bool = False,
    hflip_mirror_axis: int = 0,
    hflip_mirror_center: float = 0.0,
    **kwargs,
) -> dict:
    """Apply device_augment to every camera (independent draws per camera,
    matching the host backends); returns a new batch dict.

    With hflip_pose_mirror, ONE flip draw per sample is shared by all
    cameras and the target pose is mirrored with the image
    (ops/pose_math.mirror_pose), keeping flipped pairs label-consistent."""
    from rgb_proprioceptive_pose_estimator_tpu.ops.pose_math import mirror_pose

    out = dict(batch)
    flip_mask = None
    if hflip_pose_mirror and hflip_prob > 0:
        b = batch["images"][cameras[0]].shape[0]
        # fold_in(len(cameras)): distinct from every per-camera key (0..n-1)
        flip_key = jax.random.fold_in(key, len(cameras))
        flip_mask = jax.random.uniform(flip_key, (b,)) < hflip_prob
        mpos, mquat = mirror_pose(batch["target_pos"], batch["target_quat"],
                                  axis=hflip_mirror_axis,
                                  center=hflip_mirror_center)
        out["target_pos"] = jnp.where(flip_mask[:, None],
                                      mpos, batch["target_pos"])
        out["target_quat"] = jnp.where(flip_mask[:, None],
                                       mquat, batch["target_quat"])
    images = dict(batch["images"])
    for i, cam in enumerate(cameras):
        images[cam] = device_augment(jax.random.fold_in(key, i),
                                     images[cam], out_hw,
                                     hflip_prob=hflip_prob,
                                     flip_mask=flip_mask, **kwargs)
    out["images"] = images
    return out
