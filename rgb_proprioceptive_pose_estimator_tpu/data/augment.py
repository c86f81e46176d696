"""Host-side uint8 image augmentations (C2, BASELINE.json:5,10).

decode -> resize -> random-resized-crop -> hflip -> color-jitter, all in
uint8/float32 numpy+opencv ON HOST; per-channel normalization is deferred
to the device where it fuses into the first conv
(SURVEY.md section 4.4 "normalize deferred to device").

Eval path is deterministic: resize + center crop only
(SURVEY.md section 4.2).

When the native C++ shim (runtime/) is built, `data/pipeline.py` routes
crop+flip+jitter through it; these numpy versions are the reference
implementation and the fallback, and both are covered by the same tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)  # threading is managed by the pipeline workers
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def resize(img: np.ndarray, out_hw: int) -> np.ndarray:
    """uint8 HWC resize (bilinear)."""
    if img.shape[0] == out_hw and img.shape[1] == out_hw:
        return img
    if _HAS_CV2:
        return cv2.resize(img, (out_hw, out_hw), interpolation=cv2.INTER_LINEAR)
    # numpy nearest fallback
    ys = (np.arange(out_hw) * img.shape[0] / out_hw).astype(np.int64)
    xs = (np.arange(out_hw) * img.shape[1] / out_hw).astype(np.int64)
    return img[ys][:, xs]


def center_crop_resize(img: np.ndarray, out_hw: int) -> np.ndarray:
    """Deterministic eval transform: center square crop + resize."""
    h, w = img.shape[:2]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    return resize(img[y0:y0 + s, x0:x0 + s], out_hw)


def random_resized_crop(img: np.ndarray, out_hw: int,
                        scale: Tuple[float, float],
                        rng: np.random.RandomState) -> np.ndarray:
    """torchvision-style RandomResizedCrop restricted to square aspect."""
    h, w = img.shape[:2]
    area = h * w
    target = rng.uniform(scale[0], scale[1]) * area
    s = int(round(np.sqrt(target)))
    s = max(1, min(s, h, w))
    y0 = rng.randint(0, h - s + 1)
    x0 = rng.randint(0, w - s + 1)
    return resize(img[y0:y0 + s, x0:x0 + s], out_hw)


def hflip(img: np.ndarray) -> np.ndarray:
    return img[:, ::-1]


def color_jitter(img: np.ndarray, brightness: float, contrast: float,
                 saturation: float, rng: np.random.RandomState) -> np.ndarray:
    """Random brightness/contrast/saturation in float32, clipped to uint8.
    Factors ~ U[1-x, 1+x], torchvision convention."""
    x = img.astype(np.float32)
    if brightness > 0:
        x *= rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        x = x.mean(dtype=np.float32) + (x - x.mean(dtype=np.float32)) * f
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        gray = x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        x = gray[..., None] + (x - gray[..., None]) * f
    return np.clip(x, 0, 255).astype(np.uint8)


def augment_image(
    img: np.ndarray,
    out_hw: int,
    rng: np.random.RandomState,
    crop_scale: Tuple[float, float] = (0.8, 1.0),
    hflip_prob: float = 0.5,
    jitter_brightness: float = 0.2,
    jitter_contrast: float = 0.2,
    jitter_saturation: float = 0.2,
    jitter_prob: float = 0.8,
) -> np.ndarray:
    """Full train-time augmentation of one uint8 HWC image."""
    img = random_resized_crop(img, out_hw, crop_scale, rng)
    if hflip_prob > 0 and rng.uniform() < hflip_prob:
        img = hflip(img)
    if jitter_prob > 0 and rng.uniform() < jitter_prob:
        img = color_jitter(img, jitter_brightness, jitter_contrast,
                           jitter_saturation, rng)
    return np.ascontiguousarray(img)
