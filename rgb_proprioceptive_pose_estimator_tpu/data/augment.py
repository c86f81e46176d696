"""Host-side uint8 image augmentations (C2, BASELINE.json:5,10).

decode -> resize -> random-resized-crop -> hflip -> color-jitter, all in
uint8/float32 ON HOST; per-channel normalization is deferred to the device
where it fuses into the first conv (SURVEY.md section 4.4 "normalize
deferred to device"). Eval path is deterministic: center crop + resize
(SURVEY.md section 4.2).

Two pixel backends share ONE parameter sampler (`sample_aug_params`, numpy
RNG), so augmentation *randomness* is backend-independent:

  * numpy/opencv (this file) -- reference implementation and fallback;
  * the native C++ engine (runtime/csrc/augment.cc via ctypes) -- the
    throughput path for the 160k images/sec host budget (SURVEY.md
    section 8 hard-part 1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)  # threading is managed by the pipeline workers
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


class AugParams(NamedTuple):
    """Resolved per-sample augmentation: square crop window + flip + jitter
    factors (<= 0 disables that jitter component)."""

    y0: int
    x0: int
    size: int
    flip: bool
    brightness: float
    contrast: float
    saturation: float


def sample_aug_params(
    h: int,
    w: int,
    rng: np.random.RandomState,
    crop_scale: Tuple[float, float] = (0.8, 1.0),
    hflip_prob: float = 0.5,
    jitter_brightness: float = 0.2,
    jitter_contrast: float = 0.2,
    jitter_saturation: float = 0.2,
    jitter_prob: float = 0.8,
) -> AugParams:
    """Draw augmentation parameters (the ONLY source of randomness)."""
    area = h * w
    target = rng.uniform(crop_scale[0], crop_scale[1]) * area
    s = int(round(np.sqrt(target)))
    s = max(1, min(s, h, w))
    y0 = rng.randint(0, h - s + 1)
    x0 = rng.randint(0, w - s + 1)
    flip = hflip_prob > 0 and rng.uniform() < hflip_prob
    fb = fc = fs = 0.0
    if jitter_prob > 0 and rng.uniform() < jitter_prob:
        if jitter_brightness > 0:
            fb = rng.uniform(max(0.0, 1 - jitter_brightness),
                             1 + jitter_brightness)
        if jitter_contrast > 0:
            fc = rng.uniform(max(0.0, 1 - jitter_contrast),
                             1 + jitter_contrast)
        if jitter_saturation > 0:
            fs = rng.uniform(max(0.0, 1 - jitter_saturation),
                             1 + jitter_saturation)
    return AugParams(y0, x0, s, flip, fb, fc, fs)


# ---------------------------------------------------------------------------
# numpy/opencv pixel backend
# ---------------------------------------------------------------------------


def decode_image(buf: np.ndarray) -> np.ndarray:
    """JPEG/PNG bytes (1-D uint8) -> RGB uint8 HWC (C2 "decode",
    BASELINE.json:5; VERDICT r1 missing-3). Bytes are produced/consumed in
    standard channel order (files are viewable by any image tool)."""
    if not _HAS_CV2:
        raise RuntimeError(
            "opencv is required to decode encoded image observations")
    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("cv2.imdecode failed: not a decodable image")
    return np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB


def encode_image(img: np.ndarray, ext: str = ".jpg",
                 quality: int = 95) -> np.ndarray:
    """RGB uint8 HWC -> encoded bytes (1-D uint8). Inverse of decode_image
    (lossy for JPEG)."""
    if not _HAS_CV2:
        raise RuntimeError("opencv is required to encode images")
    params = ([int(cv2.IMWRITE_JPEG_QUALITY), quality]
              if ext in (".jpg", ".jpeg") else [])
    ok, buf = cv2.imencode(ext, img[..., ::-1], params)
    if not ok:
        raise ValueError(f"cv2.imencode({ext!r}) failed")
    return buf.reshape(-1)


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


def hflip(img: np.ndarray) -> np.ndarray:
    return img[:, ::-1]


def jitter_with_factors(img: np.ndarray, fb: float, fc: float,
                        fs: float) -> np.ndarray:
    """Apply brightness/contrast/saturation with explicit factors
    (<= 0 skips), in fixed b->c->s order (torchvision samples a random
    order; the fixed order is this framework's documented convention).
    Contrast anchors on the mean of the GRAYSCALE image like torchvision's
    adjust_contrast (ADVICE r1); non-RGB channel counts fall back to the
    channel mean."""
    x = img.astype(np.float32)
    if fb > 0:
        x *= fb
    if fc > 0:
        if x.shape[-1] == 3:
            m = (x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
                 ).mean(dtype=np.float32)
        else:
            m = x.mean(dtype=np.float32)
        x = m + (x - m) * fc
    if fs > 0:
        gray = x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        x = gray[..., None] + (x - gray[..., None]) * fs
    return np.clip(x, 0, 255).astype(np.uint8)


def apply_aug_params(img: np.ndarray, p: AugParams,
                     out_hw: int) -> np.ndarray:
    """Apply resolved params to one uint8 HWC image (numpy backend)."""
    img = resize(img[p.y0:p.y0 + p.size, p.x0:p.x0 + p.size], out_hw)
    if p.flip:
        img = hflip(img)
    if p.brightness > 0 or p.contrast > 0 or p.saturation > 0:
        img = jitter_with_factors(img, p.brightness, p.contrast, p.saturation)
    return np.ascontiguousarray(img)


def augment_image(img: np.ndarray, out_hw: int,
                  rng: np.random.RandomState, **kwargs) -> np.ndarray:
    """Sample + apply in one call (convenience / tests)."""
    p = sample_aug_params(img.shape[0], img.shape[1], rng, **kwargs)
    return apply_aug_params(img, p, out_hw)
