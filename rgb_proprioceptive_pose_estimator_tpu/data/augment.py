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


# ---------------------------------------------------------------------------
# Vectorized counter-based parameter sampling (VERDICT r1 weak-4): one
# numpy pass draws every sample's augmentation parameters -- no per-sample
# RandomState construction in the pipeline workers' GIL hot path.
# ---------------------------------------------------------------------------


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = z + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hashed_uniforms(seeds: np.ndarray, k: int) -> np.ndarray:
    """(n, k) uniforms in [0, 1): counter-based splitmix64 hash of
    (seed, column). Deterministic in the seed values alone -- independent
    of worker count, call order, and batch composition."""
    s = np.asarray(seeds, dtype=np.uint64)
    ctr = (s[:, None] * np.uint64(0x100000001B3)
           + np.arange(k, dtype=np.uint64)[None, :])
    z = _splitmix64(ctr)
    return (z >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)


def sample_aug_params_batch(
    hs: np.ndarray,
    ws: np.ndarray,
    seeds: np.ndarray,
    crop_scale: Tuple[float, float] = (1.0, 1.0),
    hflip_prob: float = 0.0,
    jitter_brightness: float = 0.2,
    jitter_contrast: float = 0.2,
    jitter_saturation: float = 0.2,
    jitter_prob: float = 0.8,
):
    """Vectorized batch equivalent of `sample_aug_params`: same parameter
    distributions, drawn from the counter-based stream (the per-sample
    RandomState stream of `sample_aug_params` remains for the single-image
    API). Returns a dict of arrays:
    {y0, x0, size (int32), flip (bool), brightness, contrast, saturation
    (float32; 0 disables the component)}."""
    hs = np.asarray(hs, dtype=np.int64)
    ws = np.asarray(ws, dtype=np.int64)
    n = len(seeds)
    u = hashed_uniforms(seeds, 8)

    lo, hi = crop_scale
    target = (lo + u[:, 0] * (hi - lo)) * (hs * ws)
    s = np.round(np.sqrt(target)).astype(np.int64)
    s = np.clip(s, 1, np.minimum(hs, ws))
    # uniform integer in [0, h-s]: floor(u * (h-s+1)), u < 1 exactly
    y0 = (u[:, 1] * (hs - s + 1)).astype(np.int64)
    x0 = (u[:, 2] * (ws - s + 1)).astype(np.int64)

    flip = (u[:, 3] < hflip_prob) if hflip_prob > 0 else np.zeros(n, bool)
    on = (u[:, 4] < jitter_prob) if jitter_prob > 0 else np.zeros(n, bool)

    def factor(col: np.ndarray, amount: float) -> np.ndarray:
        if amount <= 0:
            return np.zeros(n, np.float32)
        f_lo = max(0.0, 1.0 - amount)
        f = f_lo + col * (1.0 + amount - f_lo)
        return np.where(on, f, 0.0).astype(np.float32)

    return {
        "y0": y0.astype(np.int32),
        "x0": x0.astype(np.int32),
        "size": s.astype(np.int32),
        "flip": flip,
        "brightness": factor(u[:, 5], jitter_brightness),
        "contrast": factor(u[:, 6], jitter_contrast),
        "saturation": factor(u[:, 7], jitter_saturation),
    }


def params_row(pb: dict, i: int) -> AugParams:
    """AugParams view of row i of a `sample_aug_params_batch` result (for
    the per-image numpy pixel backend)."""
    return AugParams(int(pb["y0"][i]), int(pb["x0"][i]), int(pb["size"][i]),
                     bool(pb["flip"][i]), float(pb["brightness"][i]),
                     float(pb["contrast"][i]), float(pb["saturation"][i]))


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
