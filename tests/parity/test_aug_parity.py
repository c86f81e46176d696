"""Color-jitter / RandomResizedCrop parity (C2, BASELINE.json:5,10;
VERDICT r1 missing-6).

torchvision itself is not in the image (same situation as the model
twins), so the oracle is a hand-built torch twin of torchvision's
*tensor* functional math: `_rgb2hsv`/`_hsv2rgb` + `adjust_hue` ported
line-for-line from torchvision.transforms.v2.functional (public source),
run in float64 torch. The numpy backend must agree within 1 uint8 LSB;
the C++ engine is separately pinned to the numpy backend within 2 LSB in
tests/test_native.py."""

import numpy as np
import pytest
import torch

from rgb_proprioceptive_pose_estimator_tpu.data import augment as aug


def _rgb2hsv_tv(img: torch.Tensor) -> torch.Tensor:
    # torchvision.transforms._functional_tensor._rgb2hsv (CHW float)
    r, g, b = img.unbind(dim=-3)
    maxc = torch.max(img, dim=-3).values
    minc = torch.min(img, dim=-3).values
    eqc = maxc == minc
    cr = maxc - minc
    ones = torch.ones_like(maxc)
    s = cr / torch.where(eqc, ones, maxc)
    cr_divisor = torch.where(eqc, ones, cr)
    rc = (maxc - r) / cr_divisor
    gc = (maxc - g) / cr_divisor
    bc = (maxc - b) / cr_divisor
    hr = (maxc == r) * (bc - gc)
    hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
    hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    h = hr + hg + hb
    h = torch.fmod((h / 6.0 + 1.0), 1.0)
    return torch.stack((h, s, maxc), dim=-3)


def _hsv2rgb_tv(img: torch.Tensor) -> torch.Tensor:
    h, s, v = img.unbind(dim=-3)
    i = torch.floor(h * 6.0)
    f = (h * 6.0) - i
    i = i.to(dtype=torch.int32)
    p = torch.clamp((v * (1.0 - s)), 0.0, 1.0)
    q = torch.clamp((v * (1.0 - s * f)), 0.0, 1.0)
    t = torch.clamp((v * (1.0 - s * (1.0 - f))), 0.0, 1.0)
    i = i % 6
    mask = i.unsqueeze(dim=-3) == torch.arange(6, device=i.device).view(
        -1, 1, 1)
    a1 = torch.stack((v, q, p, p, t, v), dim=-3)
    a2 = torch.stack((t, v, v, q, p, p), dim=-3)
    a3 = torch.stack((p, p, t, v, v, q), dim=-3)
    a4 = torch.stack((a1, a2, a3), dim=-4)
    return torch.einsum("...ijk, ...xijk -> ...xjk", mask.to(img.dtype), a4)


def _adjust_hue_tv(img_u8_hwc: np.ndarray, factor: float) -> np.ndarray:
    """torchvision F.adjust_hue for uint8 input (tensor path): to float,
    rgb->hsv, h += factor mod 1, hsv->rgb, back to uint8 (truncating
    convert_image_dtype convention: x * 255.999...)."""
    x = torch.from_numpy(img_u8_hwc.astype(np.float64) / 255.0)
    x = x.permute(2, 0, 1)
    hsv = _rgb2hsv_tv(x)
    h, s, v = hsv.unbind(dim=-3)
    h = (h + factor) % 1.0
    rgb = _hsv2rgb_tv(torch.stack((h, s, v), dim=-3))
    out = (rgb.permute(1, 2, 0).numpy() * (255.0 + 1.0 - 1e-3))
    return np.clip(np.floor(out), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("factor", [-0.5, -0.23, 0.11, 0.31, 0.5])
def test_adjust_hue_matches_torchvision_math(factor):
    rs = np.random.RandomState(42)
    img = rs.randint(0, 256, size=(31, 29, 3), dtype=np.uint8)
    ref = _adjust_hue_tv(img, factor)
    got = np.clip(aug.adjust_hue(img.astype(np.float32), factor),
                  0, 255).astype(np.uint8)
    diff = np.abs(got.astype(int) - ref.astype(int))
    # float32 (product) vs float64 (oracle) arithmetic lands on opposite
    # sides of integer boundaries for a fraction of pixels: 1 LSB max
    assert diff.max() <= 1, f"max diff {diff.max()} at factor {factor}"


def test_adjust_hue_identity_and_full_turn():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, size=(16, 16, 3), dtype=np.uint8).astype(
        np.float32)
    np.testing.assert_allclose(aug.adjust_hue(img, 0.0), img, atol=0.51)
    # +0.5 then +0.5 returns to the original hue
    twice = aug.adjust_hue(np.clip(aug.adjust_hue(img, 0.5), 0, 255), 0.5)
    np.testing.assert_allclose(twice, img, atol=1.01)


def test_rrc_windows_respect_torchvision_ratio_bounds():
    """Batch sampler: windows obey the aspect-ratio bounds (up to integer
    rounding) and fall back to the clamped center crop exactly like
    torchvision RandomResizedCrop.get_params."""
    n = 20_000
    seeds = np.arange(n, dtype=np.int64) * 13 + 1
    hs = np.full(n, 100, np.int64)
    ws = np.full(n, 120, np.int64)
    pb = aug.sample_aug_params_batch(
        hs, ws, seeds, crop_scale=(0.3, 1.0), crop_ratio=(0.75, 4 / 3),
        hflip_prob=0.0, jitter_prob=0.0)
    ratio = pb["cw"].astype(float) / pb["ch"]
    # rounding of w,h can push the realized ratio slightly past the bounds
    assert ratio.min() > 0.75 * 0.95 and ratio.max() < 4 / 3 * 1.05
    assert (pb["y0"] + pb["ch"] <= 100).all()
    assert (pb["x0"] + pb["cw"] <= 120).all()
    # aspect should actually vary (log-uniform), not collapse to square
    assert (np.abs(ratio - 1.0) > 0.05).mean() > 0.5

    # extreme ratio demand -> torchvision fallback: full-height window of
    # width round(h * r_hi), centered
    pb2 = aug.sample_aug_params_batch(
        hs[:100], ws[:100], seeds[:100], crop_scale=(0.999, 1.0),
        crop_ratio=(3.0, 3.0), hflip_prob=0.0, jitter_prob=0.0)
    # in_ratio = 1.2 < 3.0 -> w = W, h = round(W / 3)
    np.testing.assert_array_equal(pb2["cw"], 120)
    np.testing.assert_array_equal(pb2["ch"], 40)
    np.testing.assert_array_equal(pb2["y0"], (100 - 40) // 2)
    np.testing.assert_array_equal(pb2["x0"], 0)


def test_single_and_batch_samplers_same_distribution():
    """The per-sample RandomState sampler and the counter-based batch
    sampler draw from the same distributions (moments within tolerance)."""
    n = 8000
    rs = np.random.RandomState(7)
    singles = [aug.sample_aug_params(
        90, 90, rs, crop_scale=(0.4, 1.0), crop_ratio=(0.8, 1.25),
        hflip_prob=0.5, jitter_brightness=0.3, jitter_contrast=0.3,
        jitter_saturation=0.3, jitter_hue=0.2, jitter_prob=0.7)
        for _ in range(n)]
    seeds = np.arange(n, dtype=np.int64) * 31 + 5
    pb = aug.sample_aug_params_batch(
        np.full(n, 90), np.full(n, 90), seeds,
        crop_scale=(0.4, 1.0), crop_ratio=(0.8, 1.25), hflip_prob=0.5,
        jitter_brightness=0.3, jitter_contrast=0.3, jitter_saturation=0.3,
        jitter_hue=0.2, jitter_prob=0.7)
    s_ch = np.array([p.ch for p in singles])
    s_cw = np.array([p.cw for p in singles])
    assert abs(s_ch.mean() - pb["ch"].mean()) < 1.5
    assert abs(s_cw.mean() - pb["cw"].mean()) < 1.5
    assert abs(np.mean([p.flip for p in singles])
               - pb["flip"].mean()) < 0.03
    s_hue = np.array([p.hue for p in singles])
    assert abs(s_hue.mean() - pb["hue"].mean()) < 0.01
    assert abs(s_hue[s_hue != 0].std() - pb["hue"][pb["hue"] != 0].std()) \
        < 0.01
