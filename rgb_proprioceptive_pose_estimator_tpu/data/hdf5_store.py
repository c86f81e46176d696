"""Robosuite/robomimic-style HDF5 demo-trajectory store (C1,
BASELINE.json:5,9).

Layout read (SURVEY.md section 4.4, robomimic convention):

    data/
      demo_0/
        obs/<camera>_image          (T, H, W, 3) uint8
        obs/robot0_proprio-state    (T, D) float
        obs/object                  (T, >=7) float; [:3]=pos, [3:7]=quat
      demo_1/ ...

Indexing is flat over (demo, t) pairs. Temporal stacking (C11) gathers the
T most recent frames with clamp-at-episode-start padding. h5py handles are
per-thread (h5py is not safe across threads on a shared handle --
SURVEY.md section 4.4); small tensors (proprio, targets) are cached in RAM
at init, images optionally (`cache_images`).
"""

from __future__ import annotations

import re
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from rgb_proprioceptive_pose_estimator_tpu.data import augment as aug


def _natural_key(s: str):
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)]


class HDF5DemoStore:
    def __init__(
        self,
        path: str,
        cameras: Sequence[str] = ("agentview",),
        image_size: int = 128,
        temporal_frames: int = 1,
        image_key_format: str = "obs/{camera}_image",
        proprio_key: str = "obs/robot0_proprio-state",
        target_key: str = "obs/object",
        use_proprio: bool = True,
        use_native: bool = True,               # C++ augment engine if built
        cache_images: Optional[bool] = None,   # None = auto (< 4 GiB)
        split: str = "all",                    # "all" | "train" | "val"
        val_fraction: float = 0.0,             # held-out fraction, by demo
        split_seed: int = 0,
        # device-side augmentation (data.augment_device): train batches are
        # deterministically resized to this size (image_size + 2*margin);
        # the random crop/flip/jitter happens inside the jitted train step
        device_aug_hw: Optional[int] = None,
        crop_scale: Tuple[float, float] = (1.0, 1.0),
        hflip_prob: float = 0.0,
        # hflip label consistency (VERDICT r1 missing-2): mirror the target
        # pose with the flip; one flip draw per sample shared by all cameras
        hflip_pose_mirror: bool = False,
        hflip_mirror_axis: int = 0,
        hflip_mirror_center: float = 0.0,
        jitter_brightness: float = 0.2,
        jitter_contrast: float = 0.2,
        jitter_saturation: float = 0.2,
        jitter_prob: float = 0.8,
    ):
        self.path = path
        self.cameras = tuple(cameras)
        self.image_size = image_size
        self.temporal_frames = temporal_frames
        self.image_key_format = image_key_format
        self.proprio_key = proprio_key
        self.target_key = target_key
        self.use_proprio = use_proprio
        self.use_native = use_native
        self.device_aug_hw = device_aug_hw
        self._aug_kwargs = dict(
            crop_scale=crop_scale, hflip_prob=hflip_prob,
            jitter_brightness=jitter_brightness,
            jitter_contrast=jitter_contrast,
            jitter_saturation=jitter_saturation, jitter_prob=jitter_prob,
        )
        self.hflip_prob = hflip_prob
        self.hflip_pose_mirror = hflip_pose_mirror
        self.hflip_mirror_axis = hflip_mirror_axis
        self.hflip_mirror_center = hflip_mirror_center
        self._local = threading.local()
        # memoized deterministic resizes per (demo, cam, hw) -- serves the
        # eval transform and the device-aug train path (both deterministic),
        # so each frame is resized once per size instead of once per epoch
        self._resized_cache: Dict[Tuple[int, str, int], np.ndarray] = {}
        self._resized_lock = threading.Lock()

        # per-camera encoding flag: raw (T,H,W,3) uint8 arrays vs encoded
        # JPEG/PNG bytes as (T,) vlen-uint8 datasets (C2 "decode",
        # VERDICT r1 missing-3); must be uniform per camera across demos
        self._encoded: Dict[str, bool] = {}

        # Build the flat (demo, t) index + cache small tensors.
        self._proprio: List[np.ndarray] = []
        self._pos: List[np.ndarray] = []
        self._quat: List[np.ndarray] = []
        self._demo_keys: List[str] = []
        index: List[Tuple[int, int]] = []
        img_bytes = 0
        with h5py.File(path, "r") as f:
            demos = sorted(f["data"].keys(), key=_natural_key)
            if val_fraction > 0 and split != "all":
                # split at demo granularity so no trajectory leaks across
                n_val = max(1, int(round(len(demos) * val_fraction)))
                perm = np.random.RandomState(split_seed).permutation(
                    len(demos))
                val_set = set(perm[:n_val].tolist())
                demos = [d for i, d in enumerate(demos)
                         if (i in val_set) == (split == "val")]
                if not demos:
                    raise ValueError(
                        f"split {split!r} empty (val_fraction="
                        f"{val_fraction}, {len(val_set)} val demos)")
            for di, dk in enumerate(demos):
                g = f["data"][dk]
                for key in [self.target_key] + (
                        [self.proprio_key] if use_proprio else []) + [
                        self.image_key_format.format(camera=c)
                        for c in self.cameras]:
                    if key not in g:
                        have = list(g.get("obs", g).keys())
                        raise KeyError(
                            f"{path}: demo {dk!r} has no dataset {key!r}; "
                            f"available obs keys: {have}. Adjust "
                            "data.image_key_format / proprio_key / "
                            "target_key (see docs/DATA_FORMAT.md)")
                tgt = np.asarray(g[self.target_key], dtype=np.float32)
                if tgt.ndim != 2 or tgt.shape[1] < 7:
                    raise ValueError(
                        f"{path}: {dk}/{self.target_key} has shape "
                        f"{tgt.shape}; need (T, >=7) with [:3]=pos, "
                        "[3:7]=quat (see docs/DATA_FORMAT.md)")
                steps = tgt.shape[0]
                self._demo_keys.append(dk)
                self._pos.append(tgt[:, :3])
                q = tgt[:, 3:7]
                q = q / np.maximum(
                    np.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
                self._quat.append(q.astype(np.float32))
                if use_proprio:
                    self._proprio.append(
                        np.asarray(g[self.proprio_key], dtype=np.float32))
                for cam in self.cameras:
                    ds = g[self.image_key_format.format(camera=cam)]
                    enc = h5py.check_vlen_dtype(ds.dtype) is not None
                    prev = self._encoded.setdefault(cam, enc)
                    if prev != enc:
                        raise ValueError(
                            f"{path}: camera {cam!r} mixes encoded and raw "
                            f"image datasets across demos")
                    if enc:
                        if ds.ndim != 1:
                            raise ValueError(
                                f"{path}: {dk}/{cam}: encoded image dataset "
                                f"must be (T,) vlen bytes, got {ds.shape}")
                        # encoded bytes: on-disk size ~= in-RAM cache size
                        img_bytes += int(ds.id.get_storage_size())
                    else:
                        img_bytes += int(np.prod(ds.shape)) * ds.dtype.itemsize
                index.extend((di, t) for t in range(steps))
        self._index = np.asarray(index, dtype=np.int64)
        self.proprio_dim = (
            self._proprio[0].shape[-1] if (use_proprio and self._proprio) else 0)

        if cache_images is None:
            cache_images = img_bytes < (4 << 30)
        self._image_cache: Optional[Dict[Tuple[int, str], np.ndarray]] = None
        if cache_images:
            cache: Dict[Tuple[int, str], np.ndarray] = {}
            with h5py.File(path, "r") as f:
                for di, dk in enumerate(self._demo_keys):
                    g = f["data"][dk]
                    for cam in self.cameras:
                        cache[(di, cam)] = np.asarray(
                            g[self.image_key_format.format(camera=cam)])
            self._image_cache = cache

    # -- low-level access ---------------------------------------------------

    def _file(self) -> h5py.File:
        f = getattr(self._local, "f", None)
        if f is None:
            f = h5py.File(self.path, "r")
            self._local.f = f
        return f

    def _read_frames(self, demo: int, cam: str, ts: np.ndarray) -> np.ndarray:
        """Frames (len(ts), H, W, 3) uint8; ts may repeat (clamped padding).
        Encoded cameras are decoded here, in the pipeline worker threads
        (cv2.imdecode releases the GIL -- SURVEY.md section 4.4's decode
        stage)."""
        encoded = self._encoded.get(cam, False)
        if self._image_cache is not None:
            frames = self._image_cache[(demo, cam)]
            if not encoded:
                return frames[ts]
            uniq, inv = np.unique(ts, return_inverse=True)
            return np.stack([aug.decode_image(frames[t])
                             for t in uniq])[inv]
        ds = self._file()["data"][self._demo_keys[demo]][
            self.image_key_format.format(camera=cam)]
        uniq, inv = np.unique(ts, return_inverse=True)
        if encoded:
            return np.stack([aug.decode_image(b) for b in ds[uniq]])[inv]
        return np.asarray(ds[uniq])[inv]

    def _resized_demo(self, demo: int, cam: str, hw: int) -> Optional[np.ndarray]:
        """All frames of a demo center-crop-resized to hw, memoized.
        Only active when raw images are RAM-cached (otherwise memoizing
        whole demos would defeat the point of not caching)."""
        if self._image_cache is None:
            return None
        key = (demo, cam, hw)
        out = self._resized_cache.get(key)
        if out is not None:
            return out
        raw = self._image_cache[(demo, cam)]
        if self._encoded.get(cam, False):
            raw = np.stack([aug.decode_image(b) for b in raw])
        # compute OUTSIDE the lock (holding it for a whole-demo resize
        # convoys every worker); worst case two threads resize the same
        # demo once each -- idempotent, last write wins
        from rgb_proprioceptive_pose_estimator_tpu.runtime import (
            native as native_mod,
        )

        if self.use_native and native_mod.available():
            out = native_mod.center_crop_resize_batch(raw, hw)
        else:
            out = np.stack([aug.center_crop_resize(fr, hw) for fr in raw])
        with self._resized_lock:
            self._resized_cache[key] = out
        return out

    def __len__(self) -> int:
        return len(self._index)

    # -- batch assembly (runs inside pipeline worker threads) ----------------

    def get_batch(self, indices: np.ndarray, augment: bool = False,
                  seed: int = 0) -> Dict:
        tf = self.temporal_frames
        hw = self.image_size
        n = len(indices)
        batch: Dict = {}

        demo_t = [self._index[flat] for flat in indices]
        ts_list = [np.clip(np.arange(t - tf + 1, t + 1), 0, None)
                   for (_, t) in demo_t]

        # pose-mirroring flips (label-consistent hflip): ONE draw per sample
        # shared by every camera, because all cameras must agree with the
        # single mirrored label. Only applies when flips happen on host
        # (device-aug mirrors inside the train step instead).
        flips = None
        if (augment and self.cameras and self.hflip_pose_mirror
                and self.hflip_prob > 0 and self.device_aug_hw is None):
            flips = np.empty(n, dtype=bool)
            for bi, flat in enumerate(indices):
                fseed = (seed * 1_000_003 + int(flat) * 31
                         + 500_009) % (2 ** 31 - 1)
                flips[bi] = (np.random.RandomState(fseed).uniform()
                             < self.hflip_prob)

        if self.cameras:
            batch["images"] = {
                cam: self._camera_batch(cam, ci, indices, demo_t, ts_list,
                                        augment, seed, forced_flips=flips)
                for ci, cam in enumerate(self.cameras)
            }

        if self.use_proprio:
            pshape = (n, self.proprio_dim) if tf == 1 else (
                n, tf, self.proprio_dim)
            proprio = np.empty(pshape, dtype=np.float32)
            for bi, ((demo, _), ts) in enumerate(zip(demo_t, ts_list)):
                p = self._proprio[demo][ts]
                proprio[bi] = p if tf > 1 else p[0]
            batch["proprio"] = proprio

        tpos = np.empty((n, 3), dtype=np.float32)
        tquat = np.empty((n, 4), dtype=np.float32)
        for bi, (demo, t) in enumerate(demo_t):
            tpos[bi] = self._pos[demo][t]
            tquat[bi] = self._quat[demo][t]
        if flips is not None and flips.any():
            # mirror the label with the image (ops/pose_math.mirror_pose
            # semantics, numpy): reflect pos about the plane, conjugate the
            # quaternion by the reflection
            ax, ctr = self.hflip_mirror_axis, self.hflip_mirror_center
            tpos[flips, ax] = 2.0 * ctr - tpos[flips, ax]
            qsign = -np.ones(4, dtype=np.float32)
            qsign[0] = 1.0
            qsign[1 + ax] = 1.0
            tquat[flips] *= qsign
        batch["target_pos"] = tpos
        batch["target_quat"] = tquat
        return batch

    def _camera_batch(self, cam: str, cam_idx: int, indices, demo_t, ts_list,
                      augment: bool, seed: int,
                      forced_flips: Optional[np.ndarray] = None) -> np.ndarray:
        """(n, [tf,] hw, hw, 3) uint8 augmented/eval-transformed frames.

        One parameter draw per (sample, camera): all frames of a temporal
        stack share crop/flip/jitter (temporal consistency); cameras get
        independent draws -- except the flip when `forced_flips` is given
        (pose-mirror mode shares one flip per sample across cameras). Pixel
        work runs on the native C++ engine when built, else the numpy
        backend -- identical parameters either way."""
        tf, hw, n = self.temporal_frames, self.image_size, len(indices)

        if augment and self.device_aug_hw is not None:
            # device-side augmentation: host only resizes (deterministic);
            # crop/flip/jitter happen inside the jitted train step
            hw = self.device_aug_hw
            augment = False

        if not augment and self._image_cache is not None:
            # deterministic transform: serve from the memoized resized cache
            out = np.empty((n, tf, hw, hw, 3), dtype=np.uint8)
            for bi, ((demo, _), ts) in enumerate(zip(demo_t, ts_list)):
                out[bi] = self._resized_demo(demo, cam, hw)[ts]
            return out[:, 0] if tf == 1 else out

        raws = [self._read_frames(demo, cam, ts)
                for (demo, _), ts in zip(demo_t, ts_list)]

        params = None
        if augment:
            params = []
            for bi, flat in enumerate(indices):
                sseed = (seed * 1_000_003 + int(flat) * 31
                         + cam_idx * 7_777) % (2 ** 31 - 1)
                rs = np.random.RandomState(sseed)
                h, w = raws[bi].shape[1:3]
                p = aug.sample_aug_params(h, w, rs, **self._aug_kwargs)
                if forced_flips is not None:
                    p = p._replace(flip=bool(forced_flips[bi]))
                params.append(p)

        native = None
        if self.use_native and len({r.shape for r in raws}) == 1:
            # heterogeneous source sizes fall back to the per-image numpy
            # path (the batch engine wants one contiguous array)
            from rgb_proprioceptive_pose_estimator_tpu.runtime import (
                native as native_mod,
            )

            if native_mod.available():
                native = native_mod

        if native is not None:
            frames = np.concatenate(raws, axis=0)  # (n*tf, sh, sw, 3)
            if augment:
                crops = np.repeat(np.asarray(
                    [[p.y0, p.x0, p.size] for p in params], np.int32),
                    tf, axis=0)
                flips = np.repeat(np.asarray(
                    [p.flip for p in params], np.uint8), tf)
                jit = np.repeat(np.asarray(
                    [[p.brightness, p.contrast, p.saturation]
                     for p in params], np.float32), tf, axis=0)
                out = native.augment_batch(frames, hw, crops, flips, jit)
            else:
                out = native.center_crop_resize_batch(frames, hw)
            out = out.reshape(n, tf, hw, hw, 3)
        else:
            out = np.empty((n, tf, hw, hw, 3), dtype=np.uint8)
            for bi in range(n):
                for fi, fr in enumerate(raws[bi]):
                    if augment:
                        out[bi, fi] = aug.apply_aug_params(fr, params[bi], hw)
                    else:
                        out[bi, fi] = aug.center_crop_resize(fr, hw)
        return out[:, 0] if tf == 1 else out


# ---------------------------------------------------------------------------
# Fixture generator (SURVEY.md section 5.2: tests build a tiny generated
# robosuite-layout file rather than shipping binary data).
# ---------------------------------------------------------------------------


def write_demo_fixture(
    path: str,
    n_demos: int = 3,
    steps: int = 20,
    cameras: Sequence[str] = ("agentview", "robot0_eye_in_hand"),
    image_hw: int = 84,
    proprio_dim: int = 32,
    seed: int = 0,
    leak_pose_into_proprio: bool = False,
    encoding: str = "raw",   # "raw" | "jpeg" | "png" per-frame image storage
) -> str:
    """Write a tiny robomimic-layout HDF5 demo file whose images are
    *informative*: a bright marker is drawn at the pixel projection of the
    target position, so a CNN can actually regress the pose -- this is what
    makes the image-path integration test a real learning test.

    Proprio is a smooth random walk UNRELATED to the target pose, so
    image-path accuracy numbers are attributable to the image path
    (VERDICT r1 weak-3: the r1 fixture copied pos/quat into proprio, which
    contaminated every accuracy artifact trained on it). Set
    `leak_pose_into_proprio=True` only for tests that specifically need a
    proprio-solvable task (e.g. proprio-branch learning smoke).

    Image->pose geometry of the fixture: the marker center column is
    pos_x * (W-1) and row is pos_y * (H-1), so a horizontal flip
    corresponds to mirroring pos about x=0.5 -- i.e.
    data.hflip_pose_mirror with hflip_mirror_axis=0,
    hflip_mirror_center=0.5 is the label-consistent flip for this data.
    The marker color encodes quat_w^2 only, which mirror_pose preserves."""
    rs = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env"] = "Lift_fixture"
        data.attrs["repository_version"] = "rppe_tpu_fixture_v1"
        for d in range(n_demos):
            g = data.create_group(f"demo_{d}")
            # smooth random-walk pose
            pos = np.empty((steps, 3), np.float32)
            pos[0] = rs.uniform(0.25, 0.75, 3)
            for t in range(1, steps):
                pos[t] = np.clip(pos[t - 1] + rs.randn(3) * 0.03, 0.05, 0.95)
            quat = rs.randn(steps, 4).astype(np.float32)
            quat[0] = [1, 0, 0, 0]
            for t in range(1, steps):
                quat[t] = quat[t - 1] + rs.randn(4) * 0.1
            quat /= np.linalg.norm(quat, axis=-1, keepdims=True)

            obj = np.zeros((steps, 14), np.float32)
            obj[:, :3] = pos
            obj[:, 3:7] = quat
            obj[:, 7:10] = rs.randn(steps, 3) * 0.1   # filler (gripper-to-obj)

            # smooth random walk, independent of the target pose
            proprio = np.empty((steps, proprio_dim), np.float32)
            proprio[0] = rs.randn(proprio_dim) * 0.3
            for t in range(1, steps):
                proprio[t] = proprio[t - 1] + rs.randn(proprio_dim) * 0.05
            if leak_pose_into_proprio:
                proprio[:, :3] = pos
                proprio[:, 3:7] = quat

            obs = g.create_group("obs")
            for cam in cameras:
                imgs = rs.randint(0, 40, (steps, image_hw, image_hw, 3),
                                  dtype=np.uint8)  # dark noise background
                for t in range(steps):
                    cy = int(pos[t, 1] * (image_hw - 1))
                    cx = int(pos[t, 0] * (image_hw - 1))
                    r = max(2, int(2 + pos[t, 2] * 6))
                    y0, y1 = max(0, cy - r), min(image_hw, cy + r)
                    x0, x1 = max(0, cx - r), min(image_hw, cx + r)
                    color = (np.array([1, 0.2, 0.2]) * 255 * quat[t, 0] ** 2
                             + np.array([0.2, 0.2, 1]) * 255
                             * (1 - quat[t, 0] ** 2))
                    imgs[t, y0:y1, x0:x1] = color.astype(np.uint8)
                if encoding == "raw":
                    obs.create_dataset(f"{cam}_image", data=imgs)
                elif encoding in ("jpeg", "png"):
                    # robomimic-in-the-wild layout: per-frame encoded bytes
                    # in a (T,) vlen-uint8 dataset (VERDICT r1 missing-3)
                    ext = ".jpg" if encoding == "jpeg" else ".png"
                    ds = obs.create_dataset(
                        f"{cam}_image", (steps,),
                        dtype=h5py.vlen_dtype(np.uint8))
                    for t in range(steps):
                        ds[t] = aug.encode_image(imgs[t], ext)
                else:
                    raise ValueError(
                        f"encoding must be raw/jpeg/png, got {encoding!r}")
            obs.create_dataset("robot0_proprio-state", data=proprio)
            obs.create_dataset("object", data=obj)
            g.create_dataset("actions", data=rs.randn(steps, 7).astype(np.float32))
            g.attrs["num_samples"] = steps
    return path
