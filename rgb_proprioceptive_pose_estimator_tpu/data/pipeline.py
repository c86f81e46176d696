"""Async host -> device input pipeline (BASELINE.json:5 "async host
pipeline so the TPU never stalls on image decode").

Stages (SURVEY.md section 4.4):
  1. checkpointable index sampler (seeded per-epoch permutation),
  2. worker threads building uint8 numpy batches (decode/crop/flip/jitter --
     cv2/numpy release the GIL; optionally the native C++ shim),
  3. in-order emission (deterministic regardless of worker count),
  4. non-blocking `jax.device_put` onto the data-sharded mesh with a
     `prefetch`-deep device queue (double buffering) -- normalization
     happens on device inside the model graph.

Fixed global batch size; partial batches are dropped (recompilation
discipline, SURVEY.md section 8 hard-part 5). The sampler state
{seed, consumed} is saved in checkpoints so resume continues mid-epoch
(SURVEY.md section 6.4).
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np

from rgb_proprioceptive_pose_estimator_tpu.config import Config, DataConfig
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import HDF5DemoStore
from rgb_proprioceptive_pose_estimator_tpu.data.synthetic import (
    SyntheticProprioDataset,
)


def build_dataset(cfg: Config, split: str = "all"):
    """Construct the dataset named by cfg.data.source (C1/C15).

    split: "all" | "train" | "val" -- "train"/"val" are only distinct when
    cfg.data.val_fraction > 0 (hdf5 splits by demo; synthetic by index) or
    cfg.data.val_path is set (hdf5: val = ALL of the separate file(s),
    train = ALL of data.path)."""
    d, m = cfg.data, cfg.model
    if d.source == "synthetic":
        return SyntheticProprioDataset(
            size=d.synthetic_size,
            proprio_dim=m.proprio_dim,
            noise=d.synthetic_noise,
            seed=d.seed,
            temporal_frames=m.temporal_frames,
            split=split,
            val_fraction=d.val_fraction,
        )
    if d.source == "hdf5":
        if not d.path:
            raise ValueError("cfg.data.path required for hdf5 source")
        if d.device_cache and m.backbone == "none":
            # fit() only uploads the cache for image models; a proprio-only
            # model with device_cache would otherwise ship a dead image_idx
            # array every batch and silently train without images (ADVICE r2)
            raise ValueError(
                "data.device_cache requires an image backbone "
                "(model.backbone != 'none'); a proprio-only model has no "
                "frames to cache")
        # data.val_path: the val split is a SEPARATE held-out file
        # collection (whole file(s), no fraction split on either side).
        # max_demos / filter_key are TRAIN-set selectors (data-efficiency
        # caps, robomimic subsets) and must not truncate or gate the
        # held-out file the docs promise is evaluated in full.
        path = d.path
        val_fraction = d.val_fraction
        max_demos = d.max_demos
        filter_key = d.filter_key
        if d.val_path:
            if split == "val":
                path = d.val_path
                max_demos = 0
                filter_key = ""
            split, val_fraction = "all", 0.0
        store = HDF5DemoStore(
            path,
            split=split,
            val_fraction=val_fraction,
            split_seed=d.split_seed,
            max_demos=max_demos,
            filter_key=filter_key,
            cameras=m.cameras if m.backbone != "none" else (),
            image_size=m.image_size,
            temporal_frames=m.temporal_frames,
            image_key_format=d.image_key_format,
            proprio_key=d.proprio_key,
            target_key=d.target_key,
            target_lookahead=d.target_lookahead,
            use_proprio=m.use_proprio,
            use_native=d.use_native,
            device_aug_hw=(m.image_size + 2 * d.crop_margin
                           if d.augment_device and d.augment else None),
            crop_scale=d.crop_scale,
            crop_ratio=d.crop_ratio,
            hflip_prob=d.hflip_prob,
            hflip_pose_mirror=d.hflip_pose_mirror,
            hflip_mirror_axis=d.hflip_mirror_axis,
            hflip_mirror_center=d.hflip_mirror_center,
            jitter_brightness=d.jitter_brightness,
            jitter_contrast=d.jitter_contrast,
            jitter_saturation=d.jitter_saturation,
            jitter_hue=d.jitter_hue,
            jitter_prob=d.jitter_prob,
            cache_images=(True if d.device_cache else None),
        )
        store.emit_image_indices = bool(d.device_cache) and bool(store.cameras)
        return store
    raise ValueError(f"unknown data source {d.source!r}")


class HostPipeline:
    """Infinite (train) or single-epoch (eval) iterator of device batches."""

    def __init__(self, dataset, cfg: DataConfig, sharding=None,
                 train: bool = True, batch_size: Optional[int] = None,
                 shard_of_sample: Optional[np.ndarray] = None,
                 n_shards: int = 1):
        self.dataset = dataset
        self.cfg = cfg
        self.sharding = sharding
        self.train = train
        self.batch_size = batch_size or cfg.batch_size
        if len(dataset) < self.batch_size:
            raise ValueError(
                f"dataset size {len(dataset)} < batch size {self.batch_size}")
        self.batches_per_epoch = len(dataset) // self.batch_size
        self.augment = bool(cfg.augment) and train

        # data.cache_layout="sharded": constrain sampling so batch segment
        # d (the sub-batch NamedSharding places on device d) references
        # only shard-d samples -- the device-side gather is then local to
        # each device's cache shard (data/cache_shard.py module docs).
        self._n_shards = max(int(n_shards), 1)
        self._samples_by_shard = None
        if shard_of_sample is not None and self._n_shards > 1:
            if self.batch_size % self._n_shards != 0:
                raise ValueError(
                    f"batch size {self.batch_size} not divisible by "
                    f"{self._n_shards} cache shards")
            shard_of_sample = np.asarray(shard_of_sample)
            if len(shard_of_sample) != len(dataset):
                raise ValueError(
                    f"shard_of_sample covers {len(shard_of_sample)} samples "
                    f"!= dataset size {len(dataset)}")
            self._samples_by_shard = [
                np.flatnonzero(shard_of_sample == d)
                for d in range(self._n_shards)]
            per = self.batch_size // self._n_shards
            # an epoch is bounded by the smallest shard (LPT keeps shards
            # within one demo of each other); per-shard reshuffles rotate
            # any dropped tail across epochs
            self.batches_per_epoch = min(
                len(s) for s in self._samples_by_shard) // per
            if self.batches_per_epoch < 1:
                raise ValueError(
                    "smallest cache shard has "
                    f"{min(len(s) for s in self._samples_by_shard)} samples "
                    f"< {per} per-device batch; reduce data.batch_size or "
                    "device count (data.cache_layout='sharded')")

        self._consumed = 0            # global batch counter (checkpoint state)
        self._scheduled = 0
        self._perm_cache: Dict[int, np.ndarray] = {}
        self._pool: Optional[ThreadPoolExecutor] = None
        if cfg.num_workers > 0:
            self._pool = ThreadPoolExecutor(
                max_workers=cfg.num_workers,
                thread_name_prefix="rppe-data")
        self._inflight: "collections.deque[Future]" = collections.deque()
        self._device_q: "collections.deque" = collections.deque()
        self._max_inflight = max(cfg.num_workers * 2, 1)
        self._max_device = max(cfg.prefetch, 1)

    # -- sampler -------------------------------------------------------------

    def _epoch_perm(self, epoch: int) -> np.ndarray:
        """Per-epoch permutation, memoized (recomputing an O(dataset)
        shuffle per batch per worker burns a core at high batch rates).
        Dict ops are atomic under the GIL; worst case two threads compute
        the same (identical) permutation once."""
        perm = self._perm_cache.get(epoch)
        if perm is None:
            if self._samples_by_shard is not None:
                perm = self._sharded_perm(epoch)
            elif self.train and self.cfg.shuffle:
                perm = np.random.RandomState(
                    (self.cfg.seed + epoch) % (2 ** 31 - 1)
                ).permutation(len(self.dataset))
            else:
                perm = np.arange(len(self.dataset))
            # keep only a couple of epochs (in-flight batches straddle at
            # most two)
            self._perm_cache = {k: v for k, v in self._perm_cache.items()
                                if k >= epoch - 1}
            self._perm_cache[epoch] = perm
        return perm

    def _sharded_perm(self, epoch: int) -> np.ndarray:
        """Epoch index stream for the sharded cache layout: every shard's
        samples permuted independently (distinct deterministic stream per
        (seed, epoch, shard)), truncated to the epoch's per-shard sample
        count, and interleaved shard-major so _indices_for's contiguous
        batch slice comes out segment-aligned: batch row block d = shard
        d's next `per` samples. Eval pipelines (no shuffle) interleave the
        natural per-shard order -- deterministic, full min-shard coverage."""
        per = self.batch_size // self._n_shards
        e = self.batches_per_epoch
        cols = []
        for d, samp in enumerate(self._samples_by_shard):
            if self.train and self.cfg.shuffle:
                rs = np.random.RandomState(
                    ((self.cfg.seed + epoch) * 9_973 + d) % (2 ** 31 - 1))
                samp = rs.permutation(samp)
            cols.append(samp[:e * per])
        return (np.stack(cols)                      # (D, e*per)
                .reshape(self._n_shards, e, per)
                .transpose(1, 0, 2)                 # (e, D, per)
                .reshape(-1))

    def _indices_for(self, global_batch: int) -> np.ndarray:
        epoch, pos = divmod(global_batch, self.batches_per_epoch)
        perm = self._epoch_perm(epoch)
        lo = pos * self.batch_size
        return perm[lo:lo + self.batch_size]

    def _build(self, global_batch: int) -> Dict[str, Any]:
        idx = self._indices_for(global_batch)
        if jax.process_count() > 1:
            # multi-host: every process derives the SAME global index list
            # (seeded sampler), then builds only its own contiguous slice;
            # shard_batch assembles the global array from process-local data
            if self.batch_size % jax.process_count() != 0:
                raise ValueError(
                    f"global batch {self.batch_size} not divisible by "
                    f"{jax.process_count()} processes")
            per = self.batch_size // jax.process_count()
            pid = jax.process_index()
            idx = idx[pid * per:(pid + 1) * per]
        seed = (self.cfg.seed * 7_919 + global_batch) % (2 ** 31 - 1)
        return self.dataset.get_batch(idx, augment=self.augment, seed=seed)

    # -- pipeline mechanics ----------------------------------------------------

    def _schedule(self, limit: Optional[int] = None) -> None:
        while len(self._inflight) < self._max_inflight:
            if limit is not None and self._scheduled >= limit:
                return
            gb = self._scheduled
            self._scheduled += 1
            if self._pool is not None:
                self._inflight.append(self._pool.submit(self._build, gb))
            else:
                f: Future = Future()
                f.set_result(self._build(gb))
                self._inflight.append(f)

    def _to_device(self, np_batch: Dict[str, Any]):
        if self.sharding is None:
            return jax.device_put(np_batch)
        from rgb_proprioceptive_pose_estimator_tpu.parallel.mesh import shard_batch

        return shard_batch(np_batch, self.sharding)

    def _fill_device_q(self, limit: Optional[int] = None) -> None:
        self._schedule(limit)
        while len(self._device_q) < self._max_device and self._inflight:
            np_batch = self._inflight.popleft().result()
            self._device_q.append(self._to_device(np_batch))  # async transfer
            self._schedule(limit)

    def queue_depth(self) -> int:
        """Host-side ready batches -- the 'TPU starving' canary
        (SURVEY.md section 6.5)."""
        return sum(f.done() for f in self._inflight) + len(self._device_q)

    # -- iteration -------------------------------------------------------------

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        """Infinite stream of device batches (training)."""
        self._fill_device_q()
        self._consumed += 1
        return self._device_q.popleft()

    def epoch(self, max_batches: int = 0, start: int = 0) -> Iterator:
        """One deterministic pass over the dataset (evaluation), optionally
        capped at max_batches. The cap bounds SCHEDULING too -- breaking out
        of an uncapped generator would leave in-flight builds running and
        prefetched device batches pinned.

        `start` rotates a *partial* pass (max_batches < batches_per_epoch)
        to begin at batch `start % batches_per_epoch`, wrapping around the
        split, so cadence evals with a small eval_steps cover different
        batches each pass instead of re-scoring the head of the split
        (VERDICT r1 weak-5). Full passes ignore `start`."""
        if self.train:
            raise RuntimeError(
                "epoch() is for eval pipelines (train=False); a training "
                "pipeline's sampler state would be corrupted")
        n = self.batches_per_epoch
        limit = n
        if max_batches:
            limit = min(limit, max_batches)
        base = (start % n) if (start and limit < n) else 0
        self._reset(base)
        try:
            for _ in range(limit):
                self._fill_device_q(base + limit)
                yield self._device_q.popleft()
        finally:
            # also covers exceptions / abandoned generators: cancel
            # in-flight builds and release prefetched device batches
            self._reset()

    def _reset(self, position: Optional[int] = None) -> None:
        for f in self._inflight:
            f.cancel()
        self._inflight.clear()
        self._device_q.clear()
        self._scheduled = self._consumed if position is None else position

    # -- checkpointable state ---------------------------------------------------

    STATE_FORMAT = 1   # bump + migrate on incompatible sampler changes

    def state_dict(self) -> Dict[str, Any]:
        return {"format": self.STATE_FORMAT, "consumed": int(self._consumed),
                "seed": int(self.cfg.seed),
                "batch_size": int(self.batch_size),
                # sharded cache layout: the index stream depends on the
                # shard partition, which depends on the device count
                "n_shards": (self._n_shards
                             if self._samples_by_shard is not None else 1)}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        fmt = int(state.get("format", 1))
        if fmt != self.STATE_FORMAT:
            raise ValueError(
                f"checkpoint iterator state format {fmt} != supported "
                f"{self.STATE_FORMAT}")
        if int(state.get("batch_size", self.batch_size)) != self.batch_size:
            raise ValueError("cannot resume with a different batch size")
        saved_seed = int(state.get("seed", self.cfg.seed))
        if saved_seed != self.cfg.seed:
            raise ValueError(
                f"cannot resume: checkpoint sampler seed {saved_seed} != "
                f"config data.seed {self.cfg.seed} (the consumed-batch "
                "counter only makes sense within one permutation stream)")
        cur_shards = (self._n_shards
                      if self._samples_by_shard is not None else 1)
        saved_shards = int(state.get("n_shards", 1))
        if saved_shards != cur_shards:
            raise ValueError(
                f"cannot resume: checkpoint sampler used {saved_shards} "
                f"cache shard(s), this run has {cur_shards} -- the sharded "
                "cache index stream depends on the device count "
                "(data.cache_layout='sharded'); resume on the same mesh "
                "size or start a fresh run")
        self._consumed = int(state["consumed"])
        self._reset()

    def close(self) -> None:
        self._reset()
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
