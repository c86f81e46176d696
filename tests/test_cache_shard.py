"""Sharded device-resident frame cache (data.cache_layout="sharded",
data/cache_shard.py): the HBM cache's row axis tiles across the mesh's
data axis, the sampler constrains batch segment d to shard-d samples, and
the in-step gather is a shard_map-local take. These tests cover the plan
invariants, the sampler's segment discipline, pixel-exactness of the
sharded gather against the host path, end-to-end eval equivalence with the
replicated layout, and the resume/device-count guard."""

import dataclasses

import jax
import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.config import Config, DataConfig
from rgb_proprioceptive_pose_estimator_tpu.data.cache_shard import (
    CacheShardPlan,
    build_shard_plan,
    build_sharded_cache,
)
from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
    write_demo_fixture,
)
from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import (
    HostPipeline,
    build_dataset,
)
from rgb_proprioceptive_pose_estimator_tpu.parallel import mesh as pmesh


# ---------------------------------------------------------------- plan unit

def test_shard_plan_roundtrip_and_balance():
    fpd = np.array([7, 3, 5, 2, 9, 4, 6, 8])
    plan = build_shard_plan(fpd, 4)
    n_frames = int(fpd.sum())
    # every frame owns exactly one row, and the mappings invert
    assert sorted(plan.row_of_frame.tolist()) == sorted(
        set(plan.row_of_frame.tolist()))
    np.testing.assert_array_equal(
        plan.frame_of_row[plan.row_of_frame], np.arange(n_frames))
    # LPT balance: max load == rows_per_shard, and (for these weights)
    # shards are within one biggest demo of each other
    loads = np.bincount(plan.shard_of_demo, weights=fpd,
                        minlength=4).astype(int)
    assert plan.rows_per_shard == loads.max()
    assert loads.max() - loads.min() <= int(fpd.max())
    # pad rows reference a frame belonging to the SAME shard
    for s in range(4):
        rows = plan.frame_of_row[s * plan.rows_per_shard:
                                 (s + 1) * plan.rows_per_shard]
        demos_in_rows = set()
        demo_off = np.concatenate([[0], np.cumsum(fpd)])
        for fr in rows:
            d = int(np.searchsorted(demo_off, fr, side="right") - 1)
            demos_in_rows.add(d)
        assert all(plan.shard_of_demo[d] == s for d in demos_in_rows)


def test_shard_plan_demo_rows_stay_contiguous():
    """Temporal windows are demo-local offsets: a demo's frames must map to
    consecutive rows so window gathers stay in-shard and in-order."""
    fpd = np.array([5, 8, 3, 6])
    plan = build_shard_plan(fpd, 2)
    off = np.concatenate([[0], np.cumsum(fpd)])
    for d in range(4):
        rows = plan.row_of_frame[off[d]:off[d + 1]]
        np.testing.assert_array_equal(np.diff(rows), 1)


def test_shard_plan_rejects_fewer_demos_than_shards():
    with pytest.raises(ValueError, match="at least one demo per"):
        build_shard_plan(np.array([4, 4]), 3)


def test_local_rows_in_range():
    fpd = np.array([4, 9, 2, 7, 5])
    plan = build_shard_plan(fpd, 2)
    local = plan.local_row_of_frame
    assert local.min() >= 0 and local.max() < plan.rows_per_shard


# ------------------------------------------------------------ sampler unit

class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def test_sharded_sampler_segments_respect_shards():
    """Every emitted batch's segment d (rows [d*per, (d+1)*per)) must
    reference only shard-d samples -- that is the invariant that makes the
    device-side gather collective-free."""
    n = 64
    shard_of_sample = np.repeat(np.arange(4), 16)   # 4 shards x 16 samples
    cfg = DataConfig(batch_size=8, num_workers=0, prefetch=1, seed=3)
    pipe = HostPipeline(_ToyDataset(n), cfg, train=True,
                        shard_of_sample=shard_of_sample, n_shards=4)
    per = 8 // 4
    assert pipe.batches_per_epoch == 16 // per
    seen = [set() for _ in range(4)]
    for b in range(2 * pipe.batches_per_epoch):    # two epochs
        idx = pipe._indices_for(b)
        for d in range(4):
            seg = idx[d * per:(d + 1) * per]
            assert (shard_of_sample[seg] == d).all(), (b, d, seg)
            seen[d].update(seg.tolist())
    # an epoch covers every sample of every shard (balanced shards here)
    for d in range(4):
        assert seen[d] == set(np.flatnonzero(shard_of_sample == d).tolist())


def test_sharded_sampler_eval_is_deterministic():
    shard_of_sample = np.repeat(np.arange(2), 8)
    cfg = DataConfig(batch_size=4, num_workers=0, prefetch=1)
    p1 = HostPipeline(_ToyDataset(16), cfg, train=False,
                      shard_of_sample=shard_of_sample, n_shards=2)
    p2 = HostPipeline(_ToyDataset(16), cfg, train=False,
                      shard_of_sample=shard_of_sample, n_shards=2)
    for b in range(p1.batches_per_epoch):
        np.testing.assert_array_equal(p1._indices_for(b), p2._indices_for(b))


def test_sharded_sampler_rejects_indivisible_batch():
    with pytest.raises(ValueError, match="not divisible"):
        HostPipeline(_ToyDataset(16), DataConfig(batch_size=6),
                     train=True, shard_of_sample=np.zeros(16, int) % 1,
                     n_shards=4)


def test_resume_guard_rejects_different_shard_count():
    shard_of_sample = np.repeat(np.arange(2), 8)
    cfg = DataConfig(batch_size=4, num_workers=0)
    sharded = HostPipeline(_ToyDataset(16), cfg, train=True,
                           shard_of_sample=shard_of_sample, n_shards=2)
    plain = HostPipeline(_ToyDataset(16), cfg, train=True)
    state = sharded.state_dict()
    assert state["n_shards"] == 2
    with pytest.raises(ValueError, match="cache shard"):
        plain.load_state_dict(state)
    sharded.load_state_dict(state)   # same partition: fine


# ------------------------------------------------------- config validation

def test_cache_layout_requires_device_cache():
    with pytest.raises(ValueError, match="requires data.device_cache"):
        Config().override(**{
            "data.source": "hdf5", "data.path": "x.h5",
            "data.cache_layout": "sharded"})


# ------------------------------------------------ SPMD pixel-exact gather

def _fixture_cfg(path, **over):
    base = {
        "data.source": "hdf5", "data.path": str(path),
        "data.batch_size": 16, "data.num_workers": 0,
        "data.augment": False,
        "model.backbone": "cnn_small", "model.image_size": 64,
        "model.cameras": ("agentview",), "model.proprio_dim": 32,
        "train.eval_every": 0, "train.ckpt_every": 0,
    }
    base.update(over)
    return Config().override(**base)


def test_sharded_gather_matches_host_pixels(tmp_path):
    """The shard_map-local take over the P('data')-tiled cache must
    reproduce the host path's pixels EXACTLY for the same sample indices
    (same deterministic resize, augment off)."""
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_cache_gather,
    )

    path = tmp_path / "d.hdf5"
    write_demo_fixture(str(path), n_demos=9, steps=12, image_hw=72, seed=5)
    cfg = _fixture_cfg(path, **{"data.device_cache": True,
                                "data.cache_layout": "sharded"})
    store = build_dataset(cfg)
    n_dev = 8
    mesh = pmesh.make_mesh(n_dev)
    plan = build_shard_plan(store.frames_per_demo(), n_dev)
    store.cache_plan = plan

    hw = cfg.model.image_size
    cache_host = build_sharded_cache(store, hw, plan)
    bsh = pmesh.batch_sharding(mesh)
    cache = {c: jax.device_put(a, bsh) for c, a in cache_host.items()}

    # one valid sharded batch: sample s_d from each shard, 2 per device
    shard_of = plan.shard_of_sample(store.sample_demos())
    idx = np.concatenate([np.flatnonzero(shard_of == d)[:2]
                          for d in range(n_dev)])
    batch = store.get_batch(idx, augment=False, seed=0)
    assert "image_idx" in batch and "images" not in batch

    gather = make_cache_gather(mesh, "data")
    gathered = jax.jit(lambda c, b: gather(c, b)["images"])(
        cache, {"image_idx": jax.device_put(batch["image_idx"], bsh)})

    store.emit_image_indices = False
    ref = store.get_batch(idx, augment=False, seed=0)["images"]
    for cam in ref:
        np.testing.assert_array_equal(np.asarray(gathered[cam]), ref[cam])


def test_sharded_eval_matches_replicated_layout(tmp_path):
    """api.evaluate with the sharded cache == the replicated cache on the
    same 8-device mesh: balanced shards (equal-length demos, count
    divisible by the device count) cover the split fully in both layouts,
    so the metric means must agree to reduction-order tolerance."""
    path = tmp_path / "d.hdf5"
    write_demo_fixture(str(path), n_demos=8, steps=16, image_hw=72, seed=7)
    cfg = _fixture_cfg(path, **{
        "data.device_cache": True, "train.steps": 2, "train.log_every": 2,
        "train.ckpt_every": 2, "dist.num_devices": 8,
        "train.ckpt_dir": str(tmp_path / "ck")})
    rppe.train(cfg)

    m_rep = rppe.evaluate(cfg)
    m_sh = rppe.evaluate(cfg.override(**{"data.cache_layout": "sharded"}))
    assert set(m_rep) == set(m_sh)
    for k in m_rep:
        np.testing.assert_allclose(m_rep[k], m_sh[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_sharded_fit_and_resume_guard(tmp_path):
    """fit() end-to-end with cache_layout='sharded' on the 8-device mesh
    (train + sharded eval + checkpoint), then a resume at a different
    device count must fail with the n_shards message, and a same-count
    resume must proceed."""
    path = tmp_path / "d.hdf5"
    write_demo_fixture(str(path), n_demos=9, steps=12, image_hw=72, seed=5)
    cfg = _fixture_cfg(path, **{
        "data.device_cache": True, "data.cache_layout": "sharded",
        "dist.num_devices": 8,
        "train.steps": 2, "train.log_every": 2, "train.ckpt_every": 2,
        "train.eval_every": 2, "train.eval_steps": 1,
        "train.ckpt_dir": str(tmp_path / "ck")})
    out = rppe.train(cfg)
    assert np.isfinite(out["metrics"]["loss"])

    with pytest.raises(ValueError, match="cache shard"):
        rppe.train(cfg.override(**{"dist.num_devices": 4,
                                   "train.steps": 4}))

    out2 = rppe.train(cfg.override(**{"train.steps": 4}))
    assert np.isfinite(out2["metrics"]["loss"])
