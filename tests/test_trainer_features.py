"""Gradient accumulation, best-checkpoint tracking, lr logging."""

import json
import os

import jax
import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.config import TrainConfig
from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
    make_lr_schedule,
)


def test_grad_accum_matches_big_batch(tmp_path):
    """2 micro-steps at batch 16 with grad_accum=2 == 1 step at batch 32
    (SGD; same samples)."""
    from rgb_proprioceptive_pose_estimator_tpu.config import (
        Config, DataConfig, ModelConfig,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer, make_train_step,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model, example_batch,
    )

    mcfg = ModelConfig(backbone="none", cameras=(), use_proprio=True,
                       proprio_dim=8, proprio_hidden=(16,),
                       proprio_features=8, head_hidden=(16,))
    batch32 = example_batch(mcfg, batch_size=32, rng=5)

    def run(accum):
        cfg = Config(model=mcfg,
                     train=TrainConfig(optimizer="sgd", lr=1e-2,
                                       grad_accum=accum))
        model = build_model(cfg.model)
        tx = make_optimizer(cfg.train)
        state = create_state(cfg, tx, seed=0)
        step = make_train_step(model, tx, cfg.train)
        if accum == 1:
            state, _ = step(state, batch32)
        else:
            for lo in (0, 16):
                micro = jax.tree.map(lambda x: x[lo:lo + 16], batch32)
                state, _ = step(state, micro)
        return jax.device_get(state.params)

    p_big = run(1)
    p_acc = run(2)
    for a, b in zip(jax.tree.leaves(p_big), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_best_checkpoint_tracked(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 60,
        "train.eval_every": 20,
        "train.eval_steps": 2,
        "train.ckpt_every": 60,
        "train.log_every": 100,
        "train.ckpt_dir": ckpt_dir,
        "train.ckpt_best_metric": "pos_mae_cm",
        "data.synthetic_size": 128,
    })
    rppe.train(cfg)
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    # loss decreases, so the best checkpoint should be a late step
    from rgb_proprioceptive_pose_estimator_tpu.utils.checkpoint import (
        CheckpointManager,
    )

    best = CheckpointManager(os.path.join(ckpt_dir, "best"), keep=1,
                             async_save=False)
    best_step = best.latest_step()
    assert best_step in (20, 40, 60)
    best.close()

    # step="best" restores that checkpoint through every consumer's
    # shared _restore path (evaluate / Predictor / export)
    out = rppe.evaluate(cfg, step="best", max_batches=1)
    assert out["step"] == best_step
    with pytest.raises(ValueError):
        rppe.evaluate(cfg, step="bogus", max_batches=1)


def test_best_restore_without_best_dir_fails_loudly(tmp_path):
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 20,
        "train.eval_every": 0,
        "train.ckpt_every": 20,
        "train.log_every": 20,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "data.synthetic_size": 128,
    })
    rppe.train(cfg)    # no ckpt_best_metric -> no best/ dir
    with pytest.raises(FileNotFoundError, match="ckpt_best_metric"):
        rppe.evaluate(cfg, step="best", max_batches=1)


def test_best_metric_typo_fails_loudly(tmp_path):
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 20,
        "train.eval_every": 20,
        "train.eval_steps": 1,
        "train.ckpt_every": 20,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "train.ckpt_best_metric": "nope_mae",
        "data.synthetic_size": 128,
    })
    with pytest.raises(KeyError):
        rppe.train(cfg)


def test_lr_logged_and_scheduled(tmp_path):
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 30,
        "train.eval_every": 0,
        "train.ckpt_every": 30,
        "train.log_every": 10,
        "train.lr_schedule": "cosine",
        "train.warmup_steps": 10,
        "train.lr": 1e-2,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "data.synthetic_size": 128,
    })
    out = rppe.train(cfg)
    assert "lr" in out["metrics"]
    # cosine decays to ~0 by the final step
    assert out["metrics"]["lr"] < 1e-2

    sched = make_lr_schedule(cfg.train)
    assert float(sched(10)) == pytest.approx(1e-2, rel=1e-3)
    assert float(sched(30)) < float(sched(15))


def test_freeze_backbone_finetune(tmp_path, demo_h5):
    """model.freeze_backbone: encoder params bitwise-frozen (including
    under adamw weight decay, which a zero-grad hack would violate),
    head/proprio params train, resume round-trips the masked opt state."""
    import jax
    import numpy as np

    import rgb_proprioceptive_pose_estimator_tpu as rppe

    cfg = rppe.preset("pr2").override(**{
        "model.image_size": 32,
        "model.image_features": 32,
        "model.head_hidden": [32],
        "model.freeze_backbone": True,
        "data.path": demo_h5,
        "data.batch_size": 8,
        "data.num_workers": 0,
        "train.steps": 6,
        "train.optimizer": "adamw",
        "train.weight_decay": 0.1,      # large: any decay leak is visible
        "train.log_every": 3,
        "train.eval_every": 0,
        "train.ckpt_every": 6,
        "train.ckpt_dir": str(tmp_path / "frz"),
    })
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        frozen_prefixes_for,
        make_optimizer,
    )

    tx = make_optimizer(cfg.train, frozen_prefixes_for(cfg))
    init = create_state(cfg, tx, seed=cfg.train.seed)
    out = rppe.train(cfg)
    p0, p1 = init.params, out["state"].params
    for k in p1:
        leaves0 = jax.tree.leaves(p0[k])
        leaves1 = jax.tree.leaves(p1[k])
        if k.startswith("encoder_"):
            for a, b in zip(leaves0, leaves1):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            assert any(
                not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(leaves0, leaves1)), f"{k} did not train"
    # restore path rebuilds the masked opt-state structure
    ev = rppe.evaluate(cfg, max_batches=1)
    assert np.isfinite(ev["pos_mae_cm"])


def test_freeze_backbone_rejects_flat_optimizer():
    import pytest

    import rgb_proprioceptive_pose_estimator_tpu as rppe
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        frozen_prefixes_for,
        make_optimizer,
    )

    cfg = rppe.preset("pr2").override(**{
        "model.freeze_backbone": True, "train.flat_optimizer": True})
    with pytest.raises(ValueError, match="flat_optimizer"):
        make_optimizer(cfg.train, frozen_prefixes_for(cfg))


def test_ema_params_math():
    """train.ema_decay: state.ema_params tracks the exact per-step EMA of
    the parameter trajectory (init at params, no bias correction)."""
    from rgb_proprioceptive_pose_estimator_tpu.config import (
        Config, ModelConfig,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer, make_train_step,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model, example_batch,
    )

    mcfg = ModelConfig(backbone="none", cameras=(), use_proprio=True,
                       proprio_dim=8, proprio_hidden=(16,),
                       proprio_features=8, head_hidden=(16,))
    cfg = Config(model=mcfg,
                 train=TrainConfig(optimizer="sgd", lr=1e-2, ema_decay=0.8))
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_state(cfg, tx, seed=0)
    step = make_train_step(model, tx, cfg.train)

    expected = jax.device_get(state.params)
    for i in range(3):
        batch = example_batch(mcfg, batch_size=16, rng=i)
        state, _ = step(state, batch)
        p = jax.device_get(state.params)
        expected = jax.tree.map(lambda e, q: 0.8 * e + 0.2 * q, expected, p)
    got = jax.device_get(state.ema_params)
    for a, b in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_ema_e2e_eval_uses_ema(tmp_path):
    """fit() with ema_decay: the EMA survives the checkpoint round-trip,
    and evaluate()/Predictor apply the EMA weights, not the raw params."""
    from rgb_proprioceptive_pose_estimator_tpu.api import Predictor, _restore

    cfg = rppe.preset("pr1").override(**{
        "train.ema_decay": 0.995,   # slow EMA: stays far from the raw
        # params over 40 steps, so EMA-vs-raw outputs must differ
        "train.steps": 40,
        "train.eval_every": 20,
        "train.eval_steps": 2,
        "train.ckpt_every": 40,
        "train.log_every": 40,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "data.synthetic_size": 256,
    })
    out = rppe.train(cfg)
    st = out["state"]
    assert st.ema_params is not None
    # EMA lags the trained params
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(st.params),
                        jax.tree.leaves(st.ema_params)))

    # checkpoint round-trip carries the EMA (template has the ema slot)
    _, restored, _ = _restore(cfg, None, None)
    for a, b in zip(jax.tree.leaves(st.ema_params),
                    jax.tree.leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Predictor output changes when the EMA is stripped -> it applies EMA
    obs = {"proprio": np.linspace(-1, 1, 32).astype(np.float32)}
    pos_ema, _ = Predictor(cfg, state=st, model=out["model"])(obs)
    pos_raw, _ = Predictor(cfg, state=st.replace(ema_params=None),
                           model=out["model"])(obs)
    assert not np.allclose(pos_ema, pos_raw)

    ev = rppe.evaluate(cfg)
    assert np.isfinite(ev["pos_mae_cm"]) and np.isfinite(ev["rot_mae_deg"])


def test_ema_decay_validated():
    with pytest.raises(ValueError, match="ema_decay"):
        rppe.preset("pr1").override(**{"train.ema_decay": 1.0})


def test_proprio_normalize_e2e(tmp_path):
    """model.proprio_normalize: fit() writes train-split stats into
    batch_stats; the checkpoint carries them into evaluate() (no separate
    stats file -- they live with the params)."""
    from rgb_proprioceptive_pose_estimator_tpu.data.pipeline import (
        build_dataset,
    )

    cfg = rppe.preset("pr1").override(**{
        "model.proprio_normalize": True,
        "data.synthetic_size": 256,
        "data.val_fraction": 0.25,
        "train.steps": 4,
        "train.eval_every": 0,
        "train.eval_steps": 0,
        "train.ckpt_every": 4,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
    })
    out = rppe.train(cfg)
    bs = jax.device_get(out["state"].batch_stats)["proprio"]
    mean, std = build_dataset(cfg, split="train").proprio_stats()
    np.testing.assert_allclose(bs["proprio_mean"], mean, rtol=1e-5)
    np.testing.assert_allclose(bs["proprio_std"], std, rtol=1e-5)
    assert float(np.abs(mean).max()) > 0  # real stats, not the identity

    ev = rppe.evaluate(cfg, split="val")
    assert np.isfinite(ev["pos_mae_cm"]) and np.isfinite(ev["rot_mae_deg"])


def test_multistep_lr_schedule():
    """train.lr_schedule='multistep': torch MultiStepLR semantics (updates
    >= milestone run at lr*rate^k), in optimizer-update units under
    grad_accum, composed with linear warmup."""
    cfg = TrainConfig(lr=1.0, lr_schedule="multistep",
                      lr_decay_steps=(10, 20), lr_decay_rate=0.1)
    s = make_lr_schedule(cfg)
    got = [float(s(c)) for c in (0, 9, 10, 19, 20, 25)]
    np.testing.assert_allclose(got, [1.0, 1.0, 0.1, 0.1, 0.01, 0.01],
                               rtol=1e-6)

    # milestones are configured in micro-steps: grad_accum=2 halves them
    # (ceil) in update units
    cfg2 = TrainConfig(lr=1.0, lr_schedule="multistep",
                       lr_decay_steps=(10,), lr_decay_rate=0.5, grad_accum=2)
    s2 = make_lr_schedule(cfg2)
    assert float(s2(4)) == 1.0 and float(s2(5)) == 0.5

    # warmup ramps toward the CURRENT tier
    cfg3 = TrainConfig(lr=1.0, lr_schedule="multistep", warmup_steps=4,
                       lr_decay_steps=(100,), lr_decay_rate=0.1)
    s3 = make_lr_schedule(cfg3)
    np.testing.assert_allclose(
        [float(s3(c)) for c in (0, 1, 2, 4, 8)],
        [0.0, 0.25, 0.5, 1.0, 1.0], rtol=1e-6)

    with pytest.raises(ValueError, match="lr_decay_steps"):
        TrainConfig(lr_schedule="multistep")
    with pytest.raises(ValueError, match="lr_decay_steps"):
        TrainConfig(lr_schedule="multistep", lr_decay_steps=(20, 10))
    with pytest.raises(ValueError, match="lr_decay_rate"):
        TrainConfig(lr_schedule="multistep", lr_decay_steps=(10,),
                    lr_decay_rate=0.0)


def test_early_stopping(tmp_path):
    """train.early_stop_patience: with lr=0 the eval metric can never
    improve after the first eval, so training stops after `patience`
    stale evals and checkpoints the stop step."""
    cfg = rppe.preset("pr1").override(**{
        "train.lr": 0.0,               # frozen params -> eval never improves
        "train.steps": 200,
        "train.eval_every": 20,
        "train.eval_steps": 0,         # full-epoch eval: deterministic, no
                                       # rotating-window noise in the metric
        "train.early_stop_patience": 2,
        "train.ckpt_every": 0,
        "train.log_every": 200,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
        "data.synthetic_size": 128,
    })
    out = rppe.train(cfg)
    # eval@20 sets best; evals @40, @60 are stale -> stop at 60
    assert out["metrics"]["early_stopped_at"] == 60.0

    # the final checkpoint is at the stop step and is restorable
    from rgb_proprioceptive_pose_estimator_tpu.utils.checkpoint import (
        CheckpointManager,
    )
    assert CheckpointManager(cfg.train.ckpt_dir).latest_step() == 60
    ev = rppe.evaluate(cfg)
    assert ev["step"] == 60
    assert np.isfinite(ev["pos_mae_cm"])


def test_early_stop_requires_eval():
    cfg = rppe.preset("pr1").override(**{
        "train.early_stop_patience": 3, "train.eval_every": 0})
    with pytest.raises(ValueError, match="early_stop_patience"):
        rppe.train(cfg)


def test_ema_bitwise_under_steps_per_call():
    """EMA updates inside the lax.scan multi-step dispatch: 4 single-step
    dispatches == one steps_per_call=4 dispatch, bitwise, including the
    EMA tree."""
    import jax.numpy as jnp

    from rgb_proprioceptive_pose_estimator_tpu.config import (
        Config, ModelConfig,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer, make_train_step,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model, example_batch,
    )

    mcfg = ModelConfig(backbone="none", cameras=(), use_proprio=True,
                       proprio_dim=8, proprio_hidden=(16,),
                       proprio_features=8, head_hidden=(16,))
    cfg = Config(model=mcfg,
                 train=TrainConfig(optimizer="sgd", lr=1e-2, ema_decay=0.9))
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    batches = [example_batch(mcfg, batch_size=16, rng=i) for i in range(4)]

    s1 = create_state(cfg, tx, seed=0)
    step1 = make_train_step(model, tx, cfg.train)
    for b in batches:
        s1, _ = step1(s1, b)

    s4 = create_state(cfg, tx, seed=0)
    step4 = make_train_step(model, tx, cfg.train, unroll=4)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    s4, _ = step4(s4, stacked)

    for a, b in zip(jax.tree.leaves(jax.device_get(s1.ema_params)),
                    jax.tree.leaves(jax.device_get(s4.ema_params))):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s4.params))):
        np.testing.assert_array_equal(a, b)


def test_ema_checkpoint_toggle(tmp_path):
    """Toggling train.ema_decay across a save/restore boundary degrades
    gracefully: upgrading (pre-EMA checkpoint, EMA now on) restarts the
    average at the restored params; downgrading drops the EMA tree."""
    from rgb_proprioceptive_pose_estimator_tpu.api import _restore

    base = {
        "train.steps": 10, "train.eval_every": 0, "train.ckpt_every": 0,
        "train.log_every": 10, "data.synthetic_size": 64,
    }
    # save WITHOUT ema, restore WITH ema
    cfg_off = rppe.preset("pr1").override(
        **base, **{"train.ckpt_dir": str(tmp_path / "a")})
    rppe.train(cfg_off)
    cfg_on = cfg_off.override(**{"train.ema_decay": 0.99})
    _, st, step = _restore(cfg_on, None, None)
    assert step == 10 and st.ema_params is not None
    for a, b in zip(jax.tree.leaves(jax.device_get(st.params)),
                    jax.tree.leaves(jax.device_get(st.ema_params))):
        np.testing.assert_array_equal(a, b)

    # save WITH ema, restore WITHOUT
    cfg_on2 = rppe.preset("pr1").override(
        **base, **{"train.ckpt_dir": str(tmp_path / "b"),
                   "train.ema_decay": 0.99})
    rppe.train(cfg_on2)
    cfg_off2 = cfg_on2.override(**{"train.ema_decay": 0.0})
    _, st2, _ = _restore(cfg_off2, None, None)
    assert st2.ema_params is None
    ev = rppe.evaluate(cfg_off2)
    assert np.isfinite(ev["pos_mae_cm"])


def test_ema_bn_recalibration():
    """train.ema_bn_recal_batches (torch swa_utils.update_bn recipe):
    recalibrate_batch_stats equals a manual chain of train-mode applies
    with the EMA params, and actually moves the stats."""
    from rgb_proprioceptive_pose_estimator_tpu.config import (
        Config, ModelConfig,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_bn_recal_step, make_optimizer, make_train_step,
        recalibrate_batch_stats,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model, example_batch,
    )

    mcfg = ModelConfig(backbone="cnn_small", image_size=32,
                       use_proprio=False, image_features=16,
                       head_hidden=(16,))
    cfg = Config(model=mcfg, train=TrainConfig(optimizer="sgd", lr=0.05,
                                               ema_decay=0.5))
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_state(cfg, tx, seed=0)
    step = make_train_step(model, tx, cfg.train)
    for i in range(5):
        state, _ = step(state, example_batch(mcfg, batch_size=8, rng=i))

    batches = [example_batch(mcfg, batch_size=8, rng=100 + i)
               for i in range(6)]
    recal = make_bn_recal_step(model, cfg.train)
    bs = recalibrate_batch_stats(recal, state, iter(batches), 6,
                                 momentum=mcfg.bn_momentum)

    # torch update_bn oracle: cumulative average of per-batch statistics
    # (each recovered from an independent momentum update against the
    # SAME original stats -- train-mode forwards don't read running stats)
    m = mcfg.bn_momentum
    per_batch = []
    for b in batches:
        _, mut = model.apply(
            {"params": state.ema_params, "batch_stats": state.batch_stats},
            b, train=True, mutable=["batch_stats"])
        per_batch.append(jax.tree.map(
            lambda nb, ob: (np.asarray(nb) - m * np.asarray(ob)) / (1 - m),
            jax.device_get(mut["batch_stats"]),
            jax.device_get(state.batch_stats)))
    want = jax.tree.map(lambda *xs: np.mean(np.stack(xs), axis=0),
                        *per_batch)
    got = jax.tree.leaves(jax.device_get(bs))
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(jax.device_get(state.batch_stats)),
                        got))
    for a, b in zip(got, jax.tree.leaves(want)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)

    # cumulative-average property: N copies of one batch == that batch's
    # statistics exactly (a momentum blend would still carry 0.9^N of the
    # stale stats -- the torch update_bn distinction)
    one = recalibrate_batch_stats(recal, state, iter([batches[0]] * 4), 4,
                                  momentum=m)
    ref = recalibrate_batch_stats(recal, state, iter(batches[:1]), 1,
                                  momentum=m)
    for a, b in zip(jax.tree.leaves(jax.device_get(one)),
                    jax.tree.leaves(jax.device_get(ref))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_bn_recal_with_proprio_dropout():
    """Regression (code review r3): the recal forward must supply a
    dropout rng -- model.proprio_dropout > 0 + ema_bn_recal crashed with
    InvalidRngError before the fix."""
    from rgb_proprioceptive_pose_estimator_tpu.config import (
        Config, ModelConfig,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_bn_recal_step, make_optimizer, recalibrate_batch_stats,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model, example_batch,
    )

    mcfg = ModelConfig(backbone="cnn_small", image_size=32,
                       use_proprio=True, proprio_dim=8,
                       proprio_hidden=(16,), proprio_features=8,
                       proprio_dropout=0.5, image_features=16,
                       head_hidden=(16,))
    cfg = Config(model=mcfg, train=TrainConfig(optimizer="sgd", lr=0.05,
                                               ema_decay=0.5))
    model = build_model(cfg.model)
    state = create_state(cfg, make_optimizer(cfg.train), seed=0)
    recal = make_bn_recal_step(model, cfg.train)
    bs = recalibrate_batch_stats(
        recal, state, iter([example_batch(mcfg, batch_size=8, rng=0)]), 1,
        momentum=mcfg.bn_momentum)
    assert all(np.all(np.isfinite(x))
               for x in jax.tree.leaves(jax.device_get(bs)))


def test_ema_gated_on_grad_accum_boundary():
    """Regression (code review r3): under grad_accum the EMA must update
    only when MultiSteps applies a real optimizer update -- not on every
    micro-step (which would shorten the horizon to decay^N)."""
    import jax.numpy as jnp

    from rgb_proprioceptive_pose_estimator_tpu.config import (
        Config, ModelConfig,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer, make_train_step,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model, example_batch,
    )

    d = 0.5
    mcfg = ModelConfig(backbone="none", cameras=(), use_proprio=True,
                       proprio_dim=8, proprio_hidden=(16,),
                       proprio_features=8, head_hidden=(16,))
    cfg = Config(model=mcfg,
                 train=TrainConfig(optimizer="sgd", lr=1e-2, ema_decay=d,
                                   grad_accum=2))
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_state(cfg, tx, seed=0)
    step = make_train_step(model, tx, cfg.train)

    expected = jax.device_get(state.params)
    for i in range(4):                       # 4 micro-steps = 2 updates
        state, _ = step(state, example_batch(mcfg, batch_size=8, rng=i))
        if i % 2 == 1:                       # an update was applied
            p = jax.device_get(state.params)
            expected = jax.tree.map(lambda e, q: d * e + (1 - d) * q,
                                    expected, p)
    for a, b in zip(jax.tree.leaves(expected),
                    jax.tree.leaves(jax.device_get(state.ema_params))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_ema_bn_recal_e2e(tmp_path, demo_h5):
    """fit() with ema_decay + ema_bn_recal_batches: the final checkpoint
    ships recalibrated stats (differs from a no-recal run's), and
    evaluate() serves finite metrics from them."""
    base = {
        "model.image_size": 64, "model.image_features": 32,
        "model.head_hidden": [32],
        "data.path": demo_h5, "data.batch_size": 16,
        "data.num_workers": 2,
        "train.steps": 30, "train.eval_every": 30, "train.eval_steps": 2,
        "train.ckpt_every": 0, "train.log_every": 30,
        "train.ema_decay": 0.9,
    }
    from rgb_proprioceptive_pose_estimator_tpu.api import _restore

    cfg_a = rppe.preset("pr2").override(
        **base, **{"train.ckpt_dir": str(tmp_path / "a")})
    rppe.train(cfg_a)
    cfg_b = rppe.preset("pr2").override(
        **base, **{"train.ckpt_dir": str(tmp_path / "b"),
                   "train.ema_bn_recal_batches": 4})
    rppe.train(cfg_b)

    _, sa, _ = _restore(cfg_a, None, None)
    _, sb, _ = _restore(cfg_b, None, None)
    # same training trajectory (recal never feeds back into training), so
    # params match; stats differ (recalibrated to the EMA weights)
    for a, b in zip(jax.tree.leaves(jax.device_get(sa.params)),
                    jax.tree.leaves(jax.device_get(sb.params))):
        np.testing.assert_array_equal(a, b)
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(jax.device_get(sa.batch_stats)),
                        jax.tree.leaves(jax.device_get(sb.batch_stats))))
    ev = rppe.evaluate(cfg_b)
    assert np.isfinite(ev["pos_mae_cm"])


def test_ema_bn_recal_replaces_final_cadence_save(tmp_path, demo_h5):
    """When ckpt_every divides steps, the final checkpoint is a cadence
    save made with raw training stats; with recal on it must be replaced
    so the LAST checkpoint serves matched stats."""
    from rgb_proprioceptive_pose_estimator_tpu.api import _restore

    base = {
        "model.image_size": 64, "model.image_features": 32,
        "model.head_hidden": [32],
        "data.path": demo_h5, "data.batch_size": 16,
        "data.num_workers": 2,
        "train.steps": 20, "train.eval_every": 0,
        "train.ckpt_every": 20,       # cadence save lands ON the final step
        "train.log_every": 20, "train.ema_decay": 0.9,
    }
    cfg_a = rppe.preset("pr2").override(
        **base, **{"train.ckpt_dir": str(tmp_path / "a")})
    rppe.train(cfg_a)
    cfg_b = rppe.preset("pr2").override(
        **base, **{"train.ckpt_dir": str(tmp_path / "b"),
                   "train.ema_bn_recal_batches": 4})
    rppe.train(cfg_b)

    _, sa, step_a = _restore(cfg_a, None, None)
    _, sb, step_b = _restore(cfg_b, None, None)
    assert step_a == step_b == 20
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(jax.device_get(sa.batch_stats)),
                        jax.tree.leaves(jax.device_get(sb.batch_stats))))


def test_init_from_warm_start_fit(tmp_path):
    """train.init_from: a NEW run (different optimizer -> structurally
    different opt state) starts AT the source run's final weights. lr=0
    in the finetune makes that exact through the full fit() path, and a
    rerun in the same ckpt_dir resumes instead of re-applying the init."""
    src_dir = str(tmp_path / "src")
    base = rppe.preset("pr1").override(**{
        "train.steps": 30, "train.eval_every": 0, "train.ckpt_every": 30,
        "train.log_every": 30, "train.ckpt_dir": src_dir,
        "data.synthetic_size": 128,
    })
    src = rppe.train(base)
    src_params = jax.device_get(src["state"].params)

    ft_dir = str(tmp_path / "ft")
    ft_cfg = base.override(**{
        "train.ckpt_dir": ft_dir, "train.init_from": src_dir,
        "train.optimizer": "sgd", "train.lr": 0.0,
        "train.steps": 10, "train.ckpt_every": 10, "train.log_every": 10,
    })
    ft = rppe.train(ft_cfg)
    for a, b in zip(jax.tree.leaves(src_params),
                    jax.tree.leaves(jax.device_get(ft["state"].params))):
        np.testing.assert_array_equal(a, b)

    # preempted-run semantics: same ckpt_dir again -> resume wins, the
    # warm start is NOT re-applied (and the run continues to step 20)
    ft2 = rppe.train(ft_cfg.override(**{"train.steps": 20}))
    assert int(jax.device_get(ft2["state"].step)) == 20


def test_init_from_takes_serving_weights_fresh_optimizer(tmp_path):
    """Unit-level warm_start_state: the SOURCE's EMA (serving) weights and
    batch_stats land in the new state; the new run keeps its own fresh
    (structurally different: frozen-encoder sgd vs adam) optimizer state,
    step 0, and an EMA restarted at the warm-start weights."""
    import rgb_proprioceptive_pose_estimator_tpu as rppe
    from rgb_proprioceptive_pose_estimator_tpu.engine.loop import (
        warm_start_state,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import create_state
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        frozen_prefixes_for,
        make_optimizer,
    )
    from rgb_proprioceptive_pose_estimator_tpu.utils.checkpoint import (
        CheckpointManager,
    )

    src_cfg = rppe.preset("pr2").override(**{
        "model.image_size": 32, "model.image_features": 32,
        "model.head_hidden": [32], "train.ema_decay": 0.99,
    })
    src_state = create_state(src_cfg, make_optimizer(src_cfg.train), seed=0)
    # make the EMA distinguishable from the raw params
    src_state = src_state.replace(
        ema_params=jax.tree.map(lambda x: x * 2.0, src_state.params),
        step=77)
    mngr = CheckpointManager(str(tmp_path / "src"), async_save=False)
    mngr.save(77, src_state)
    mngr.close()

    ft_cfg = src_cfg.override(**{
        "model.freeze_backbone": True,
        "train.optimizer": "sgd", "train.ema_decay": 0.5,
    })
    tx = make_optimizer(ft_cfg.train, frozen_prefixes_for(ft_cfg))
    ft_state = create_state(ft_cfg, tx, seed=1)
    fresh_opt = ft_state.opt_state
    warm = warm_start_state(ft_state, str(tmp_path / "src"))

    for a, b in zip(jax.tree.leaves(jax.device_get(src_state.ema_params)),
                    jax.tree.leaves(jax.device_get(warm.params))):
        np.testing.assert_array_equal(a, b)          # serving weights
    for a, b in zip(jax.tree.leaves(jax.device_get(src_state.batch_stats)),
                    jax.tree.leaves(jax.device_get(warm.batch_stats))):
        np.testing.assert_array_equal(a, b)          # BN stats come along
    for a, b in zip(jax.tree.leaves(jax.device_get(warm.params)),
                    jax.tree.leaves(jax.device_get(warm.ema_params))):
        np.testing.assert_array_equal(a, b)          # EMA restarts at warm
    assert int(warm.step) == 0                       # fresh step counter
    assert (jax.tree_util.tree_structure(warm.opt_state)
            == jax.tree_util.tree_structure(fresh_opt))


def test_init_from_model_mismatch_fails_loudly(tmp_path):
    src_dir = str(tmp_path / "src")
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 10, "train.eval_every": 0, "train.ckpt_every": 10,
        "train.log_every": 10, "train.ckpt_dir": src_dir,
        "data.synthetic_size": 64,
    })
    rppe.train(cfg)
    bad = cfg.override(**{
        "train.ckpt_dir": str(tmp_path / "ft"),
        "train.init_from": src_dir,
        "model.proprio_hidden": [48, 48],   # different tree
    })
    with pytest.raises(ValueError, match="init_from"):
        rppe.train(bad)
    missing = cfg.override(**{
        "train.ckpt_dir": str(tmp_path / "ft2"),
        "train.init_from": str(tmp_path / "nope"),
    })
    with pytest.raises(FileNotFoundError):
        rppe.train(missing)
