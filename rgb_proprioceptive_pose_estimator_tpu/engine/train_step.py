"""The jitted train/eval steps -- the hot loop (SURVEY.md section 4.1).

One XLA program per step: forward, loss, backward, data-parallel gradient
psum, optax update, BN running-stat update (BASELINE.json:5 "one jitted XLA
graph with data-parallel psum across chips"). The psum is not written by
hand: with the batch sharded on the 'data' mesh axis and parameters
replicated, XLA's SPMD partitioner inserts the all-reduce over ICI.

Recompilation discipline (SURVEY.md section 8 hard-part 5): fixed batch
shapes (the pipeline drops/pads partial batches) and donated state buffers.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from rgb_proprioceptive_pose_estimator_tpu.config import Config, TrainConfig
from rgb_proprioceptive_pose_estimator_tpu.engine.state import TrainState
from rgb_proprioceptive_pose_estimator_tpu.losses.pose import pose_loss, pose_metrics


def make_lr_schedule(cfg: TrainConfig):
    """The learning-rate schedule as a callable update-count -> lr (also
    used for metric logging).

    Schedules run in OPTIMIZER-UPDATE units: with grad_accum > 1,
    optax.MultiSteps advances the inner step once per N micro-batches, so
    warmup/decay horizons (configured in micro-steps, same units as
    cfg.steps) are divided by grad_accum here."""
    accum = max(cfg.grad_accum, 1)
    # ceil: a configured warmup must survive accumulation (warmup_steps <
    # grad_accum would otherwise silently disable it)
    warmup = -(-cfg.warmup_steps // accum) if cfg.warmup_steps > 0 else 0
    total = max(cfg.steps // accum, 1)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.lr,
            warmup_steps=max(warmup, 1),
            decay_steps=max(total, warmup + 1),
        )
    if cfg.lr_schedule == "multistep":
        # torch MultiStepLR semantics: updates >= milestone run at
        # lr * rate^(milestones passed). Written as a closure over a jnp
        # comparison (not optax.piecewise_constant_schedule) so the
        # milestone boundary is inclusive like torch's and composes with
        # warmup without join_schedules' step-rebasing.
        bounds = jnp.asarray(
            [-(-m // accum) for m in cfg.lr_decay_steps], jnp.int32)

        def multistep(count):
            n = jnp.sum(jnp.asarray(count) >= bounds).astype(jnp.float32)
            v = cfg.lr * jnp.power(cfg.lr_decay_rate, n)
            if warmup > 0:
                v = v * jnp.minimum(jnp.asarray(count, jnp.float32)
                                    / warmup, 1.0)
            return v

        return multistep
    if warmup > 0:
        return optax.linear_schedule(0.0, cfg.lr, warmup)
    return lambda step: cfg.lr


def make_optimizer(cfg: TrainConfig,
                   frozen_prefixes: Tuple[str, ...] = ()
                   ) -> optax.GradientTransformation:
    """`frozen_prefixes`: top-level param-tree keys with these prefixes
    are excluded from optimization (optax.masked) -- model.freeze_backbone
    passes ("encoder_", "lstm_"). The mask must be identical at tx.init
    and restore time (MaskedState changes the opt-state structure), which
    is why it is derived from config, not discovered dynamically."""
    lr = make_lr_schedule(cfg)

    if cfg.optimizer == "adam":
        tx = optax.adam(lr)
    elif cfg.optimizer == "adamw":
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if frozen_prefixes:
        if cfg.flat_optimizer:
            # flatten ravels the whole tree into one vector; a tree-mask
            # cannot compose with it
            raise ValueError(
                "model.freeze_backbone is incompatible with "
                "train.flat_optimizer (optax.flatten erases the tree "
                "structure the freeze mask needs)")

        # NOT optax.masked: masked passes the masked-out leaves through
        # UNCHANGED, i.e. the raw gradient would become the "update" and
        # apply_updates would add it to the frozen params (measured:
        # divergence in 4 steps). multi_transform routes frozen leaves to
        # set_to_zero, which is the actual freeze semantics.
        def labels(updates):
            return {
                k: jax.tree.map(
                    lambda _: ("frozen" if any(k.startswith(p)
                                               for p in frozen_prefixes)
                               else "train"), v)
                for k, v in updates.items()
            }

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)
    if cfg.flat_optimizer:
        # run the update on one flattened vector instead of ~60 per-leaf
        # ops: turns the optimizer tail of tiny kernels into a few
        # bandwidth-bound fusions (roofline tail, docs/DESIGN.md).
        # Mathematically identical for elementwise transforms (adam/sgd/
        # clip-by-global-norm all are).
        tx = optax.flatten(tx)
    if cfg.grad_accum > 1:
        # accumulate over N micro-batches; the optimizer update (and thus
        # the logical step) applies every N calls of the jitted step
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def frozen_prefixes_for(cfg: Config) -> Tuple[str, ...]:
    """Param-tree prefixes model.freeze_backbone excludes from training."""
    return ("encoder_", "lstm_") if cfg.model.freeze_backbone else ()


def filter_compiler_options(opts: Optional[Dict[str, str]]
                            ) -> Optional[Dict[str, str]]:
    """Drop backend-inapplicable XLA compile options. Presets carry TPU
    tuning (train.compiler_opts, e.g. xla_tpu_scoped_vmem_limit_kib); the
    CPU test backend rejects unknown options at compile time, so xla_tpu_*
    entries are stripped off-TPU. Returns None when nothing remains (jit
    treats None as 'no options')."""
    if not opts:
        return None
    if jax.default_backend() != "tpu":
        opts = {k: v for k, v in opts.items()
                if not k.startswith("xla_tpu_")}
    return dict(opts) or None


def gather_cached_images(image_cache: Dict[str, jax.Array], batch):
    """Device-resident dataset (data.device_cache): materialize
    batch["images"] by gathering HBM-cached frames with the batch's int32
    flat indices. The gather compiles into the step; with the batch dim
    sharded and the cache replicated, each shard gathers locally."""
    idx = batch["image_idx"]
    out = dict(batch)
    del out["image_idx"]
    out["images"] = {cam: jnp.take(arr, idx, axis=0)
                     for cam, arr in image_cache.items()}
    return out


def make_cache_gather(mesh, axis: str) -> Callable:
    """Gather for the SHARDED device cache (data.cache_layout="sharded",
    data/cache_shard.py): the cache's row axis is sharded on `axis` and the
    batch's image_idx carries SHARD-LOCAL rows (the sampler constrains
    batch segment d to device d's shard), so the correct program is a
    shard_map-local take -- zero collectives, identical per-device work to
    the replicated gather. A plain jnp.take here would be wrong: under SPMD
    XLA treats indices as global rows of the full (sharded) array and
    inserts cross-device traffic the index stream never needs."""
    from jax.sharding import PartitionSpec as P

    def _take(arr, idx):
        return jnp.take(arr, idx, axis=0)

    local_take = jax.shard_map(_take, mesh=mesh,
                               in_specs=(P(axis), P(axis)),
                               out_specs=P(axis))

    def gather(image_cache: Dict[str, jax.Array], batch):
        idx = batch["image_idx"]
        out = dict(batch)
        del out["image_idx"]
        out["images"] = {cam: local_take(arr, idx)
                         for cam, arr in image_cache.items()}
        return out

    return gather


def make_train_step(model, tx: optax.GradientTransformation,
                    cfg: TrainConfig,
                    device_aug: Optional[Dict[str, Any]] = None,
                    unroll: int = 1,
                    cache_gather: Optional[Callable] = None) -> Callable:
    """See _make_train_step; applies cfg.compiler_opts (backend-filtered)."""
    return _make_train_step(
        model, tx, cfg, device_aug=device_aug, unroll=unroll,
        cache_gather=cache_gather,
        compiler_options=filter_compiler_options(cfg.compiler_opts))


def _make_train_step(model, tx: optax.GradientTransformation,
                     cfg: TrainConfig,
                     device_aug: Optional[Dict[str, Any]] = None,
                     unroll: int = 1,
                     cache_gather: Optional[Callable] = None,
                     compiler_options: Optional[Dict[str, str]] = None
                     ) -> Callable:
    """Build the jitted train step: (state, batch) -> (state, metrics).

    `device_aug` (from Config.data when data.augment_device is set) fuses
    crop/flip/jitter into this step: dict with keys
    {cameras, out_hw, hflip_prob, jitter_*} -- see
    ops/image_augment_device.py.

    `unroll` > 1 (train.steps_per_call): the jitted function takes a batch
    whose leaves carry a leading microstep axis of length `unroll` and runs
    that many optimizer steps in ONE dispatch via `lax.scan` -- identical
    per-step numerics, but host/runtime dispatch overhead is paid once per
    `unroll` steps (~3% of step time through a proxied TPU backend).
    Returned metrics then carry a leading (unroll,) axis.

    The returned callable's signature is (state, batch, image_cache=None):
    `image_cache` is the device-resident frame cache (data.device_cache),
    passed as a TRACED ARGUMENT -- closure-capturing it would embed the
    whole dataset as an HLO constant (rejected by remote compilers past
    ~100 MB and bloating every executable).

    `cache_gather` overrides the gather used on that cache (default:
    gather_cached_images, correct for the replicated layout); the sharded
    cache layout passes make_cache_gather's shard_map-local take."""
    do_gather = cache_gather or gather_cached_images

    def loss_fn(params, batch_stats, batch, dropout_key):
        variables = {"params": params, "batch_stats": batch_stats}
        (pos, quat), mutated = model.apply(
            variables, batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key})
        loss, aux = pose_loss(
            pos, quat, batch["target_pos"], batch["target_quat"],
            pos_weight=cfg.pos_weight, rot_weight=cfg.rot_weight,
            rot_loss=cfg.rot_loss, pos_loss=cfg.pos_loss,
            huber_delta=cfg.huber_delta)
        return loss, (aux, mutated["batch_stats"])

    def step(state: TrainState, batch, image_cache=None
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if image_cache is not None and "image_idx" in batch:
            batch = do_gather(image_cache, batch)
        if device_aug is not None:
            from rgb_proprioceptive_pose_estimator_tpu.ops.image_augment_device import (
                augment_batch_images,
            )

            key = jax.random.fold_in(state.rng, state.step)
            batch = augment_batch_images(key, batch, **device_aug)
        # distinct stream from the device-aug key (fold_in(rng, step));
        # unused (and free) unless the model has dropout
        dropout_key = jax.random.fold_in(
            jax.random.fold_in(state.rng, 1), state.step)
        grad_fn = jax.grad(loss_fn, has_aux=True)
        grads, (aux, new_batch_stats) = grad_fn(
            state.params, state.batch_stats, batch, dropout_key)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if cfg.ema_decay > 0:
            # one fused elementwise pass over the f32 params; under
            # flat_optimizer the tree is still per-leaf here (flatten only
            # wraps the optimizer transform)
            d = cfg.ema_decay
            new_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                   state.ema_params, new_params)
            if cfg.grad_accum > 1:
                # MultiSteps applies the real update every N micro-steps;
                # decaying the EMA on the no-op micro-steps too would
                # silently shorten the horizon to ema_decay^N per actual
                # update. mini_step == 0 exactly when this call applied an
                # update (MultiSteps is the outermost wrap, make_optimizer)
                applied = new_opt_state.mini_step == 0
                new_ema = jax.tree.map(
                    lambda e, n: jnp.where(applied, n, e),
                    state.ema_params, new_ema)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            rng=state.rng,
            ema_params=new_ema,
        )
        metrics = dict(aux)
        if cfg.log_grad_norm:
            # ~60 tiny per-leaf reductions + a concat every step; opt-in
            # (the roofline tail in docs/DESIGN.md) -- grad_clip > 0 pays
            # for it anyway inside optax
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if unroll <= 1:
        return jax.jit(step, donate_argnums=(0,),
                       compiler_options=compiler_options)

    def multi_step(state: TrainState, batches, image_cache=None):
        def body(s, b):
            return step(s, b, image_cache)

        return jax.lax.scan(body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,),
                   compiler_options=compiler_options)


@functools.lru_cache(maxsize=8)
def _stack_fn(out_shardings) -> Callable:
    """One jitted stack function PER output sharding, cached at module
    level. Defining the @jax.jit closure inside stack_microbatches (the
    round-2 version) made every call a fresh function object, so jax's
    trace cache never hit and each training iteration with
    steps_per_call > 1 paid a full retrace+compile (~0.38 s vs ~30 us
    cached -- ADVICE r2). NamedSharding is hashable, so lru_cache keys on
    it directly; different batch tree structures/shapes hit jax.jit's own
    cache inside the single function object."""

    @functools.partial(jax.jit, out_shardings=out_shardings)
    def _stack(*bs):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)

    return _stack


def stack_microbatches(batches, sharding=None) -> Any:
    """Stack a list of device-resident batches along a new leading
    microstep axis for an unrolled train step. The stack happens on device
    (one tiny fused program); with a NamedSharding the batch dim stays
    sharded (microstep axis replicated)."""
    out_shardings = None
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        spec = sharding.spec
        out_shardings = NamedSharding(
            sharding.mesh, PartitionSpec(None, *spec))

    return _stack_fn(out_shardings)(*batches)


def make_bn_recal_step(model, cfg: TrainConfig,
                       device_aug: Optional[Dict[str, Any]] = None,
                       cache_gather: Optional[Callable] = None
                       ) -> Callable:
    """BatchNorm-recalibration step (the torch `swa_utils.update_bn`
    recipe, for train.ema_decay): BN running statistics track the RAW
    weights' activations during training, so serving the EMA params with
    them is a train/serve mismatch -- measured to dominate the EMA win
    under constant LR (docs/DESIGN.md EMA rows). This step pushes one
    TRAIN-pipeline batch (same gather/augment path as training) through a
    train-mode forward with the EVAL-serving params (EMA when on, else
    raw) and returns only the updated batch_stats; the caller threads
    stats across batches. No gradients, no optimizer."""

    do_gather = cache_gather or gather_cached_images

    def step(params, batch_stats, rng, salt, batch, image_cache=None):
        if image_cache is not None and "image_idx" in batch:
            batch = do_gather(image_cache, batch)
        if device_aug is not None:
            from rgb_proprioceptive_pose_estimator_tpu.ops.image_augment_device import (
                augment_batch_images,
            )

            # distinct stream from the train step's fold_in(rng, step)
            key = jax.random.fold_in(jax.random.fold_in(rng, 2), salt)
            batch = augment_batch_images(key, batch, **device_aug)
        _, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=True, mutable=["batch_stats"],
            # train-mode forward: dropout layers need an rng (crashes
            # otherwise when model.proprio_dropout > 0)
            rngs={"dropout": jax.random.fold_in(
                jax.random.fold_in(rng, 3), salt)})
        return mutated["batch_stats"]

    return jax.jit(step)


def recalibrate_batch_stats(recal_step, state: TrainState, pipeline,
                            n_batches: int, momentum: float = 0.9,
                            image_cache=None):
    """Run `n_batches` recalibration forwards (consuming train-pipeline
    batches) and return batch_stats matched to the eval-serving params —
    torch update_bn semantics: the CUMULATIVE average of the per-batch
    statistics, not a momentum blend into the stale raw-weight stats (a
    momentum-0.9 blend would leave 0.9^N of the mismatch in place; the
    whole point is removing it).

    Mechanics: the train-mode forward normalizes with BATCH statistics,
    so its output is independent of the running stats fed in; each call
    therefore runs against the ORIGINAL stats and the per-batch value is
    recovered from the momentum update, batch = (new - m*old)/(1 - m).
    Leaves a train-mode apply never mutates (e.g. proprio obs-norm stats)
    recover to themselves, so the cumulative average leaves them
    unchanged. `momentum` must be the model's bn_momentum."""
    params = (state.params if state.ema_params is None
              else state.ema_params)
    bs0 = state.batch_stats
    m = momentum
    cum = None
    for i in range(n_batches):
        new_bs = recal_step(params, bs0, state.rng, i, next(pipeline),
                            image_cache)
        batch = jax.tree.map(lambda nb, ob: (nb - m * ob) / (1.0 - m),
                             new_bs, bs0)
        cum = batch if cum is None else jax.tree.map(
            lambda c, b, t=float(i + 1): c + (b - c) / t, cum, batch)
    return cum if cum is not None else bs0


def make_eval_step(model, cfg: TrainConfig,
                   drop_camera_idx: Sequence[int] = (),
                   cache_gather: Optional[Callable] = None) -> Callable:
    """Jitted eval step: frozen BN running stats, no augmentation
    (SURVEY.md section 4.2); returns loss components + cm/deg MAE.
    Signature (state, batch, image_cache=None) -- see make_train_step on
    why the device cache is an argument, not a capture.

    drop_camera_idx (static): camera indices scored as DEAD -- removed
    from batch["images"] STRUCTURALLY, so the model contributes the
    zeroed feature vector cfg.model.camera_dropout trains for (bitwise
    what a zero camera_mask column produces, models/fusion.py) and the
    dead camera's encoder forward is skipped entirely. Used by
    api.evaluate(drop_cameras=...)."""
    drop_names = frozenset(model.cfg.cameras[i] for i in drop_camera_idx)
    do_gather = cache_gather or gather_cached_images

    def step(state: TrainState, batch, image_cache=None
             ) -> Dict[str, jax.Array]:
        if image_cache is not None and "image_idx" in batch:
            batch = do_gather(image_cache, batch)
        if drop_names and "images" in batch:
            batch = dict(batch, images={
                k: v for k, v in batch["images"].items()
                if k not in drop_names})
        # eval_variables: EMA weights when train.ema_decay is on
        pos, quat = model.apply(state.eval_variables(), batch, train=False)
        _, aux = pose_loss(
            pos, quat, batch["target_pos"], batch["target_quat"],
            pos_weight=cfg.pos_weight, rot_weight=cfg.rot_weight,
            rot_loss=cfg.rot_loss, pos_loss=cfg.pos_loss,
            huber_delta=cfg.huber_delta)
        aux.update(pose_metrics(pos, quat, batch["target_pos"],
                                batch["target_quat"]))
        return aux

    return jax.jit(step)


def make_predict_fn(model) -> Callable:
    """Jitted inference: batch -> (pos, quat). Used by api.predict."""

    def fwd(variables, batch):
        return model.apply(variables, batch, train=False)

    return jax.jit(fwd)
