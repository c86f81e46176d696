"""Train state pytree: params, BN running stats, optimizer state, step.

Replaces the reference's implicit (model.state_dict(), optimizer.state_dict())
pair (`[RECALL]` SURVEY.md section 4.5) with one functional pytree that a
single jitted step threads through (BASELINE.json:5 "one jitted XLA graph").
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from rgb_proprioceptive_pose_estimator_tpu.config import Config
from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
    build_model,
    example_batch,
)


@flax.struct.dataclass
class TrainState:
    step: jax.Array                 # int32 scalar
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array                  # base PRNG key (device-side augment)
    # EMA of params (train.ema_decay > 0); None = off. None is an empty
    # pytree subtree, so checkpoints/jit/donation all pass through it.
    ema_params: Any = None

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def eval_variables(self) -> Dict[str, Any]:
        """Variables every evaluation consumer (eval step, Predictor,
        export) should apply: the EMA weights when train.ema_decay is on,
        else the raw params."""
        p = self.params if self.ema_params is None else self.ema_params
        return {"params": p, "batch_stats": self.batch_stats}


def create_state(cfg: Config, tx: optax.GradientTransformation,
                 seed: int = 0) -> TrainState:
    """Initialize model variables + optimizer state on host (then place on
    the mesh with replicated sharding via jax.device_put)."""
    model = build_model(cfg.model)
    batch = example_batch(cfg.model, batch_size=2)
    rng = jax.random.PRNGKey(seed)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    # EMA starts AT the initial params (not zeros), so no bias correction
    # term is needed. Deep copy: the state is donated every step, and two
    # tree leaves aliasing one buffer must not both be donated.
    ema = (jax.tree.map(lambda x: jnp.array(x, copy=True), params)
           if cfg.train.ema_decay > 0 else None)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=jax.random.PRNGKey(seed ^ 0xA46),
        ema_params=ema,
    )
