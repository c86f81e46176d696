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

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


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
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=jax.random.PRNGKey(seed ^ 0xA46),
    )
