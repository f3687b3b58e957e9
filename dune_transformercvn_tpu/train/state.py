"""Training state pytree: parameters, BN statistics, optimizer state, RNG.

Plays the role of the reference's Lightning checkpoint payload — model
state_dict (including the frozen normalization-statistic parameters,
neutrino_base.py:32-45), optimizer state, scheduler step and global step —
as one functional pytree that flows through the jitted train step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray            # int32 global step
    params: Any
    batch_stats: Any
    opt_state: Any
    norm: Dict[str, jnp.ndarray]  # dataset statistics (frozen, checkpointed)
    base_rng: jax.Array           # folded with step/device for per-step keys


def create_train_state(model, tx, example_batch, norm, seed: int = 0) -> TrainState:
    """Initialize parameters (jitted — eager init is pathological on 1-core
    hosts) and the optimizer state."""
    base_rng = jax.random.PRNGKey(seed)
    params_rng, dropout_rng, noise_rng = jax.random.split(base_rng, 3)

    variables = jax.jit(lambda r, b, n: model.init(r, b, n, train=False))(
        {"params": params_rng, "dropout": dropout_rng, "noise": noise_rng},
        example_batch,
        norm,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = jax.jit(tx.init)(params)

    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        norm=jax.tree_util.tree_map(jnp.asarray, norm),
        base_rng=base_rng,
    )


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
