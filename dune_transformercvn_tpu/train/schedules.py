"""Learning-rate schedules as pure functions of the step counter.

Functional re-designs of the reference's LambdaLR factories
(networks/learning_rate_schedules.py:8-145); each returns an
optax-compatible ``schedule(step) -> multiplier`` callable.  The cosine
hard-restart schedule is the live default (trainers/neutrino_base.py:139-144).
"""

from __future__ import annotations

import jax.numpy as jnp


def constant_schedule():
    return lambda step: jnp.asarray(1.0, jnp.float32)


def constant_with_warmup(num_warmup_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1.0, num_warmup_steps)
        return jnp.where(step < num_warmup_steps, warm, 1.0)

    return schedule


def linear_with_warmup(num_warmup_steps: int, num_training_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        decay = jnp.maximum(
            0.0,
            (num_training_steps - step)
            / max(1, num_training_steps - num_warmup_steps),
        )
        return jnp.where(step < num_warmup_steps, warm, decay)

    return schedule


def cosine_with_warmup(
    num_warmup_steps: int, num_training_steps: int, num_cycles: float = 0.5
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps
        )
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        )
        return jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


def cosine_with_hard_restarts(
    num_warmup_steps: int, num_training_steps: int, num_cycles: int = 1
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps
        )
        phase = jnp.mod(num_cycles * progress, 1.0)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * phase)))
        cos = jnp.where(progress >= 1.0, 0.0, cos)
        return jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


def from_options(options, steps_per_epoch: int):
    """Pick the schedule like the reference trainer
    (neutrino_base.py:132-152): linear-with-warmup when
    ``learning_rate_cycles < 1``, else cosine with hard restarts."""
    total_steps = steps_per_epoch * options.epochs
    warmup_steps = int(round(steps_per_epoch * options.learning_rate_warmup_epochs))
    if options.learning_rate_cycles < 1:
        return linear_with_warmup(warmup_steps, total_steps)
    return cosine_with_hard_restarts(
        warmup_steps, total_steps, options.learning_rate_cycles
    )
