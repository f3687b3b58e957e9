"""Optimizer construction: optax chains with the reference's decay masking.

The reference builds two parameter groups — weight decay for everything
except parameters whose names contain "bias" or "LayerNorm.weight"
(trainers/neutrino_base.py:116-128).  In the LIVE reference the
"LayerNorm.weight" entry is dead: no module attribute is literally named
``LayerNorm`` (the encoder's layer norms are ``norm1``/``norm2``, the HF
BERT naming the mask was copied for never appears), so the actual behavior
is bias-only exclusion — LayerNorm scales, BatchNorm scales and PReLU
weights are all decayed.  We match that live behavior exactly (proven by
the multi-step trajectory golden, tests/test_trajectory_parity.py).

Gradient clipping by global L2 norm precedes the optimizer update,
mirroring Lightning's ``gradient_clip_val`` (train.py:140).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def decay_mask(params) -> object:
    """True where weight decay applies (reference rule, neutrino_base.py:116)."""

    def is_decayed(path) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf = keys[-1] if keys else ""
        # bias-only: the reference's "LayerNorm.weight" mask entry matches no
        # live parameter name (see module docstring), so LN scales ARE decayed
        return leaf != "bias"

    return jax.tree_util.tree_map_with_path(lambda p, _: is_decayed(p), params)


_OPTIMIZERS = {
    "adamw": lambda lr, wd, mask: optax.adamw(
        lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd, mask=mask
    ),
    "adam": lambda lr, wd, mask: optax.chain(
        optax.add_decayed_weights(wd, mask=mask), optax.adam(lr)
    ),
    "sgd": lambda lr, wd, mask: optax.chain(
        optax.add_decayed_weights(wd, mask=mask), optax.sgd(lr)
    ),
    "rmsprop": lambda lr, wd, mask: optax.chain(
        optax.add_decayed_weights(wd, mask=mask), optax.rmsprop(lr)
    ),
    "adagrad": lambda lr, wd, mask: optax.chain(
        optax.add_decayed_weights(wd, mask=mask), optax.adagrad(lr)
    ),
    "lamb": lambda lr, wd, mask: optax.lamb(lr, weight_decay=wd, mask=mask),
    "lars": lambda lr, wd, mask: optax.lars(
        lr, weight_decay=wd, weight_decay_mask=mask
    ),
    "lion": lambda lr, wd, mask: optax.lion(lr, weight_decay=wd, mask=mask),
}

# Reference aliases: apex fused optimizers map onto their plain equivalents.
_ALIASES = {"apex_adam": "adamw", "apex_lamb": "lamb", "apex_sgd": "sgd"}


def create_optimizer(
    options,
    schedule: Optional[Callable] = None,
    params_template=None,
) -> optax.GradientTransformation:
    """Build the full update chain: clip -> optimizer(schedule * lr)."""
    name = _ALIASES.get(options.optimizer.lower(), options.optimizer.lower())
    factory = _OPTIMIZERS.get(name)
    if factory is None:
        print(
            f"Unable to load desired optimizer: {options.optimizer}. "
            "Using AdamW as a default."
        )
        factory = _OPTIMIZERS["adamw"]

    if schedule is None:
        learning_rate = options.learning_rate
    else:
        base = options.learning_rate
        learning_rate = lambda step: base * schedule(step)  # noqa: E731

    mask = decay_mask if params_template is None else decay_mask(params_template)
    tx = factory(learning_rate, options.l2_penalty, mask)

    if options.gradient_clip and options.gradient_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(options.gradient_clip), tx)
    return tx
