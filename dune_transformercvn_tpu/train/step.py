"""Jitted train / eval steps, shard_mapped over the data-parallel mesh.

One functional step ``(state, batch) -> (state, metrics)`` replaces the
reference's Lightning training_step + DDP machinery
(neutrino_full_base_trainer.py:162-192, train.py:123-143):

* the loss is the weighted event/prong focal loss with padding prongs
  masked via weights (static shapes) instead of boolean indexing;
* gradients are ``pmean``-reduced over the "data" mesh axis (the ICI
  collective replacing NCCL bucket all-reduce);
* the optimizer update runs replicated on every device;
* per-step RNG is derived by folding the base key with the step counter and
  the device's mesh position, so each replica draws independent pixel noise
  and dropout masks (DDP parity);
* eval accumulates the psum-able metric sufficient statistics of
  :mod:`metrics` and returns them already reduced.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..ops.losses import (
    binary_event_loss,
    class_balanced_loss,
    softmax_focal_loss,
    split_event_targets,
)
from ..parallel.mesh import DATA_AXIS, is_hybrid
from .metrics import init_metric_state, reduce_metric_state, update_metric_state
from .state import TrainState


def event_metric_view(event_logits, event_targets, num_generation_classes: int):
    """The (logits, targets) pair classification metrics run on.

    In split mode the event head emits [current ‖ generation] logits over the
    10-class detailed target; metrics (accuracy/AUC/confusion, like the
    reference split trainer's current_accuracy) track the 4-way current head.
    """
    if num_generation_classes:
        current_targets, _ = split_event_targets(event_targets)
        return event_logits[:, :-num_generation_classes], current_targets
    return event_logits, event_targets


def compute_losses(
    event_logits, prong_logits, event_targets, prong_targets, gamma, event_scale,
    *,
    num_generation_classes: int = 0,
    generation_scale: float = 0.5,
    loss_beta: float = 2.5,
    binary_event: bool = False,
):
    """Weighted event + masked prong focal loss
    (neutrino_full_base_trainer.py:162-183).  Event rows with target < 0
    (wrap-padded eval tails) are excluded like padding prongs.

    Variants: ``num_generation_classes > 0`` switches the event term to the
    split trainer's dual class-balanced focal losses over derived
    current/generation targets (neutrino_split_trainer.py:82-115);
    ``binary_event`` switches it to per-class sigmoid BCE
    (electron_prong_pixel_trainer.py:12-14).
    """
    extra_metrics = {}
    if num_generation_classes:
        current_logits = event_logits[:, :-num_generation_classes]
        generation_logits = event_logits[:, -num_generation_classes:]
        current_targets, generation_targets = split_event_targets(event_targets)
        # padded/invalid rows carry target -1, which class_balanced_loss
        # excludes by construction (all-zero one-hot rows)
        current_loss = class_balanced_loss(
            current_targets, current_logits, loss_beta, gamma, "focal"
        )
        generation_loss = class_balanced_loss(
            generation_targets, generation_logits, loss_beta, gamma, "focal"
        )
        event_loss = current_loss + generation_scale * generation_loss
        extra_metrics = {
            "current_loss": current_loss,
            "generation_loss": generation_loss,
        }
        # accuracy below tracks the current head
        event_logits, event_targets = current_logits, current_targets
        event_weights = (event_targets >= 0).astype(jnp.float32)
    else:
        event_weights = (event_targets >= 0).astype(jnp.float32)
        if binary_event:
            event_loss = binary_event_loss(event_logits, event_targets)
        else:
            event_loss = softmax_focal_loss(
                event_logits, event_targets, gamma, event_weights
            )

    Kpr = prong_logits.shape[-1]
    flat_logits = prong_logits.reshape(-1, Kpr)
    flat_targets = prong_targets.reshape(-1)
    weights = (flat_targets >= 0).astype(jnp.float32)
    prong_loss = softmax_focal_loss(flat_logits, flat_targets, gamma, weights)

    total = event_scale * event_loss + (1.0 - event_scale) * prong_loss

    event_correct = (
        (jnp.argmax(event_logits, -1) == event_targets).astype(jnp.float32)
        * event_weights
    )
    event_accuracy = jnp.sum(event_correct) / jnp.maximum(event_weights.sum(), 1.0)
    prong_correct = (jnp.argmax(flat_logits, -1) == flat_targets).astype(jnp.float32)
    prong_accuracy = jnp.sum(prong_correct * weights) / jnp.maximum(weights.sum(), 1.0)

    return total, {
        "train_loss": total,
        "event_loss": event_loss,
        "prong_loss": prong_loss,
        "train_event_accuracy": event_accuracy,
        "train_prong_accuracy": prong_accuracy,
        **extra_metrics,
    }


def _loss_kwargs(options, model) -> Dict:
    """Options → compute_losses variant kwargs (static per build).  The
    generation-class count comes from the model config — the single place
    that decides the widened head's split point."""
    if options.split_event_targets and options.event_binary_loss:
        raise ValueError(
            "split_event_targets and event_binary_loss are mutually "
            "exclusive event-loss variants; enable at most one"
        )
    return dict(
        num_generation_classes=model.cfg.num_generation_classes,
        generation_scale=options.generation_loss_proportion,
        loss_beta=options.loss_beta,
        binary_event=options.event_binary_loss,
    )


def make_train_step(model, tx, options, mesh, steps_per_dispatch: int = 1):
    """Build the jitted training step; shard_mapped over the data mesh when
    it has more than one device.  On a 1-device mesh every collective is an
    identity, but this backend still materializes them as ops (~140 tiny
    pmeans over the BN-stat pytree cost ~4 ms/step), so the single-device
    path compiles the plain function instead.

    ``steps_per_dispatch > 1`` returns a step that consumes K stacked
    batches (every leaf ``[K, ...]``) and runs K optimizer steps in one
    ``lax.scan`` — metrics come back stacked ``[K]`` per entry.
    """
    gamma = options.loss_gamma
    event_scale = options.event_prong_loss_proportion
    loss_kwargs = _loss_kwargs(options, model)
    hybrid = is_hybrid(mesh)
    dp = mesh.shape[DATA_AXIS]
    # "single": no data sharding — either a 1-device mesh or a pure-TP
    # hybrid mesh (dp == 1).  Both compile the plain function: identity
    # collectives are not free on this backend, and on a pure-TP mesh the
    # sharded *state placement* alone drives GSPMD's tensor partitioning.
    single = dp == 1
    # BN stats are already mesh-invariant only when the model psums them
    # itself (sync-BN on a >1-device mesh); otherwise reduce here so the
    # replicated state stays consistent (and the shard_map vma check holds).
    stats_need_reduce = not single and not options.sync_batch_norm

    if single:
        pmean = lambda x: x                        # noqa: E731
        device_index = lambda: jnp.asarray(0)      # noqa: E731
    else:
        pmean = lambda x: jax.lax.pmean(x, DATA_AXIS)          # noqa: E731
        device_index = lambda: jax.lax.axis_index(DATA_AXIS)   # noqa: E731

    def loss_fn(params, state: TrainState, batch, rngs):
        (event_logits, prong_logits), updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch,
            state.norm,
            train=True,
            rngs=rngs,
            mutable=["batch_stats"],
        )
        total, metrics = compute_losses(
            event_logits, prong_logits,
            batch["event_targets"], batch["prong_targets"],
            gamma, event_scale, **loss_kwargs,
        )
        return total, (updates["batch_stats"], metrics)

    # Cross-shard gradient reduction (manual DP and hybrid alike):
    # explicitly cast the replicated params to varying before differentiating
    # (``pcast(..., to="varying")``, formerly ``pvary``), so the reduction is
    # pinned by construction — the varying-cast's transpose is a psum
    # over the manual data axis, and with the per-shard loss scaled by 1/dp
    # that psum IS the DDP global-mean gradient.  Under jax's vma typing an
    # explicit ``pmean(grads)`` is NOT equivalent: the cotangent of a
    # replicated (P()) input is implicitly psummed and typed invariant, so
    # a subsequent pmean is an identity on the dp-times-too-large value —
    # grads came out scaled by dp (caught while validating the hybrid TP
    # path; masked in training by AdamW's scale invariance, but it skewed
    # grad_norm and global-norm clipping; pinned by
    # tests/test_tensor_parallel.py and the dp8-vs-dp1 grad_norm check).
    reduce_grads = not single

    def scaled_loss_fn(params, state, batch, rngs):
        if reduce_grads:
            params = jax.tree_util.tree_map(
                lambda t: jax.lax.pcast(t, (DATA_AXIS,), to="varying"), params
            )
            total, aux = loss_fn(params, state, batch, rngs)
            return total / dp, aux
        return loss_fn(params, state, batch, rngs)

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(state.base_rng, state.step)
        rng = jax.random.fold_in(rng, device_index())
        noise_rng, dropout_rng = jax.random.split(rng)

        grad_fn = jax.value_and_grad(scaled_loss_fn, has_aux=True)
        (_, (batch_stats, metrics)), grads = grad_fn(
            state.params, state, batch, {"noise": noise_rng, "dropout": dropout_rng}
        )

        metrics = pmean(metrics)
        grad_norm = optax.global_norm(grads)
        if stats_need_reduce:
            batch_stats = pmean(batch_stats)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        metrics = dict(metrics, grad_norm=grad_norm)
        return new_state, metrics

    # Multi-step dispatch: lax.scan over K stacked batches ([K, ...] leaves)
    # inside ONE compiled program.  Per-step host dispatch latency (pytree
    # traversal + a remote-device round trip) can dominate the step on slow
    # hosts; scanning K steps amortizes it by K.  The math is bit-identical
    # to K single dispatches: the per-step RNG folds (state.step, device)
    # exactly as above, and the optimizer threads through the carry.
    steps = int(steps_per_dispatch)
    if steps > 1:
        def fn(state, batches):
            return jax.lax.scan(step_fn, state, batches)
        batch_spec = P(None, DATA_AXIS)
    else:
        fn, batch_spec = step_fn, P(DATA_AXIS)

    if single:
        return jax.jit(fn, donate_argnums=(0,))
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
        # Hybrid: only the data axis is manual; GSPMD partitions the body
        # over the auto "model" axis from the state's sharded placement.
        **({"axis_names": {DATA_AXIS}} if hybrid else {}),
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(model, options, mesh):
    """Build the jitted eval step ``(state, batch, totals) -> totals``.

    The metric sufficient statistics accumulate ON DEVICE (donated buffer);
    the host fetches them once per validation epoch — fetching the ~250 KB
    state per batch costs ~0.75 s over a tunneled device, 25x the compute.
    """
    gamma = options.loss_gamma
    event_scale = options.event_prong_loss_proportion
    loss_kwargs = _loss_kwargs(options, model)
    num_generation = loss_kwargs["num_generation_classes"]
    hybrid = is_hybrid(mesh)
    single = mesh.shape[DATA_AXIS] == 1

    def step_fn(state: TrainState, batch, totals):
        event_logits, prong_logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            state.norm,
            train=False,
        )
        total, _ = compute_losses(
            event_logits, prong_logits,
            batch["event_targets"], batch["prong_targets"],
            gamma, event_scale, **loss_kwargs,
        )
        metric_logits, metric_targets = event_metric_view(
            event_logits, batch["event_targets"], num_generation
        )
        delta = update_metric_state(
            jax.tree_util.tree_map(jnp.zeros_like, totals),
            metric_logits, metric_targets,
            prong_logits, batch["prong_targets"],
            total,
        )
        if not single:
            delta = reduce_metric_state(delta, DATA_AXIS)
        return jax.tree_util.tree_map(jnp.add, totals, delta)

    if single:
        return jax.jit(step_fn, donate_argnums=(2,))
    sharded = jax.shard_map(
        step_fn, mesh=mesh, in_specs=(P(), P(DATA_AXIS), P()), out_specs=P(),
        **({"axis_names": {DATA_AXIS}} if hybrid else {}),
    )
    return jax.jit(sharded, donate_argnums=(2,))


def make_predict_step(model, mesh):
    """Inference step: per-event softmax scores, gathered across the mesh.

    In split mode the event scores are the 4-way current head's softmax (the
    generation head is a training-time auxiliary, as in the reference split
    trainer, which exposes no inference/export path).
    """
    num_event = model.cfg.num_event_classes

    def step_fn(state: TrainState, batch):
        event_logits, prong_logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            state.norm,
            train=False,
        )
        return (
            jax.nn.softmax(event_logits[:, :num_event], axis=-1),
            jax.nn.softmax(prong_logits, axis=-1),
        )

    if mesh.shape[DATA_AXIS] == 1:
        return jax.jit(step_fn)
    sharded = jax.shard_map(
        step_fn, mesh=mesh, in_specs=(P(), P(DATA_AXIS)), out_specs=P(DATA_AXIS),
        **({"axis_names": {DATA_AXIS}} if is_hybrid(mesh) else {}),
    )
    return jax.jit(sharded)
