"""Streaming, psum-able classification metrics.

The reference accumulates torchmetrics ``Accuracy`` and multiclass ``AUROC``
states across the validation epoch and all-reduces them at epoch end
(neutrino_full_base_trainer.py:70-74, 205-230; ``sync_dist=True``).  Here the
metric state is a small pytree of sufficient statistics — correctness counts
plus per-class positive/negative score histograms — updated inside the jitted
eval step and reduced exactly with ``lax.psum`` over the data mesh.  AUC is
recovered from the histograms on the host: with B bins the absolute
discretization error is bounded by 1/B (default 4096 bins -> < 2.5e-4,
tighter than the 1e-3 parity bar).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def init_metric_state(num_event_classes: int, num_prong_classes: int, bins: int):
    z = jnp.zeros
    return {
        "event_correct": z((), jnp.float32),
        "event_count": z((), jnp.float32),
        "prong_correct": z((), jnp.float32),
        "prong_count": z((), jnp.float32),
        "event_pos": z((num_event_classes, bins), jnp.float32),
        "event_neg": z((num_event_classes, bins), jnp.float32),
        "prong_pos": z((num_prong_classes, bins), jnp.float32),
        "prong_neg": z((num_prong_classes, bins), jnp.float32),
        "event_confusion": z((num_event_classes, num_event_classes), jnp.float32),
        "prong_confusion": z((num_prong_classes, num_prong_classes), jnp.float32),
        "loss_sum": z((), jnp.float32),
        "loss_count": z((), jnp.float32),
    }


def _histogram_update(pos, neg, probs, targets, weights):
    """Accumulate per-class positive/negative histograms of softmax scores."""
    num_classes, bins = pos.shape
    # bin index of each (sample, class) score
    idx = jnp.clip((probs * bins).astype(jnp.int32), 0, bins - 1)  # [N, K]
    one_hot = jax.nn.one_hot(jnp.clip(targets, 0, num_classes - 1), num_classes)
    w = weights[:, None]
    pos_w = (one_hot * w)       # [N, K]
    neg_w = ((1.0 - one_hot) * w)

    # scatter-add along the bin axis for every class column
    flat_idx = idx + jnp.arange(num_classes)[None, :] * bins       # [N, K]
    pos_flat = jnp.zeros((num_classes * bins,), jnp.float32).at[
        flat_idx.reshape(-1)
    ].add(pos_w.reshape(-1))
    neg_flat = jnp.zeros((num_classes * bins,), jnp.float32).at[
        flat_idx.reshape(-1)
    ].add(neg_w.reshape(-1))
    return pos + pos_flat.reshape(num_classes, bins), neg + neg_flat.reshape(
        num_classes, bins
    )


def update_metric_state(
    state: Dict[str, jnp.ndarray],
    event_logits: jnp.ndarray,   # [B, Kev] float32
    event_targets: jnp.ndarray,  # [B]
    prong_logits: jnp.ndarray,   # [B, P, Kpr]
    prong_targets: jnp.ndarray,  # [B, P] (-1 padding)
    loss: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    ev_probs = jax.nn.softmax(event_logits.astype(jnp.float32), axis=-1)
    # wrap-padded tail rows carry target -1 and are excluded
    ev_w = (event_targets >= 0).astype(jnp.float32)
    ev_correct = (
        (jnp.argmax(event_logits, -1) == event_targets).astype(jnp.float32) * ev_w
    )

    Kpr = prong_logits.shape[-1]
    pr_logits = prong_logits.reshape(-1, Kpr)
    pr_targets = prong_targets.reshape(-1)
    pr_w = (pr_targets >= 0).astype(jnp.float32)
    pr_probs = jax.nn.softmax(pr_logits.astype(jnp.float32), axis=-1)
    pr_correct = (jnp.argmax(pr_logits, -1) == pr_targets).astype(jnp.float32) * pr_w

    event_pos, event_neg = _histogram_update(
        state["event_pos"], state["event_neg"], ev_probs, event_targets, ev_w
    )
    prong_pos, prong_neg = _histogram_update(
        state["prong_pos"], state["prong_neg"], pr_probs, pr_targets, pr_w
    )

    def confusion_update(matrix, targets, predictions, weights):
        k = matrix.shape[0]
        flat = jnp.clip(targets, 0, k - 1) * k + predictions
        return matrix + jnp.zeros((k * k,), jnp.float32).at[flat].add(
            weights
        ).reshape(k, k)

    event_confusion = confusion_update(
        state["event_confusion"], event_targets,
        jnp.argmax(event_logits, -1), ev_w,
    )
    prong_confusion = confusion_update(
        state["prong_confusion"], pr_targets,
        jnp.argmax(pr_logits, -1), pr_w,
    )

    return {
        "event_correct": state["event_correct"] + ev_correct.sum(),
        "event_count": state["event_count"] + ev_w.sum(),
        "prong_correct": state["prong_correct"] + pr_correct.sum(),
        "prong_count": state["prong_count"] + pr_w.sum(),
        "event_pos": event_pos,
        "event_neg": event_neg,
        "prong_pos": prong_pos,
        "prong_neg": prong_neg,
        "event_confusion": event_confusion,
        "prong_confusion": prong_confusion,
        # weight by valid events so all-padding shards/batches don't deflate
        "loss_sum": state["loss_sum"] + loss * ev_w.sum(),
        "loss_count": state["loss_count"] + ev_w.sum(),
    }


def reduce_metric_state(state, axis_name: str):
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), state)


def _auc_from_histograms(pos: np.ndarray, neg: np.ndarray) -> np.ndarray:
    """Macro one-vs-rest AUC per class from score histograms.

    AUC = P(score+ > score-) + 0.5 P(tie); with per-bin counts:
    sum_b neg[b] * (pos_above[b] + 0.5 * pos[b]) / (P * N).
    """
    pos_above = pos[:, ::-1].cumsum(1)[:, ::-1] - pos  # strictly above each bin
    num = (neg * (pos_above + 0.5 * pos)).sum(1)
    denom = pos.sum(1) * neg.sum(1)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(denom > 0, num / np.maximum(denom, 1.0), np.nan)


def finalize_metrics(state) -> Dict[str, float]:
    """Host-side: reduce sufficient statistics to the reference's scalar tags."""
    s = {k: np.asarray(v) for k, v in state.items()}
    event_acc = float(s["event_correct"] / max(s["event_count"], 1.0))
    prong_acc = float(s["prong_correct"] / max(s["prong_count"], 1.0))

    ev_auc_per_class = _auc_from_histograms(s["event_pos"], s["event_neg"])
    pr_auc_per_class = _auc_from_histograms(s["prong_pos"], s["prong_neg"])

    def macro(x):
        valid = np.isfinite(x)
        return float(x[valid].mean()) if valid.any() else float("nan")

    event_auc = macro(ev_auc_per_class)
    prong_auc = macro(pr_auc_per_class)

    return {
        "event_epoch_accuracy": event_acc,
        "prong_epoch_accuracy": prong_acc,
        "val_epoch_accuracy": (event_acc + prong_acc) / 2,
        "event_epoch_AUC": event_auc,
        "prong_epoch_AUC": prong_auc,
        "val_epoch_AUC": (event_auc + prong_auc) / 2,
        "val_loss": float(s["loss_sum"] / max(s["loss_count"], 1.0)),
        "event_auc_per_class": ev_auc_per_class,
        "prong_auc_per_class": pr_auc_per_class,
        "event_confusion": s["event_confusion"],
        "prong_confusion": s["prong_confusion"],
    }
