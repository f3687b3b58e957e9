"""Classification losses: softmax focal loss (the live trainer's loss),
sigmoid focal loss and class-balanced loss (reference focal_loss.py:6-79).

All functions are pure and mask-aware: padded rows are excluded through an
optional weight vector rather than boolean indexing, keeping shapes static
under ``jit``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_focal_loss(
    logits: jnp.ndarray,            # [N, K]
    targets: jnp.ndarray,           # [N] int
    gamma: float,
    weights: Optional[jnp.ndarray] = None,  # [N] sample weights (e.g. validity mask)
) -> jnp.ndarray:
    """Mean ``-(1 - p_t)^gamma * log(p_t)``; plain cross-entropy at gamma=0.

    Matches the live trainer's inline loss (neutrino_full_base_trainer.py:148-160).
    Computed in float32 regardless of input dtype.
    """
    logits = logits.astype(jnp.float32)
    safe_targets = jnp.clip(targets, 0, logits.shape[-1] - 1)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    log_pt = jnp.take_along_axis(log_probs, safe_targets[..., None], axis=-1)[..., 0]

    if gamma == 0.0:
        loss = -log_pt
    else:
        pt = jnp.exp(log_pt)
        loss = -log_pt * (1.0 - pt) ** gamma

    if weights is None:
        return jnp.mean(loss)
    w = weights.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def split_event_targets(targets: jnp.ndarray):
    """Derive (current, generation) targets from the 10-class detailed event
    target, following the split-dataset rules (split_dataset.py:10-23):
    current = {0..3}→0, {4..7}→1, 8→2, 9→3; generation = target mod 4, defined
    only when a generation exists (target < 8, i.e. current < 2
    — neutrino_split_trainer.py:86).  Padding (-1) propagates to both, and
    generation is -1 wherever invalid, so downstream masking stays uniform.
    """
    t = targets
    current = jnp.where(t < 8, t // 4, t - 6)
    generation = jnp.where(t < 8, t % 4, -1)
    invalid = t < 0
    return jnp.where(invalid, -1, current), jnp.where(invalid, -1, generation)


def binary_event_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-class sigmoid BCE against one-hot targets — the electron-trainer
    variant (electron_prong_pixel_trainer.py:12-14).  Padded rows (target < 0)
    are excluded by weight; the mean runs over all (row, class) cells like
    ``F.binary_cross_entropy_with_logits``'s default reduction."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    w = (targets >= 0).astype(jnp.float32)[:, None]
    bce = jnp.maximum(logits, 0) - logits * one_hot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w) * num_classes, 1.0)


def sigmoid_focal_loss(
    labels: jnp.ndarray,   # [N, K] one-hot float
    logits: jnp.ndarray,   # [N, K]
    alpha: jnp.ndarray,    # [N, K] per-example weights
    gamma: float,
) -> jnp.ndarray:
    """Per-class sigmoid focal loss normalized by positive count
    (reference focal_loss.py:6-37)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if gamma == 0.0:
        modulator = 1.0
    else:
        modulator = jnp.exp(
            -gamma * labels * logits - gamma * jnp.log1p(jnp.exp(-logits))
        )
    weighted = alpha * modulator * bce
    return jnp.sum(weighted) / jnp.maximum(jnp.sum(labels), 1.0)


def class_balanced_loss(
    targets: jnp.ndarray,  # [N] int
    logits: jnp.ndarray,   # [N, K]
    beta: float,
    gamma: float,
    loss_type: str = "focal",
) -> jnp.ndarray:
    """Class-balanced loss with the reference's hard-coded class weights
    ``[1, 2, beta, 1/beta]`` (focal_loss.py:60-61).

    Padded rows (target < 0) are excluded automatically — the static-shape
    replacement for the reference's boolean indexing: ``one_hot`` of an
    out-of-range target is an all-zero row, which zeroes both the row's alpha
    and its contribution to the focal normalizer.
    """
    num_classes = logits.shape[-1]
    class_weights = jnp.asarray([1.0, 2.0, beta, 1.0 / beta], jnp.float32)
    class_weights = class_weights / class_weights.sum()
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    sample_w = (class_weights[None, :num_classes] * one_hot).sum(1, keepdims=True)
    alpha = jnp.broadcast_to(sample_w, one_hot.shape)

    # mean over REAL rows only (the reference's trimmed-batch reduction
    # 'mean' divides by N_real * K; padded rows already contribute zero to
    # the numerator via their all-zero alpha)
    denom = jnp.maximum(sample_w.astype(bool).sum(), 1) * num_classes

    if loss_type == "focal":
        return sigmoid_focal_loss(one_hot, logits, alpha, gamma)
    if loss_type == "sigmoid":
        logits = logits.astype(jnp.float32)
        bce = jnp.maximum(logits, 0) - logits * one_hot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return jnp.sum(alpha * bce) / denom
    if loss_type == "softmax":
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = jnp.clip(probs, 1e-7, 1 - 1e-7)
        bce = -(one_hot * jnp.log(probs) + (1 - one_hot) * jnp.log(1 - probs))
        return jnp.sum(alpha * bce) / denom
    raise ValueError(f"unknown loss_type: {loss_type}")
