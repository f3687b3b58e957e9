"""Training subsystem tests: schedules, decay mask, metrics, checkpoints."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.train import schedules
from dune_transformercvn_tpu.train.checkpoint import CheckpointManager, restore_from_path
from dune_transformercvn_tpu.train.metrics import (
    finalize_metrics,
    init_metric_state,
    update_metric_state,
)
from dune_transformercvn_tpu.train.optimizer import create_optimizer, decay_mask


# ---------------------------------------------------------------------------
# LR schedules: compare against the reference LambdaLR formulas
# (networks/learning_rate_schedules.py:49-145) evaluated in plain python.
# ---------------------------------------------------------------------------

def ref_linear(step, warmup, total):
    if step < warmup:
        return step / max(1, warmup)
    return max(0.0, (total - step) / max(1, total - warmup))


def ref_hard_restarts(step, warmup, total, cycles):
    if step < warmup:
        return step / max(1, warmup)
    progress = (step - warmup) / max(1, total - warmup)
    if progress >= 1.0:
        return 0.0
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * ((cycles * progress) % 1.0))))


def test_linear_schedule_matches_reference():
    sched = schedules.linear_with_warmup(10, 100)
    for step in [0, 1, 5, 10, 11, 50, 99, 100, 150]:
        np.testing.assert_allclose(
            float(sched(step)), ref_linear(step, 10, 100), rtol=1e-6, atol=1e-7
        )


def test_hard_restart_schedule_matches_reference():
    sched = schedules.cosine_with_hard_restarts(10, 1000, num_cycles=16)
    for step in range(0, 1100, 7):
        np.testing.assert_allclose(
            float(sched(step)), ref_hard_restarts(step, 10, 1000, 16),
            rtol=1e-5, atol=1e-6,
        )


def test_schedule_selection_from_options():
    o = Options()
    o.epochs = 10
    o.learning_rate_cycles = 0
    lin = schedules.from_options(o, steps_per_epoch=10)
    assert float(lin(100)) == 0.0  # linear hits zero at total_steps
    o.learning_rate_cycles = 4
    cos = schedules.from_options(o, steps_per_epoch=10)
    # restart boundaries jump back to ~1
    warmup = 10
    cycle_len = (100 - warmup) / 4
    just_after_restart = int(warmup + cycle_len) + 1
    assert float(cos(just_after_restart)) > 0.9


# ---------------------------------------------------------------------------
# Optimizer decay mask (live reference behavior: bias-only exclusion — the
# reference's "LayerNorm.weight" mask entry matches no live parameter name,
# so LayerNorm scales ARE decayed; see train/optimizer.py docstring)
# ---------------------------------------------------------------------------

def test_decay_mask_rules():
    params = {
        "Dense_0": {"kernel": np.ones(2), "bias": np.ones(2)},
        "LayerNorm_0": {"scale": np.ones(2), "bias": np.ones(2)},
        "MaskedBatchNorm_0": {"scale": np.ones(2), "bias": np.ones(2)},
        "PReLU_0": {"alpha": np.ones(2)},
    }
    mask = decay_mask(params)
    assert mask["Dense_0"]["kernel"] is True
    assert mask["Dense_0"]["bias"] is False
    # the live torch mask decays LayerNorm/BatchNorm scales and PReLU weights
    assert mask["LayerNorm_0"]["scale"] is True
    assert mask["LayerNorm_0"]["bias"] is False
    assert mask["MaskedBatchNorm_0"]["scale"] is True
    assert mask["MaskedBatchNorm_0"]["bias"] is False
    assert mask["PReLU_0"]["alpha"] is True


def test_optimizer_applies_decay_only_where_masked():
    o = Options()
    o.optimizer = "AdamW"
    o.learning_rate = 0.0  # isolate the decay term
    o.l2_penalty = 0.1
    o.gradient_clip = 0.0
    tx = create_optimizer(o)
    params = {"Dense_0": {"kernel": jnp.ones(3), "bias": jnp.ones(3)}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # lr=0 -> adamw update is zero everywhere (decay scales with lr in adamw)
    np.testing.assert_allclose(new["Dense_0"]["kernel"], 1.0)

    o.learning_rate = 0.5
    tx = create_optimizer(o)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(new["Dense_0"]["kernel"][0]) < 1.0   # decayed
    np.testing.assert_allclose(new["Dense_0"]["bias"], 1.0)  # masked off


def test_unknown_optimizer_falls_back():
    o = Options()
    o.optimizer = "NoSuchOpt"
    tx = create_optimizer(o)
    assert tx is not None


# ---------------------------------------------------------------------------
# Streaming metrics: histogram AUC vs exact pairwise AUC
# ---------------------------------------------------------------------------

def exact_ovr_auc(probs, targets, num_classes):
    aucs = []
    for c in range(num_classes):
        pos = probs[targets == c, c]
        neg = probs[targets != c, c]
        if len(pos) == 0 or len(neg) == 0:
            continue
        greater = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        aucs.append((greater + 0.5 * ties) / (len(pos) * len(neg)))
    return float(np.mean(aucs))


def test_streaming_auc_matches_exact():
    rng = np.random.default_rng(0)
    n, kev, kpr, bins = 400, 4, 8, 4096
    ev_logits = rng.normal(size=(n, kev)).astype(np.float32)
    ev_targets = rng.integers(0, kev, n)
    # correlate logits with targets so AUC is away from 0.5
    ev_logits[np.arange(n), ev_targets] += 1.0
    pr_logits = rng.normal(size=(n, 5, kpr)).astype(np.float32)
    pr_targets = rng.integers(-1, kpr, (n, 5))
    pr_logits[..., 0] += (pr_targets == 0) * 1.5

    state = init_metric_state(kev, kpr, bins)
    half = n // 2
    for sl in (slice(0, half), slice(half, n)):
        state = update_metric_state(
            state,
            jnp.asarray(ev_logits[sl]), jnp.asarray(ev_targets[sl]),
            jnp.asarray(pr_logits[sl]), jnp.asarray(pr_targets[sl]),
            jnp.asarray(0.0),
        )
    result = finalize_metrics(jax.device_get(state))

    ev_probs = np.asarray(jax.nn.softmax(jnp.asarray(ev_logits), axis=-1))
    expected_ev = exact_ovr_auc(ev_probs, ev_targets, kev)
    assert abs(result["event_epoch_AUC"] - expected_ev) < 2e-3

    flat_logits = pr_logits.reshape(-1, kpr)
    flat_targets = pr_targets.reshape(-1)
    keep = flat_targets >= 0
    pr_probs = np.asarray(jax.nn.softmax(jnp.asarray(flat_logits[keep]), axis=-1))
    expected_pr = exact_ovr_auc(pr_probs, flat_targets[keep], kpr)
    assert abs(result["prong_epoch_AUC"] - expected_pr) < 2e-3

    # accuracy agreement
    expected_acc = float((ev_probs.argmax(1) == ev_targets).mean())
    np.testing.assert_allclose(result["event_epoch_accuracy"], expected_acc, atol=1e-6)


def test_metrics_exclude_invalid_events():
    """Events with target -1 (wrap-padded eval tails) contribute nothing."""
    rng = np.random.default_rng(7)
    ev = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    et = jnp.asarray([0, 1, 2, 3, -1, -1, -1, -1])
    pr = jnp.asarray(rng.normal(size=(8, 2, 8)).astype(np.float32))
    pt = jnp.asarray(
        np.broadcast_to(np.where(np.asarray(et)[:, None] >= 0, 1, -1), (8, 2))
    )

    full = update_metric_state(init_metric_state(4, 8, 256), ev, et, pr, pt, jnp.asarray(0.0))
    trimmed = update_metric_state(
        init_metric_state(4, 8, 256), ev[:4], et[:4], pr[:4], pt[:4], jnp.asarray(0.0)
    )
    assert float(full["event_count"]) == 4.0
    for key in full:
        if key.startswith("loss"):
            continue
        np.testing.assert_allclose(
            np.asarray(full[key]), np.asarray(trimmed[key]), atol=1e-5, err_msg=key
        )


def test_streaming_confusion_matrix():
    ev = jnp.asarray([[3.0, 0, 0, 0], [0, 3.0, 0, 0], [0, 0, 3.0, 0]])
    et = jnp.asarray([0, 2, -1])  # last row invalid
    pr = jnp.zeros((3, 1, 8)).at[:, 0, 1].set(5.0)
    pt = jnp.asarray([[1], [0], [-1]])
    state = update_metric_state(
        init_metric_state(4, 8, 64), ev, et, pr, pt, jnp.asarray(0.0)
    )
    cm = np.asarray(state["event_confusion"])
    assert cm[0, 0] == 1 and cm[2, 1] == 1 and cm.sum() == 2
    pcm = np.asarray(state["prong_confusion"])
    assert pcm[1, 1] == 1 and pcm[0, 1] == 1 and pcm.sum() == 2


def test_checkpoint_ranking_handles_none_and_nan(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), top_k=2)
    mgr.save(make_fake_state(1.0), 1, None)
    mgr.save(make_fake_state(2.0), 2, float("nan"))
    mgr.save(make_fake_state(3.0), 3, 0.6)
    mgr.save(make_fake_state(4.0), 4, 0.8)
    mgr.save(make_fake_state(5.0), 5, 0.7)
    mgr.close()   # commit the in-flight async save before inspecting
    # None/NaN rank below real metrics: top-2 = {4, 5}, plus last
    kept = {c["step"] for c in mgr._index["checkpoints"]}
    assert kept == {4, 5}
    assert mgr.best_step() == 4


def test_metrics_additivity():
    """Accumulating in one shot == accumulating in chunks (psum-ability)."""
    rng = np.random.default_rng(1)
    n = 64
    ev = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    et = jnp.asarray(rng.integers(0, 4, n))
    pr = jnp.asarray(rng.normal(size=(n, 3, 8)).astype(np.float32))
    pt = jnp.asarray(rng.integers(-1, 8, (n, 3)))

    whole = update_metric_state(init_metric_state(4, 8, 512), ev, et, pr, pt, jnp.asarray(1.0))
    parts = init_metric_state(4, 8, 512)
    for sl in (slice(0, 20), slice(20, 50), slice(50, 64)):
        parts = update_metric_state(parts, ev[sl], et[sl], pr[sl], pt[sl], jnp.asarray(1.0 / 3))
    for key in whole:
        if key.startswith("loss"):
            continue
        np.testing.assert_allclose(
            np.asarray(whole[key]), np.asarray(parts[key]), atol=1e-3, err_msg=key
        )


# ---------------------------------------------------------------------------
# Checkpoint manager
# ---------------------------------------------------------------------------

def make_fake_state(value: float):
    return {
        "params": {"w": np.full((3,), value, np.float32)},
        "step": np.asarray(int(value), np.int32),
    }


def test_checkpoint_round_trip_and_topk(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), top_k=2)
    for step, metric in [(1, 0.5), (2, 0.9), (3, 0.2), (4, 0.7), (5, 0.1)]:
        mgr.save(make_fake_state(float(step)), step, metric)
    mgr.close()   # commit the in-flight async save before inspecting

    # top-2 by metric: steps 2 (0.9) and 4 (0.7); plus last (5)
    kept = {c["step"] for c in mgr._index["checkpoints"]}
    assert kept == {2, 4, 5}
    assert mgr.best_step() == 2
    assert mgr.latest_step() == 5

    template = make_fake_state(0.0)
    best = mgr.restore(template, mgr.best_step())
    np.testing.assert_allclose(best["params"]["w"], 2.0)
    last = mgr.restore(template)
    np.testing.assert_allclose(last["params"]["w"], 5.0)

    # path-based restore (the -c flow)
    direct = restore_from_path(str(tmp_path / "ckpt" / "step_4"), template)
    np.testing.assert_allclose(direct["params"]["w"], 4.0)


def test_checkpoint_index_survives_reload(tmp_path):
    d = str(tmp_path / "ckpt2")
    mgr = CheckpointManager(d, top_k=3)
    mgr.save(make_fake_state(1.0), 1, 0.4)
    mgr.close()
    mgr2 = CheckpointManager(d, top_k=3)
    assert mgr2.latest_step() == 1
    restored = mgr2.restore(make_fake_state(0.0))
    np.testing.assert_allclose(restored["params"]["w"], 1.0)


def test_checkpoint_restore_across_prng_impls(tmp_path):
    """A checkpoint written under one PRNG impl restores under the other.

    Raw key shapes differ (threefry (2,) vs rbg (4,) uint32); the restore
    grafts the template's fresh key since a cross-impl key would be
    misinterpreted anyway (random streams are not parity-bearing state)."""
    from flax import struct

    @struct.dataclass
    class MiniState:
        params: dict
        base_rng: jax.Array

    def state(key_words: int, value: float):
        return MiniState(
            params={"w": jnp.full((3,), value, jnp.float32)},
            base_rng=jnp.arange(key_words, dtype=jnp.uint32),
        )

    for saved_words, template_words in [(2, 4), (4, 2)]:
        d = str(tmp_path / f"ck_{saved_words}to{template_words}")
        mgr = CheckpointManager(d, top_k=1)
        mgr.save(state(saved_words, 7.0), 1, 0.5)
        mgr.close()
        template = state(template_words, 0.0)
        restored = CheckpointManager(d, top_k=1).restore(template)
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
        # the template's key survives (correct word count for the live impl)
        assert restored.base_rng.shape == (template_words,)
