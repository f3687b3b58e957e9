"""Exact-metric tests for the offline evaluation harness."""

import numpy as np
import pytest

from dune_transformercvn_tpu.evaluation import (
    binary_auc,
    confusion_matrix,
    evaluate_predictions,
    multiclass_auc,
    precision_recall,
    render_report,
    roc_curve,
    save_predictions_h5,
)


def brute_force_auc(scores, labels):
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    greater = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (greater + 0.5 * ties) / (len(pos) * len(neg))


def test_binary_auc_matches_brute_force_with_ties():
    rng = np.random.default_rng(0)
    scores = np.round(rng.uniform(0, 1, 200), 2)  # many ties
    labels = rng.integers(0, 2, 200)
    np.testing.assert_allclose(
        binary_auc(scores, labels), brute_force_auc(scores, labels), rtol=1e-12
    )


def test_binary_auc_perfect_and_random():
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    labels = np.array([1, 1, 0, 0])
    assert binary_auc(scores, labels) == 1.0
    assert binary_auc(1 - scores, labels) == 0.0
    assert np.isnan(binary_auc(scores, np.ones(4, int)))


def test_multiclass_auc_weighted_vs_macro():
    rng = np.random.default_rng(1)
    probs = rng.dirichlet(np.ones(3), size=300)
    targets = rng.integers(0, 3, 300)
    probs[np.arange(300), targets] += 0.3
    probs /= probs.sum(1, keepdims=True)
    per_class = multiclass_auc(probs, targets, None)
    assert per_class.shape == (3,)
    macro = multiclass_auc(probs, targets, "macro")
    np.testing.assert_allclose(macro, np.nanmean(per_class))
    weighted = multiclass_auc(probs, targets, "weighted")
    support = np.bincount(targets, minlength=3)
    np.testing.assert_allclose(
        weighted, (per_class * support / support.sum()).sum()
    )


def test_confusion_and_precision_recall():
    targets = np.array([0, 0, 1, 1, 2, 2])
    predictions = np.array([0, 1, 1, 1, 2, 0])
    cm = confusion_matrix(predictions, targets, 3)
    np.testing.assert_array_equal(cm, [[1, 1, 0], [0, 2, 0], [1, 0, 1]])
    precision, recall = precision_recall(predictions, targets, 3, "weighted")
    # per-class precision: [1/2, 2/3, 1]; recall: [1/2, 1, 1/2]; weights 1/3 each
    np.testing.assert_allclose(precision, (0.5 + 2 / 3 + 1.0) / 3)
    np.testing.assert_allclose(recall, (0.5 + 1.0 + 0.5) / 3)


def test_roc_curve_properties():
    rng = np.random.default_rng(2)
    scores = rng.uniform(0, 1, 100)
    labels = (scores + rng.normal(0, 0.3, 100) > 0.5).astype(int)
    fpr, tpr, thresholds = roc_curve(scores, labels)
    assert (np.diff(fpr) >= 0).all() and (np.diff(tpr) >= 0).all()
    assert fpr[0] == 0.0 and tpr[0] == 0.0  # sklearn-style origin anchor
    assert thresholds[0] == np.inf
    assert fpr[-1] == 1.0 and tpr[-1] == 1.0
    assert (np.diff(thresholds) <= 0).all()


def test_evaluate_predictions_and_report(tmp_path):
    rng = np.random.default_rng(3)
    n, m = 120, 300
    ev_t = rng.integers(0, 4, n)
    ev_p = rng.dirichlet(np.ones(4), n)
    ev_p[np.arange(n), ev_t] += 1.0
    ev_p /= ev_p.sum(1, keepdims=True)
    pr_t = rng.integers(0, 8, m)
    pr_p = rng.dirichlet(np.ones(8), m)

    results = evaluate_predictions(ev_p, ev_t, pr_p, pr_t)
    assert results["event_accuracy"] > 0.5
    assert results["event_auc"] > 0.7
    assert 0.3 < results["prong_auc"] < 0.7  # random prong scores
    assert results["event_confusion"].sum() == n

    from dune_transformercvn_tpu.data.schema import (
        EVENT_CLASS_NAMES, PRONG_CLASS_NAMES,
    )

    text = render_report(results, EVENT_CLASS_NAMES, PRONG_CLASS_NAMES)
    assert "Numu Charged Current" in text and "confusion" in text

    path = str(tmp_path / "preds.h5")
    save_predictions_h5(path, ev_p, ev_t, pr_p, pr_t, np.arange(m) % n)
    import h5py

    with h5py.File(path) as f:
        np.testing.assert_allclose(f["event_probabilities"][:], ev_p)
        assert f["prong_targets"].shape == (m,)
