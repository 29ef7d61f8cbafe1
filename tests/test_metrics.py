"""Metric golden-parity tests vs sklearn (reference evaluator uses sklearn:
``src/training/evaluator.py:136-204``)."""

import numpy as np
from sklearn import metrics as skm

from deepfake_vit_tpu.ops.metrics import (
    average_precision,
    binary_classification_metrics,
    confusion_matrix_binary,
    roc_auc,
)


def test_metrics_parity(rng):
    labels = rng.integers(0, 2, size=500)
    scores = np.clip(labels * 0.3 + rng.normal(0.35, 0.25, size=500), 0, 1)
    preds = (scores >= 0.5).astype(np.int64)

    m = binary_classification_metrics(labels, preds, scores)
    np.testing.assert_allclose(m["accuracy"], skm.accuracy_score(labels, preds))
    np.testing.assert_allclose(m["precision"], skm.precision_score(labels, preds))
    np.testing.assert_allclose(m["recall"], skm.recall_score(labels, preds))
    np.testing.assert_allclose(m["f1"], skm.f1_score(labels, preds))
    np.testing.assert_allclose(m["roc_auc"], skm.roc_auc_score(labels, scores), rtol=1e-10)
    np.testing.assert_allclose(
        m["average_precision"], skm.average_precision_score(labels, scores), rtol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(m["confusion_matrix"]), skm.confusion_matrix(labels, preds)
    )


def test_auc_with_ties():
    labels = np.asarray([0, 0, 1, 1, 0, 1])
    scores = np.asarray([0.5, 0.5, 0.5, 0.9, 0.1, 0.9])
    np.testing.assert_allclose(roc_auc(labels, scores), skm.roc_auc_score(labels, scores))


def test_degenerate_cases():
    assert np.isnan(roc_auc(np.zeros(4), np.ones(4)))
    assert np.isnan(average_precision(np.zeros(4), np.ones(4)))
    cm = confusion_matrix_binary(np.asarray([1, 1]), np.asarray([1, 0]))
    assert cm.tolist() == [[0, 0], [1, 1]]
