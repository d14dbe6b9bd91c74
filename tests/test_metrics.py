"""Metric ops: counts, F1, multiclass F1, AUROC (jax and numpy paths)."""

import jax.numpy as jnp
import numpy as np
import pytest

from segma_tpu.ops.metrics import (
    binary_auroc_np,
    binary_counts,
    f1_from_counts,
    multiclass_f1,
    roc_curve_np,
)


def test_binary_counts_and_f1():
    probs = jnp.array([[0.9, 0.1], [0.8, 0.9], [0.2, 0.3], [0.6, 0.7]])
    targets = jnp.array([[1, 0], [1, 1], [0, 0], [0, 1]], jnp.float32)
    c = binary_counts(probs, targets)
    np.testing.assert_array_equal(np.asarray(c["tp"]), [2, 2])
    np.testing.assert_array_equal(np.asarray(c["fp"]), [1, 0])
    np.testing.assert_array_equal(np.asarray(c["fn"]), [0, 0])
    f1 = f1_from_counts({k: np.asarray(v) for k, v in c.items()})
    assert f1[0] == pytest.approx(2 * 2 / (2 * 2 + 1 + 0))
    assert f1[1] == pytest.approx(1.0)


def test_f1_zero_division():
    f1 = f1_from_counts(
        {"tp": np.zeros(1), "fp": np.zeros(1), "fn": np.zeros(1), "tn": np.ones(1)}
    )
    assert f1[0] == 0.0


def test_multiclass_f1_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    preds = rng.integers(0, 4, 500)
    targets = rng.integers(0, 4, 500)
    got = multiclass_f1(preds, targets, 4)
    ref = sk.f1_score(targets, preds, average=None, labels=range(4), zero_division=0)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_auroc_np_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(1)
    scores = rng.random((300, 3))
    targets = (rng.random((300, 3)) > 0.6).astype(np.float32)
    got = binary_auroc_np(scores, targets)
    for li in range(3):
        ref = sk.roc_auc_score(targets[:, li], scores[:, li])
        assert got[li] == pytest.approx(ref, abs=1e-12)


def test_roc_curve_endpoints():
    scores = np.array([0.9, 0.7, 0.4, 0.1])
    targets = np.array([1, 0, 1, 0])
    fpr, tpr = roc_curve_np(scores, targets)
    assert tpr[-1] == pytest.approx(1.0)
    assert fpr[-1] == pytest.approx(1.0)
    assert tpr[0] == pytest.approx(0.5)  # first threshold catches one positive
