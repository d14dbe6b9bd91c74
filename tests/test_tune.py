"""Threshold tuner tests: rasterizer parity, sorted-pass F1 grid vs sklearn,
end-to-end tuning on synthetic logits."""

from pathlib import Path

import numpy as np
import pytest

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.tune import (
    f1_grid,
    load_pred_logits,
    rttm_to_frame_tensor,
    threshold_grid,
    tune_multilabel,
    unify,
)

LABELS = ["a", "b"]


def _write_rttm(path: Path, annots: list[AudioAnnotation]) -> Path:
    path.write_text("\n".join(a.to_rttm() for a in annots) + "\n")
    return path


def test_rttm_rasterizer(tmp_path):
    rttm = _write_rttm(
        tmp_path / "u.rttm",
        [
            AudioAnnotation("u", 0.0, 0.1, "a"),  # frames 0-4
            AudioAnnotation("u", 0.05, 0.06, "b"),  # frames 2-5 (ceil end)
            AudioAnnotation("u", 1.0, 0.02, "ignored"),  # filtered BEFORE sizing
        ],
    )
    t = rttm_to_frame_tensor(rttm, LABELS)
    # unknown labels are dropped before computing the tensor length
    # (reference tune.py:30-46): total = max end of kept = 0.11 -> 6 frames
    assert t.shape == (6, 2)
    np.testing.assert_array_equal(t[:5, 0], 1)
    assert t[5, 0] == 0
    np.testing.assert_array_equal(t[2:6, 1], 1)
    assert t[1, 1] == 0


def test_threshold_grid_parity():
    g = threshold_grid(0.1)
    np.testing.assert_allclose(
        g, [0.0, 0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8, 0.9, 1.0]
    )
    assert len(threshold_grid(0.01)) == 100
    with pytest.raises(ValueError):
        threshold_grid(0.5)


def test_f1_grid_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    y_true = (rng.random((500, 3)) > 0.7).astype(np.float32)
    probs = rng.random((500, 3))
    thresholds = threshold_grid(0.1)
    grid = f1_grid(y_true, probs, thresholds)
    for k, thr in enumerate(thresholds):
        ref = sklearn.f1_score(
            y_true, probs > thr, average=None, labels=[0, 1, 2], zero_division=1.0
        )
        np.testing.assert_allclose(grid[k], ref, atol=1e-12)


def test_tune_recovers_separating_threshold():
    """Probabilities cleanly separated at 0.6 must tune to <= 0.6."""
    rng = np.random.default_rng(1)
    y = (rng.random((2000, 2)) > 0.5).astype(np.float32)
    probs = np.where(y > 0, rng.uniform(0.7, 1.0, y.shape), rng.uniform(0, 0.5, y.shape))
    logits = np.log(probs / (1 - probs))
    best = tune_multilabel(y, logits, threshold_grid(0.1), LABELS)
    for label in LABELS:
        assert 0.5 <= best[label]["lower_bound"] <= 0.7
        assert best[label]["upper_bound"] == 1.0


def test_unify_pads_and_concats():
    t0 = {"u1": np.ones((3, 2)), "u2": np.ones((5, 2))}
    t1 = {"u1": np.ones((4, 2)), "u2": np.ones((2, 2))}
    a, b = unify(t0, t1, {"u1", "u2"})
    assert a.shape == b.shape == (9, 2)


def test_load_pred_logits_npz_and_pt(tmp_path):
    np.savez(tmp_path / "u1-logits_dict_t.npz", a=np.ones(7), b=np.zeros(7))
    import torch

    torch.save(
        {"a": torch.ones(5), "b": torch.zeros(5)},
        tmp_path / "u2-logits_dict_t.pt",
    )
    out = load_pred_logits(tmp_path, LABELS, {"u1", "u2"})
    assert out["u1"].shape == (7, 2)
    assert out["u2"].shape == (5, 2)
