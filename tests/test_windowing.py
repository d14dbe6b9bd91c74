"""Window -> multi-hot target tests (mirrors reference tests/test_windowing.py
with the vectorized IntervalIndex replacing InterLap)."""

import numpy as np

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.data.intervals import IntervalIndex
from segma_tpu.data.loaders import generate_frames, windows_to_targets
from segma_tpu.models.geometry import ConvolutionSettings
from segma_tpu.utils.encoders import MultiLabelEncoder

ENC = MultiLabelEncoder(["a", "b"])


def _index(annots):
    return IntervalIndex.from_annotations(annots, ENC)


def test_single_label_hit():
    idx = _index([AudioAnnotation("u", 0.0, 1.0, "a")])  # frames [0, 16000]
    windows = np.array([[0, 320], [15_000, 15_320], [17_000, 17_320]])
    y = windows_to_targets(windows, idx)
    np.testing.assert_array_equal(y, [[1, 0], [1, 0], [0, 0]])


def test_multi_label_overlap():
    idx = _index(
        [
            AudioAnnotation("u", 0.0, 1.0, "a"),
            AudioAnnotation("u", 0.5, 1.0, "b"),
        ]
    )
    windows = np.array([[0, 320], [9_000, 9_320], [20_000, 20_320]])
    y = windows_to_targets(windows, idx)
    np.testing.assert_array_equal(y, [[1, 0], [1, 1], [0, 1]])


def test_inclusive_boundaries():
    """InterLap semantics: touching endpoints count as overlap."""
    idx = _index([AudioAnnotation("u", 1.0, 1.0, "a")])  # [16000, 32000]
    windows = np.array([[15_680, 16_000], [32_000, 32_320]])
    y = windows_to_targets(windows, idx)
    np.testing.assert_array_equal(y, [[1, 0], [1, 0]])


def test_empty_annotations():
    idx = _index([])
    y = windows_to_targets(np.array([[0, 320]]), idx)
    np.testing.assert_array_equal(y, [[0, 0]])


def test_vectorized_matches_scalar_query():
    rng = np.random.default_rng(7)
    annots = [
        AudioAnnotation("u", float(s), float(d), ["a", "b"][int(i)])
        for s, d, i in zip(
            rng.uniform(0, 50, 20), rng.uniform(0.1, 3, 20), rng.integers(0, 2, 20)
        )
    ]
    idx = _index(annots)
    windows = np.stack(
        [np.arange(0, 100) * 320, np.arange(0, 100) * 320 + 319], axis=1
    )
    y = windows_to_targets(windows, idx)
    for w in range(100):
        labels = idx.find_labels(windows[w, 0], windows[w, 1])
        np.testing.assert_array_equal(y[w], ENC.one_hot(labels))


def test_generate_frames_whisper_199():
    cs = ConvolutionSettings((400, 3, 3), (160, 1, 2), (200, 1, 1))
    frames = generate_frames(cs, 16_000, 4.0, strict=False)
    assert frames.shape == (199, 2)
    assert frames.min() >= 0
    assert frames.max() <= 64_000
    # step between consecutive rf starts (unclipped region) is 320
    assert frames[5, 0] - frames[4, 0] == 320
