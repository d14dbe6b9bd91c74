"""Interval merge structure tests (mirrors reference tests/test_interval.py
coverage: adjacency, overlap, labels, negatives, gaps)."""

from segma_tpu.structs.interval import Intervals


def test_empty():
    iv = Intervals()
    assert len(iv) == 0
    assert list(iv) == []


def test_single():
    iv = Intervals()
    iv.add((0, 10, "a"))
    assert iv.intervals == [(0, 10, "a")]


def test_merge_overlap_same_label():
    iv = Intervals()
    iv.add((0, 10, "a"))
    iv.add((5, 15, "a"))
    assert iv.intervals == [(0, 15, "a")]


def test_merge_adjacent_same_label():
    iv = Intervals()
    iv.add((0, 10, "a"))
    iv.add((10, 20, "a"))
    assert iv.intervals == [(0, 20, "a")]


def test_no_merge_gap():
    iv = Intervals()
    iv.add((0, 10, "a"))
    iv.add((11, 20, "a"))
    assert iv.intervals == [(0, 10, "a"), (11, 20, "a")]


def test_no_merge_across_labels():
    iv = Intervals()
    iv.add((0, 10, "a"))
    iv.add((5, 15, "b"))
    assert iv.intervals == [(0, 10, "a"), (5, 15, "b")]


def test_contained():
    iv = Intervals()
    iv.add((0, 100, "a"))
    iv.add((20, 30, "a"))
    assert iv.intervals == [(0, 100, "a")]


def test_negative_coordinates():
    iv = Intervals()
    iv.add((-10, -5, "a"))
    iv.add((-6, 0, "a"))
    assert iv.intervals == [(-10, 0, "a")]


def test_chain_merge():
    iv = Intervals([(0, 2, "a"), (4, 6, "a")])
    assert len(iv) == 2
    iv.add((2, 4, "a"))  # bridges both
    assert iv.intervals == [(0, 6, "a")]


def test_multi_label_sorted_output():
    iv = Intervals([(5, 6, "b"), (0, 1, "a"), (2, 3, "b")])
    assert iv.intervals == [(0, 1, "a"), (2, 3, "b"), (5, 6, "b")]


def test_float_intervals():
    iv = Intervals([(0.0, 1.5, "x"), (1.5, 2.5, "x")])
    assert iv.intervals == [(0.0, 2.5, "x")]


def test_merge_property_vs_bruteforce():
    """Random intervals: merged result must equal a brute-force coverage
    union per label (exhaustive-style check, reference test_interval.py)."""
    import numpy as np

    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(1, 25))
        raw = [
            (int(s), int(s) + int(d) + 1, ["p", "q"][int(l)])
            for s, d, l in zip(
                rng.integers(0, 200, n),
                rng.integers(0, 30, n),
                rng.integers(0, 2, n),
            )
        ]
        iv = Intervals(list(raw))
        for label in ("p", "q"):
            covered = np.zeros(300, bool)
            for s, e, lab in raw:
                if lab == label:
                    covered[s:e] = True
            merged = [(s, e) for s, e, lab in iv if lab == label]
            # merged runs are disjoint, non-adjacent, sorted
            for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
                assert e1 < s2
            got = np.zeros(300, bool)
            for s, e in merged:
                got[s:e] = True
            np.testing.assert_array_equal(got, covered)
