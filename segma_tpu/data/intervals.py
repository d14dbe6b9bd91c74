"""Vectorized annotation interval index.

Replaces the reference's per-window python loop over an ``interlap.InterLap``
tree (``src/segma/data/loaders.py:297-313``: ~199 ``find`` calls per sample)
with a single numpy broadcast: all windows of a chunk are labeled at once.
Overlap semantics match InterLap (inclusive on both endpoints).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.utils.encoders import LabelEncoder


@dataclass
class IntervalIndex:
    """Annotations of one audio file as flat arrays (frame units).

    Attributes:
        starts: (A,) int64 annotation start frames.
        ends: (A,) int64 annotation end frames.
        label_onehot: (A, L) float32 one-hot of each annotation's label.
        labels: (A,) object array of label strings (for readable queries).
    """

    starts: np.ndarray
    ends: np.ndarray
    label_onehot: np.ndarray
    labels: np.ndarray

    @classmethod
    def from_annotations(
        cls, annotations: list[AudioAnnotation], label_encoder: LabelEncoder
    ) -> "IntervalIndex":
        n_labels = len(label_encoder.base_labels)
        if not annotations:
            return cls(
                starts=np.zeros(0, np.int64),
                ends=np.zeros(0, np.int64),
                label_onehot=np.zeros((0, n_labels), np.float32),
                labels=np.array([], dtype=object),
            )
        starts = np.array([a.start_time_f for a in annotations], np.int64)
        ends = np.array([a.end_time_f for a in annotations], np.int64)
        onehot = np.zeros((len(annotations), n_labels), np.float32)
        for i, a in enumerate(annotations):
            onehot[i, label_encoder.transform(a.label)] = 1.0
        labels = np.array([a.label for a in annotations], dtype=object)
        return cls(starts, ends, onehot, labels)

    def query_windows(self, windows: np.ndarray) -> np.ndarray:
        """Multi-hot targets for a batch of windows.

        Args:
            windows: (W, 2) int array of inclusive [start, end] frame ranges.

        Returns:
            (W, n_labels) float32 multi-hot; all-zero rows mean "no class"
            (matching ``windows_to_targets``, ``loaders.py:297-313``).
        """
        if len(self.starts) == 0:
            return np.zeros((windows.shape[0], self.label_onehot.shape[1]), np.float32)
        w_start = windows[:, 0:1]  # (W, 1)
        w_end = windows[:, 1:2]
        # inclusive overlap, InterLap semantics
        hit = (self.starts[None, :] <= w_end) & (self.ends[None, :] >= w_start)
        y = hit.astype(np.float32) @ self.label_onehot  # (W, L) counts
        return (y > 0).astype(np.float32)

    def find_labels(self, start: int, end: int) -> set[str]:
        """Labels of annotations overlapping [start, end] (inclusive)."""
        hit = (self.starts <= end) & (self.ends >= start)
        return set(self.labels[hit])

    def __len__(self) -> int:
        return len(self.starts)
