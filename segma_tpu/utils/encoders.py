"""Label encoders: label <-> index maps and multi-hot target vectors.

Capability parity with ``src/segma/utils/encoders.py:7-119``. The
``MultiLabelEncoder`` is what makes the task multi-label: a window where
several speakers are simultaneously active gets a multi-hot vector with
several ones (``encoders.py:85-98``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Iterable

import numpy as np


class LabelEncoder(ABC):
    """Abstract label encoder interface shared by every pipeline layer."""

    @property
    @abstractmethod
    def labels(self) -> tuple[str, ...]:
        """Encoded labels, in index order."""

    @property
    @abstractmethod
    def base_labels(self) -> tuple[str, ...]:
        """Raw label vocabulary."""

    @abstractmethod
    def transform(self, label: str | tuple[str, ...]) -> int: ...

    @abstractmethod
    def inv_transform(self, i: int) -> str | tuple[str, ...]: ...

    @abstractmethod
    def one_hot(self, labels: Iterable[str] | str) -> np.ndarray: ...

    @abstractmethod
    def i_to_one_hot(self, i: int) -> np.ndarray: ...

    def __call__(self, labels: str | tuple[str, ...] = ()) -> int:
        return self.transform(labels)

    def __len__(self) -> int:
        raise NotImplementedError

    def __contains__(self, label) -> bool:
        raise NotImplementedError


class PowersetEncoder(LabelEncoder):
    """Powerset multi-class encoder: every subset of <= ``max_set_size``
    simultaneously-active labels becomes ONE class.

    The reference's ``LabelEncoder`` ABC documents powerset classes but
    ships no implementation (``encoders.py:39-45`` vestige); this completes
    the capability (pyannote-3-style powerset segmentation). Class 0 is the
    empty set ("no speaker").
    """

    def __init__(
        self, labels: list[str] | tuple[str, ...], max_set_size: int = 2
    ) -> None:
        from itertools import combinations

        self._base = tuple(labels)
        self.max_set_size = max_set_size
        subsets: list[tuple[str, ...]] = [()]
        for k in range(1, max_set_size + 1):
            subsets.extend(combinations(self._base, k))
        self._subsets = tuple(subsets)
        self.map = {s: i for i, s in enumerate(self._subsets)}
        self.rev_map = {i: s for s, i in self.map.items()}

    @property
    def labels(self) -> tuple[tuple[str, ...], ...]:
        return self._subsets

    @property
    def base_labels(self) -> tuple[str, ...]:
        return self._base

    def _canonical(self, labels: Iterable[str] | str) -> tuple[str, ...]:
        if isinstance(labels, str):
            labels = (labels,)
        ordered = tuple(label for label in self._base if label in set(labels))
        extra = set(labels) - set(self._base)
        if extra:
            raise KeyError(f"unknown labels: {sorted(extra)}")
        if len(ordered) > self.max_set_size:
            # keep the first max_set_size in vocabulary order (rare overlap
            # beyond the modeled set size)
            ordered = ordered[: self.max_set_size]
        return ordered

    def transform(self, label: str | tuple[str, ...]) -> int:
        return self.map[self._canonical(label if label != () else ())]

    def inv_transform(self, i: int) -> tuple[str, ...]:
        if not (0 <= i < len(self._subsets)):
            raise ValueError(
                f"transformed index '{i}' is not assigned, only "
                f"{len(self._subsets)} classes are available."
            )
        return self.rev_map[i]

    def one_hot(self, labels: Iterable[str] | str) -> np.ndarray:
        vec = np.zeros(len(self._subsets), dtype=int)
        vec[self.transform(tuple(labels) if not isinstance(labels, str) else labels)] = 1
        return vec

    def i_to_one_hot(self, i: int) -> np.ndarray:
        vec = np.zeros(len(self._subsets), dtype=int)
        vec[i] = 1
        return vec

    @property
    def n_single_classes(self) -> int:
        """Number of subset classes holding fewer than two base labels (the
        empty set + singletons). Subsets are ordered by set size, so these
        are exactly the first ``n_single_classes`` class indices — the
        prefix the reference's ``partial_*`` validation metrics average
        over (``src/segma/models/base.py:204-207``)."""
        return sum(1 for s in self._subsets if len(s) < 2)

    def membership_matrix(self) -> np.ndarray:
        """(n_classes, n_base) 0/1 matrix: subset i contains base label j."""
        member = np.zeros((len(self._subsets), len(self._base)), np.float32)
        for i, subset in enumerate(self._subsets):
            for label in subset:
                member[i, self._base.index(label)] = 1.0
        return member

    def to_multilabel(self, class_probs: np.ndarray) -> np.ndarray:
        """(..., n_classes) powerset probabilities -> (..., n_base) marginal
        per-label probabilities (sum of subset probs containing the label)."""
        return class_probs @ self.membership_matrix()

    def multihot_lut(self) -> np.ndarray:
        """(2**n_base,) int32 lookup: multi-hot bitmask -> subset class id.

        Masks with more than ``max_set_size`` active labels truncate to the
        first ``max_set_size`` in vocabulary order (same rule as
        ``transform``). Lets training targets convert from the data
        pipeline's multi-hot vectors with one gather.
        """
        n = len(self._base)
        if n > 16:
            raise ValueError("multihot LUT limited to 16 base labels")
        lut = np.zeros(2**n, np.int32)
        for mask in range(2**n):
            labels = tuple(
                self._base[j] for j in range(n) if (mask >> j) & 1
            )
            lut[mask] = self.map[self._canonical(labels)]
        return lut

    def __len__(self) -> int:
        return len(self._subsets)

    def __contains__(self, label) -> bool:
        if isinstance(label, list):
            label = tuple(label)
        if isinstance(label, tuple):
            return label in self.map
        return label in self._base


class MultiLabelEncoder(LabelEncoder):
    """Maps each label to an integer index; targets are multi-hot vectors."""

    def __init__(self, labels: list[str] | tuple[str, ...]) -> None:
        self._labels = tuple(labels)
        self.n_labels = len(self._labels)
        self.map = {label: i for i, label in enumerate(self._labels)}
        self.rev_map = {i: label for label, i in self.map.items()}

    @property
    def labels(self) -> tuple[str, ...]:
        return tuple(self.map.keys())

    @property
    def base_labels(self) -> tuple[str, ...]:
        return self._labels

    def transform(self, label: str | tuple[str, ...]) -> int:
        return self.map[label]

    def inv_transform(self, i: int) -> str:
        if not (0 <= i < self.n_labels):
            raise ValueError(
                f"transformed index '{i}' is not assigned, only "
                f"{self.n_labels} labels are available."
            )
        return self.rev_map[i]

    def one_hot(self, labels: Iterable[str] | str) -> np.ndarray:
        """Multi-hot vector over a *set* of simultaneously active labels."""
        labels = (labels,) if isinstance(labels, str) else labels
        idxs = [self.transform(label) for label in labels]
        vec = np.zeros(self.n_labels, dtype=int)
        vec[idxs] = 1
        return vec

    def i_to_one_hot(self, i: int) -> np.ndarray:
        return self.one_hot(self.rev_map[i])

    def __len__(self) -> int:
        return self.n_labels

    def __contains__(self, label) -> bool:
        if isinstance(label, (list, tuple)):
            raise ValueError(
                "Collections not supported, only single item membership makes sense"
            )
        return label in self.labels
