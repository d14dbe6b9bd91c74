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
    def transform(self, label) -> int: ...

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

    def transform(self, label) -> int:
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
