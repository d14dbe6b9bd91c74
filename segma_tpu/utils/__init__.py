"""Utility layer: seeding, conversions, encoders, audio I/O."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> None:
    """Seed python and numpy RNGs for reproducibility.

    JAX randomness is functional (explicit ``jax.random.key`` threading), so
    unlike the reference (``src/segma/utils/__init__.py:7-18``) there is no
    global framework RNG to seed; entry points derive their jax keys from the
    same config seed. XLA executions are deterministic per compiled program.
    """
    random.seed(seed)
    np.random.seed(seed)
