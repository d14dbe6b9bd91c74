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


def host_rss_gb() -> float:
    """This process's resident set size in GB (0.0 when /proc is absent)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6  # kB -> GB
    except OSError:
        pass
    return 0.0


def host_mem_total_gb() -> float:
    """Total host RAM in GB (0.0 when /proc is absent)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0
