"""Test harness config.

Forces JAX onto a virtual 8-device CPU platform BEFORE jax is imported so
multi-chip sharding code paths (mesh construction, pjit, collectives) execute
in CI without TPUs. Mirrors the test plan in SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
for p in (str(REPO_ROOT), str(REPO_ROOT / "scripts")):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory) -> Path:
    """Session-scoped synthetic SegmaFileDataset (the universal fixture)."""
    from scripts.generate_data import gen_classification

    root = tmp_path_factory.mktemp("data") / "debug_5"
    gen_classification(output=root, per_split=5, seed=1234)
    return root


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
