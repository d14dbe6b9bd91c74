"""Test harness config.

Forces JAX onto a virtual 8-device CPU platform BEFORE jax is imported so
multi-chip sharding code paths (mesh construction, pjit, collectives) execute
in CI without TPUs. Mirrors the test plan in SURVEY.md §4.
"""

import os

# Force CPU even when the environment pins JAX_PLATFORMS to a TPU plugin
# (the axon sitecustomize registers the TPU backend at interpreter start).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
for p in (str(REPO_ROOT), str(REPO_ROOT / "scripts")):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np
import pytest
try:  # deterministic hypothesis examples for EVERY test module (a
    # flaky-red suite on the driver's machine would cost more than fresh
    # randomness); optional so a hypothesis-less env still runs the rest
    from hypothesis import settings as _hyp_settings

    _hyp_settings.register_profile("segma_ci", derandomize=True)
    _hyp_settings.load_profile("segma_ci")
except ImportError:  # pragma: no cover
    collect_ignore = ["test_properties.py"]

# Persistent compilation cache: repeated pytest runs skip XLA recompiles.
_CACHE_DIR = REPO_ROOT / ".cache" / "jax"
_CACHE_DIR.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

FIXTURE_AUDIO_S = 20.0  # duration of each synthetic fixture file


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory) -> Path:
    """Session-scoped synthetic SegmaFileDataset (the universal fixture)."""
    from scripts.generate_data import gen_classification

    root = tmp_path_factory.mktemp("data") / "debug_5"
    gen_classification(
        output=root, per_split=5, seed=1234, audio_duration_s=FIXTURE_AUDIO_S
    )
    return root


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
