"""The ``scripts/`` tree is a reference-layout parity shim layer: each
file forwards to a real entry point in ``segma_tpu/cli`` (or the module's
own ``main``). This pins the forwarding for EVERY shim — an import error
or a dropped ``main`` in any of them must fail the suite, not a user's
SLURM job (round-4 verdict item 8).
"""

import importlib.util
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"

# every python shim/script and the entry callable it must expose
SHIM_MAINS = {
    "auto_train": "main",
    "evaluate": "main",
    "export": "main",
    "gen_experiments": "gen_sweep",
    "generate_data": "main",
    "import_checkpoint": "main",
    "load_data": "import_protocol",
    "predict": "main",
    "serve": "main",
    "train": "main",
    "tune": "main",
}


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        f"shim_{name}", SCRIPTS / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    # dataclass creation resolves cls.__module__ through sys.modules:
    # register before exec, pop after
    sys.modules[f"shim_{name}"] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(f"shim_{name}", None)
    return mod


@pytest.mark.parametrize("name", sorted(SHIM_MAINS))  # noqa: PT006
def test_shim_forwards_a_callable_main(name):
    mod = _load(name)
    entry = SHIM_MAINS[name]
    assert callable(getattr(mod, entry, None)), (
        f"scripts/{name}.py must expose a callable {entry}()"
    )


def test_shim_inventory_is_complete():
    """Every .py in scripts/ is either a pinned shim or a known
    tool/bench script — new shims must be added to SHIM_MAINS."""
    tools = {
        "__init__",
        "bench_attention",
        "bench_backbones",
        "bench_streaming",
        "chaos_soak",
        "check_types",
        "mfu",
        "profile_inference",
        "save_load_wavlm",
        "save_load_whisper",
        "validate_real",
    }
    found = {p.stem for p in SCRIPTS.glob("*.py")}
    assert found == set(SHIM_MAINS) | tools


def test_train_shim_exposes_programmatic_api():
    """scripts/train.py re-exports run_training/build_argparser for
    programmatic callers (reference layout compatibility)."""
    mod = _load("train")
    assert callable(mod.run_training) and callable(mod.build_argparser)
    sys.modules.pop("shim_train", None)
