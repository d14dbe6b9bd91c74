"""Resumable training entry point (parity: reference
``scripts/auto_train.py:69-251``). Thin shim over
``segma_tpu.cli.auto_train`` (also ``segma-tpu auto-train``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.cli.auto_train import main

if __name__ == "__main__":
    main()
