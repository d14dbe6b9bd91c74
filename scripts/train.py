"""Training entry point (parity: reference ``scripts/train.py:48-200``).

Thin shim over ``segma_tpu.cli.train`` (also available as
``segma-tpu train`` once installed).

Usage:
    python scripts/train.py -c segma_tpu/config/default.yml [--tags ...] \
        [key.path=value overrides ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.cli.train import build_argparser, main, run_training  # noqa: F401

if __name__ == "__main__":
    main()
