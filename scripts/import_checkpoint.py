"""Migration CLI: reference (torch/Lightning) checkpoint -> segma_tpu.

Thin shim over ``segma_tpu.cli.import_checkpoint`` (also
``segma-tpu import``).

Usage:
    python scripts/import_checkpoint.py --ckpt ref_best.ckpt \
        --config segma_tpu/config/default.yml --out imported_ckpt
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.cli.import_checkpoint import main

if __name__ == "__main__":
    main()
