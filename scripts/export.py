"""Export a trained model as a self-contained serving artifact.

Thin shim over ``segma_tpu.cli.export`` (also ``segma-tpu export``).

Usage:
    python scripts/export.py --config models/<run>/config.yml \
        --checkpoint models/<run>/checkpoints/best.ckpt \
        --output artifacts/<run> [--thresholds best_thresholds.yml] \
        [--transport int16] [--buckets 8 32 128 512]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.cli.export import main

if __name__ == "__main__":
    main()
