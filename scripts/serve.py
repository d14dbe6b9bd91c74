"""Serving CLI: expose a trained model over HTTP.

Thin shim over ``segma_tpu.cli.serve`` (also ``segma-tpu serve``).

Usage:
    python scripts/serve.py --config models/<run>/config.yml \
        --checkpoint models/<run>/checkpoints/best.ckpt --port 8000 \
        [--thresholds best_thresholds.yml]
    python scripts/serve.py --artifact exported/<model>  # frozen export dir

Then:
    curl -s --data-binary @file.wav localhost:8000/v1/segment?uri=file
    curl -s localhost:8000/healthz
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.cli.serve import main

if __name__ == "__main__":
    main()
