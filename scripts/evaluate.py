"""Evaluation CLI (see ``segma_tpu.evaluate``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.evaluate import main

if __name__ == "__main__":
    main()
