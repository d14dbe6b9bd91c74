"""Batch prediction CLI.

The reference's SLURM pipelines call a ``scripts/predict.py`` that does not
exist there (the live entry is ``src/segma/inference.py.__main__``,
``inference.py:462-501``; drift noted in SURVEY.md §2.2). segma_tpu ships a
real one: a thin wrapper over ``segma_tpu.inference.main``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.inference import main

if __name__ == "__main__":
    main()
