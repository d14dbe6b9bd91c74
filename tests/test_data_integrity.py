"""Guard test over the real dataset split files, iff present
(mirrors reference tests/test_data_integrity.py: skip when the production
dataset is not on this machine)."""

from pathlib import Path

import pytest

DATA = Path("data/baby_train")

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="production dataset not present"
)


def test_split_files_exist():
    for split in ("train", "val", "test"):
        assert (DATA / f"{split}.txt").exists()


def test_no_split_leakage():
    from segma_tpu.data import SegmaFileDataset

    # constructor runs the pairwise leakage check
    SegmaFileDataset(DATA, ["KCHI", "OCH", "MAL", "FEM"], 4.0)
