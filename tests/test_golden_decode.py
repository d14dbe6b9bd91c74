"""Golden decode fixture: synthetic logits -> intervals -> RTTM text must
stay bit-identical across refactors (SURVEY.md §4 test plan: decode parity
fixtures)."""

from pathlib import Path

import numpy as np

from segma_tpu.inference import (
    create_intervals,
    default_thresholds,
    intervals_from_boundaries,
    write_intervals,
)
from segma_tpu.models.base import ConvolutionSettings
from segma_tpu.utils.encoders import MultiLabelEncoder

GOLDEN = Path(__file__).resolve().parent / "golden" / "decode.rttm"
FRAME_CS = ConvolutionSettings((320,), (320,), (0,))
LABELS = ["KCHI", "OCH", "MAL", "FEM"]


def _synthetic_logits() -> np.ndarray:
    """Deterministic logits: structured sin/cos pattern over 500 frames."""
    t = np.arange(500)[:, None]
    phase = np.array([0.0, 1.3, 2.1, 4.0])[None, :]
    return (3.0 * np.sin(t / 17.0 + phase) - 1.0).astype(np.float32)


def _decode_rttm_text(tmp_path: Path) -> str:
    enc = MultiLabelEncoder(LABELS)
    logits = _synthetic_logits()
    mask = 1.0 / (1.0 + np.exp(-logits)) > 0.5
    intervals = create_intervals(mask, FRAME_CS, enc)
    out = write_intervals(intervals, Path("x/golden_uri.wav"), tmp_path)
    return out.read_text()


def test_golden_decode(tmp_path):
    text = _decode_rttm_text(tmp_path)
    if not GOLDEN.exists():  # first run generates the fixture
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(text)
    assert text == GOLDEN.read_text()


def test_boundary_path_matches_mask_path():
    """intervals_from_boundaries == create_intervals on the same mask."""
    enc = MultiLabelEncoder(LABELS)
    logits = _synthetic_logits()
    probs = 1.0 / (1.0 + np.exp(-logits))
    mask = probs > 0.5
    ref = sorted(create_intervals(mask, FRAME_CS, enc))
    zero = np.zeros((1, mask.shape[1]), bool)
    starts = mask & ~np.concatenate([zero, mask[:-1]])
    ends = mask & ~np.concatenate([mask[1:], zero])
    got = sorted(intervals_from_boundaries(starts, ends, FRAME_CS, enc))
    assert got == ref
