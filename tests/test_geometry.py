"""Receptive-field math parity tests (reference tests/test_ConvolutionSettings.py
plus the §2.9 numeric invariants from SURVEY.md)."""

import numpy as np
import pytest

from segma_tpu.models.geometry import ConvolutionSettings

WHISPER = ConvolutionSettings((400, 3, 3), (160, 1, 2), (200, 1, 1))
HUBERT = ConvolutionSettings(
    (10, 3, 3, 3, 3, 2, 2), (5, 2, 2, 2, 2, 2, 2), (0, 0, 0, 0, 0, 0, 0)
)
INFERENCE = ConvolutionSettings((320,), (320,), (0,))


def test_mismatched_lengths_raise():
    with pytest.raises(ValueError):
        ConvolutionSettings((3, 3), (1,), (0, 0))


def test_whisper_stack_invariants():
    assert WHISPER.rf_step == 320  # 20 ms at 16 kHz
    # even kernel (400) present -> effective step 321
    assert WHISPER.effective_step == 321
    # 4 s @ 16 kHz -> 199 windows in truncation mode (the Whisper path,
    # reference surgical_hydra.py:103-106 with strict=False)
    assert WHISPER.n_windows(64_000, strict=False) == 199
    assert WHISPER.rf_size == 1040
    assert WHISPER.n_windows(64_000, strict=True) == 197
    # 2 s chunk -> 99 windows (reference hydra.py:80 comment)
    assert WHISPER.n_windows(32_000, strict=False) == 99


def test_hubert_stack_invariants():
    assert HUBERT.rf_step == 320
    assert HUBERT.effective_step == 321  # kernel 10 and 2 are even
    assert HUBERT.n_windows(64_000, strict=False) == 199
    assert HUBERT.rf_size == 400


def test_inference_stack():
    assert INFERENCE.rf_step == 320
    assert INFERENCE.effective_step == 321  # 320 is even
    assert INFERENCE.rf_size == 320
    assert INFERENCE.rf_start_i(0) == 0
    assert INFERENCE.rf_end_i(0) == 319
    assert INFERENCE.rf_start_i(5) == 1600
    # chunk bookkeeping: missing frames per 4 s chunk = 64000 - 199*320 = 320
    n_w = INFERENCE.n_windows(64_000, strict=True)
    assert n_w == 199
    assert 64_000 - n_w * INFERENCE.rf_step == 320


def test_simple_stack_rf():
    cs = ConvolutionSettings((3,), (1,), (0,))
    assert cs.rf_size == 3
    assert cs.rf_step == 1
    assert cs.rf_start_i(0) == 0
    assert cs.rf_end_i(0) == 2
    assert cs.rf_center_i(0) == 1.0


def test_padded_stack_rf_negative_start():
    cs = ConvolutionSettings((5,), (2,), (2,))
    assert cs.rf_start_i(0) == -2
    assert cs.rf_end_i(0) == 2
    assert cs.rf_step == 2


def test_rf_bounds_vectorized_matches_scalar():
    for cs in (WHISPER, HUBERT, INFERENCE):
        bounds = cs.rf_bounds(50)
        for i in range(50):
            assert bounds[i, 0] == cs.rf_start_i(i)
            assert bounds[i, 1] == cs.rf_end_i(i)
    assert bounds.dtype == np.int64
