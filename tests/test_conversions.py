import numpy as np

from segma_tpu.utils.conversions import (
    frames_to_milliseconds,
    frames_to_seconds,
    milliseconds_to_frames,
    ms_to_s,
    s_to_ms,
    seconds_to_frames,
)


def test_seconds_frames_roundtrip():
    assert seconds_to_frames(4.0) == 64_000
    assert seconds_to_frames(2.0, sample_rate=8000) == 16_000
    assert frames_to_seconds(64_000) == 4.0


def test_ms():
    assert s_to_ms(1.5) == 1500.0
    assert ms_to_s(1500.0) == 1.5
    assert milliseconds_to_frames(20.0) == 320
    assert frames_to_milliseconds(320) == 20.0


def test_array_input():
    f = seconds_to_frames(np.array([1.0, 2.0]))
    np.testing.assert_array_equal(f, [16_000, 32_000])
    assert f.dtype == np.int64
