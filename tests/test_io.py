"""Audio I/O tests: header probe + ranged reads on fixture WAVs
(reference tests/test_io.py approach, plus encoding coverage)."""

import numpy as np
import pytest

from segma_tpu.utils.io import (
    get_all_samples,
    get_audio_info,
    get_samples_in_range,
    write_data_to_disk,
)

SR = 16_000


@pytest.fixture
def zeros_wav(tmp_path):
    """3-minute zeros WAV (matches reference fixture, tests/test_io.py)."""
    p = tmp_path / "zeros.wav"
    write_data_to_disk(np.zeros((1, 180 * SR), np.float32), p, SR)
    return p


@pytest.fixture
def ramp_wav(tmp_path):
    """Short deterministic ramp to validate ranged reads sample-exactly."""
    p = tmp_path / "ramp.wav"
    x = (np.arange(SR, dtype=np.float32) / SR)[None, :]  # 1 s ramp 0..1
    write_data_to_disk(x, p, SR)
    return p


def test_info(zeros_wav):
    info = get_audio_info(zeros_wav)
    assert info.sample_rate == SR
    assert info.n_samples == 180 * SR
    assert info.n_channels == 1


def test_full_read_shape(zeros_wav):
    x = get_all_samples(zeros_wav)
    assert x.shape == (1, 180 * SR)
    assert x.dtype == np.float32
    assert np.all(x == 0)


def test_ranged_read(ramp_wav):
    x = get_samples_in_range(ramp_wav, start_f=1000, duration_f=500)
    assert x.shape == (1, 500)
    expected = np.arange(1000, 1500, dtype=np.float32) / SR
    np.testing.assert_allclose(x[0], expected, atol=2 / 32767)


def test_open_ended_read(ramp_wav):
    x = get_samples_in_range(ramp_wav, start_f=SR - 100, duration_f=-1)
    assert x.shape == (1, 100)


def test_read_past_end_clamps(ramp_wav):
    x = get_samples_in_range(ramp_wav, start_f=SR - 10, duration_f=100)
    assert x.shape == (1, 10)


def test_stereo_roundtrip(tmp_path):
    p = tmp_path / "stereo.wav"
    x = np.stack(
        [np.linspace(-1, 1, 1000), np.linspace(1, -1, 1000)]
    ).astype(np.float32)
    write_data_to_disk(x, p, SR)
    info = get_audio_info(p)
    assert info.n_channels == 2
    assert info.n_samples == 1000
    y = get_all_samples(p)
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=2 / 32767)


def test_scipy_written_wav_compat(tmp_path):
    """Files written by scipy (like the reference fixtures) parse fine."""
    from scipy.io import wavfile

    p = tmp_path / "scipy.wav"
    x = (np.sin(np.linspace(0, 100, 4000)) * 0.5).astype(np.float32)
    wavfile.write(p, SR, x)  # float32 WAV
    info = get_audio_info(p)
    assert info.sample_rate == SR
    assert info.n_samples == 4000
    y = get_all_samples(p)
    np.testing.assert_allclose(y[0], x, atol=1e-6)
