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


# ---------------------------------------------------------------------------
# Malformed input handling — both the native decoder and the numpy fallback
# must reject corrupt files with a ValueError (never crash or mis-decode)
# ---------------------------------------------------------------------------

import struct

from segma_tpu.utils import native as native_mod
from segma_tpu.utils.io import get_audio_info


@pytest.fixture(params=["native", "python"])
def decoder(request, monkeypatch):
    if request.param == "native":
        if not native_mod.available():
            pytest.skip("native decoder not built")
    else:
        monkeypatch.setattr(native_mod, "_lib", lambda: None)
    return request.param


def _pcm16_header(n_data_bytes: int, channels: int = 1, bits: int = 16,
                  fmt: int = 1, sr: int = 16_000) -> bytes:
    fmt_chunk = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", fmt, channels, sr, sr * channels * bits // 8,
        channels * bits // 8, bits,
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + n_data_bytes) + b"WAVE"
        + fmt_chunk + b"data" + struct.pack("<I", n_data_bytes)
    )


def test_not_riff_rejected(decoder, tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"JUNKJUNKJUNKJUNK" * 4)
    with pytest.raises(ValueError):
        get_audio_info(p)
    with pytest.raises(ValueError):
        get_all_samples(p)


def test_empty_file_rejected(decoder, tmp_path):
    p = tmp_path / "empty.wav"
    p.write_bytes(b"")
    with pytest.raises(ValueError):
        get_all_samples(p)


def test_unsupported_encoding_rejected(decoder, tmp_path):
    p = tmp_path / "pcm8.wav"  # 8-bit PCM: not a supported encoding
    p.write_bytes(_pcm16_header(4, bits=8) + b"\x80" * 4)
    with pytest.raises(ValueError):
        get_all_samples(p)


def test_truncated_data_chunk_clamps(decoder, tmp_path):
    """Header claims 1000 frames but only 10 are present: decode what
    exists rather than erroring mid-read (files cut by a crashed writer)."""
    p = tmp_path / "truncated.wav"
    p.write_bytes(_pcm16_header(2000) + struct.pack("<10h", *range(10)))
    out = get_all_samples(p)
    assert out.shape == (1, 10)
    np.testing.assert_allclose(out[0] * 32768.0, np.arange(10), atol=1e-4)


def test_missing_data_chunk_rejected(decoder, tmp_path):
    p = tmp_path / "nodata.wav"
    hdr = _pcm16_header(0)
    p.write_bytes(hdr[: hdr.index(b"data")])  # fmt only, no data chunk
    with pytest.raises(ValueError):
        get_all_samples(p)


def test_sub_byte_encoding_rejected(decoder, tmp_path):
    """4-bit (ADPCM-style) fmt: bytes-per-frame would be 0 — must raise
    ValueError, never SIGFPE (regression: round-2 review of wavio.cpp)."""
    p = tmp_path / "adpcm4.wav"
    fmt4 = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 2, 1, 16_000, 8_000, 1, 4
    )
    p.write_bytes(
        b"RIFF" + struct.pack("<I", 40) + b"WAVE" + fmt4
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError):
        get_all_samples(p)


def test_short_fmt_chunk_rejected(decoder, tmp_path):
    """fmt chunk smaller than 16 bytes: field reads would run past the
    buffer — must be a clean ValueError."""
    p = tmp_path / "shortfmt.wav"
    fmts = b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x01\x00\x80\x3e\x00\x00"
    p.write_bytes(
        b"RIFF" + struct.pack("<I", 28) + b"WAVE" + fmts
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        get_all_samples(p)
