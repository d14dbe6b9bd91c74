"""Native decoder tests: C++ results must equal the numpy implementation."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from segma_tpu.utils import native
from segma_tpu.utils.io import write_data_to_disk

REPO = Path(__file__).resolve().parent.parent
SR = 16_000


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not (REPO / "native" / "libsegmawav.so").exists():
        subprocess.run(["make", "-C", str(REPO / "native")], check=True)
    native._lib.cache_clear()
    if not native.available():
        pytest.skip("native lib unavailable")


@pytest.fixture
def ramp_wav(tmp_path):
    x = (np.arange(SR, dtype=np.float32) / SR)[None, :]
    p = tmp_path / "ramp.wav"
    write_data_to_disk(x, p, SR)
    return p


def test_probe(ramp_wav):
    sr, channels, bits, fmt, n = native.probe(ramp_wav)
    assert (sr, channels, bits, fmt, n) == (SR, 1, 16, 1, SR)


def test_read_range_matches_numpy(ramp_wav, monkeypatch):
    got = native.read_range(ramp_wav, 1000, 500, channels=1)
    assert got.shape == (500, 1)
    # compare against the pure-numpy path
    monkeypatch.setenv("SEGMA_TPU_NO_NATIVE", "1")
    native._lib.cache_clear()
    from segma_tpu.utils.io import get_samples_in_range

    ref = get_samples_in_range(ramp_wav, 1000, 500)
    native._lib.cache_clear()
    np.testing.assert_allclose(got[:, 0], ref[0], atol=1e-7)


def test_read_pcm16(ramp_wav):
    raw = native.read_pcm16(ramp_wav)
    assert raw.dtype == np.int16
    assert raw.shape == (SR,)
    # sample 8000 of the ramp is 0.5 -> ~16384
    assert abs(int(raw[8000]) - 16384) <= 1


def test_read_pcm16_rejects_stereo(tmp_path):
    p = tmp_path / "st.wav"
    write_data_to_disk(np.zeros((2, 100), np.float32), p, SR)
    assert native.read_pcm16(p) is None


def test_batch_decode(tmp_path):
    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.wav"
        write_data_to_disk(
            np.full((1, 1000 + i), 0.25, np.float32), p, SR
        )
        paths.append(p)
    buf, lengths = native.read_batch_pcm16(paths, max_frames=1004, n_threads=3)
    assert buf.shape == (5, 1004)
    np.testing.assert_array_equal(lengths, [1000, 1001, 1002, 1003, 1004])
    # padded tails are zero
    assert buf[0, 1000:].max() == 0
    assert abs(int(buf[0, 0]) - 8192) <= 1


def test_io_uses_native_transparently(ramp_wav):
    from segma_tpu.utils.io import get_audio_info, get_samples_in_range

    info = get_audio_info(ramp_wav)
    assert info.n_samples == SR
    x = get_samples_in_range(ramp_wav, 0, 100)
    assert x.shape == (1, 100)
