"""Pallas log-mel kernel vs the XLA conv formulation (interpreter mode on
CPU; the compiled path is exercised on real TPU by bench/CLIs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from segma_tpu.ops.melspec import log_mel_spectrogram
from segma_tpu.ops.pallas_melspec import TILE_F, log_mel_spectrogram_pallas


@pytest.mark.parametrize("t", [16_000, 64_000])
def test_pallas_matches_xla(t):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, t)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
    got = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(wav), interpret=True))
    assert got.shape == ref.shape == (2, t // 160, 80)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pallas_tile_boundary():
    """Frame count not a multiple of TILE_F exercises the padded tail."""
    t = (TILE_F + 7) * 160
    wav = (np.random.default_rng(1).standard_normal((1, t)) * 0.1).astype(
        np.float32
    )
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
    got = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(wav), interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_non_multiple_hop_rejected():
    with pytest.raises(AssertionError):
        log_mel_spectrogram_pallas(jnp.zeros((1, 16_001)), interpret=True)
