"""Log-mel spectrogram frontend, computed in-graph on the TPU.

TPU-first replacement for the reference's CPU-side
``WhisperFeatureExtractor`` call in dataloader workers
(``src/segma/models/whisper/whisperidou.py:46-50``): here the STFT is
expressed as a single strided convolution whose kernels are the
Hann-windowed DFT basis, so the whole frontend (framing + DFT + mel
projection + log/normalize) is one fused XLA program on the MXU, and raw
waveforms are what crosses the host->device boundary.

Numerics follow Whisper's frontend: n_fft=400, hop=160, Hann window,
reflect center-padding, slaney-scale/slaney-norm mel filterbank, log10 with
(max - 8) clamping and (x + 4) / 4 scaling.
"""

from __future__ import annotations

import contextlib
import contextvars
from functools import lru_cache
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
SAMPLE_RATE = 16_000

# Thread-local "trace the portable XLA formulation, not the Pallas kernel"
# switch. A ContextVar (not an env var) so that an export tracing portable
# programs in one thread cannot leak into an InferencePipeline tracing its
# first program concurrently in another.
_FORCE_PORTABLE: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "segma_tpu_force_portable", default=False
)


@contextlib.contextmanager
def portable_lowering() -> Iterator[None]:
    """Within this context (current thread only), log-mel traces the
    portable conv/XLA formulation even where the Pallas kernel is eligible.
    Used by multi-platform export; ``SEGMA_TPU_NO_PALLAS=1`` remains the
    process-wide escape hatch."""
    token = _FORCE_PORTABLE.set(True)
    try:
        yield
    finally:
        _FORCE_PORTABLE.reset(token)


def _hz_to_mel(freq: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


def mel_filterbank(
    sr: int = SAMPLE_RATE, n_fft: int = N_FFT, n_mels: int = N_MELS
) -> np.ndarray:
    """(n_freqs, n_mels) slaney-normalized triangular mel filterbank
    (librosa-compatible defaults, which is what Whisper's frontend uses)."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]  # (n_freqs, n_mels + 2)
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    # slaney norm: each filter integrates to ~2/bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


@lru_cache(maxsize=4)
def _stft_kernels(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Hann-windowed DFT basis as conv kernels: (n_fft, 1, n_freqs) each."""
    n_freqs = n_fft // 2 + 1
    # periodic Hann (matches torch.hann_window / whisper)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    k = np.arange(n_freqs)[None, :]  # (1, n_freqs)
    n = np.arange(n_fft)[:, None]  # (n_fft, 1)
    angle = 2.0 * np.pi * k * n / n_fft
    cos_k = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_k = (-np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_k[:, None, :], sin_k[:, None, :]


def stft_power(
    wav: jax.Array,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    center: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Power spectrogram |STFT|^2 of (B, T) waveforms -> (B, frames, n_freqs).

    Framing + windowed DFT fuse into two strided convolutions (cos/sin
    basis), which XLA tiles straight onto the MXU.
    """
    if center:
        wav = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    cos_k, sin_k = _stft_kernels(n_fft)
    x = wav[:, :, None].astype(dtype)  # (B, T, 1) NWC
    dn = jax.lax.conv_dimension_numbers(x.shape, cos_k.shape, ("NWC", "WIO", "NWC"))
    # HIGHEST keeps true f32 MXU accumulation (TPU default would drop to
    # bf16 multiplies, which visibly hurts the log-mel floor).
    re = jax.lax.conv_general_dilated(
        x, jnp.asarray(cos_k, dtype), (hop,), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    im = jax.lax.conv_general_dilated(
        x, jnp.asarray(sin_k, dtype), (hop,), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return re * re + im * im  # (B, frames, n_freqs) f32


def _pallas_eligible(
    wav: jax.Array, n_fft: int, hop: int, n_mels: int, drop_last: bool
) -> bool:
    """The fused Pallas kernel covers the default Whisper geometry on TPU."""
    import os

    if _FORCE_PORTABLE.get() or os.environ.get("SEGMA_TPU_NO_PALLAS"):
        return False
    if (n_fft, hop, n_mels, drop_last) != (N_FFT, HOP_LENGTH, N_MELS, True):
        return False
    if wav.shape[-1] % hop != 0:
        return False
    try:
        return jax.default_backend() == "tpu" or jax.devices()[0].platform in (
            "tpu",
            "axon",
        )
    except Exception:
        return False


def log_mel_spectrogram(
    wav: jax.Array,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    sr: int = SAMPLE_RATE,
    drop_last_frame: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Whisper-style log-mel features of (B, T) waveforms -> (B, frames, n_mels).

    ``drop_last_frame=True`` matches Whisper's ``stft[..., :-1]``. On TPU the
    fused Pallas kernel (``ops.pallas_melspec``, ~5x faster than the conv
    formulation) handles the default geometry; the conv/XLA path covers
    everything else.
    """
    if _pallas_eligible(wav, n_fft, hop, n_mels, drop_last_frame):
        from segma_tpu.ops.pallas_melspec import log_mel_spectrogram_pallas

        return log_mel_spectrogram_pallas(wav).astype(dtype)
    power = stft_power(wav, n_fft, hop, center=True, dtype=dtype)
    if drop_last_frame:
        power = power[:, :-1, :]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    mel = jnp.einsum(
        "btf,fm->btm", power, fb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # clamp to 8 dB below the per-example max, then scale
    max_per_ex = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_per_ex - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(dtype)


def whisper_input_features(
    wav: jax.Array, chunk_length_s: float = 30.0, sr: int = SAMPLE_RATE
) -> jax.Array:
    """Pad/trim (B, T) waveforms to the Whisper context (30 s) and return
    (B, n_mels, 3000) features, matching ``WhisperFeatureExtractor`` layout."""
    target = int(chunk_length_s * sr)
    t = wav.shape[1]
    if t < target:
        wav = jnp.pad(wav, ((0, 0), (0, target - t)))
    elif t > target:
        wav = wav[:, :target]
    mel = log_mel_spectrogram(wav)  # (B, 3000, 80)
    return jnp.swapaxes(mel, 1, 2)  # (B, 80, 3000)
