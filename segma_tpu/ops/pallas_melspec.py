"""Fused log-mel frontend as a Pallas TPU kernel.

The XLA path (``segma_tpu.ops.melspec``) computes STFT power via two strided
convolutions and materializes the (B, frames, 201) power spectrogram in HBM
before the mel projection. This kernel fuses framing + windowed DFT + power
+ mel projection into one VMEM-resident pass per frame tile: six MXU
matmuls and a VPU square-add, writing only the (tile, n_mels) result.

Framing trick (hop 160, window 400): view the waveform as rows of 160
samples; frame i = rows[i] ++ rows[i+1] ++ rows[i+2][:80]. With the
Hann-windowed DFT basis split into three row-blocks (A: samples 0-159,
B: 160-319, C: 320-399 zero-padded to 160), the whole tile's DFT becomes

    re = R0 @ A_re + R1 @ B_re + R2 @ C_re      (same for im)

where R0/R1/R2 are the row matrix shifted by 0/1/2 rows — three plain
matmuls per component, no gather, pure MXU work.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segma_tpu.ops.melspec import HOP_LENGTH, N_FFT, N_MELS, mel_filterbank

TILE_F = 256  # frames per kernel invocation


@lru_cache(maxsize=2)
def _split_basis(
    n_fft: int = N_FFT, hop: int = HOP_LENGTH
) -> tuple[np.ndarray, np.ndarray]:
    """Windowed DFT basis split into 3 row blocks of `hop` (last padded)."""
    n_freqs = n_fft // 2 + 1
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    k = np.arange(n_freqs)[None, :]
    n = np.arange(n_fft)[:, None]
    angle = 2.0 * np.pi * k * n / n_fft
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)  # (400, 201)
    sin_b = (-np.sin(angle) * window[:, None]).astype(np.float32)

    def split(basis):
        blocks = []
        for j in range(3):
            blk = basis[j * hop : (j + 1) * hop]
            if blk.shape[0] < hop:  # last block: 80 rows -> pad to 160
                blk = np.pad(blk, ((0, hop - blk.shape[0]), (0, 0)))
            blocks.append(blk)
        return np.stack(blocks)  # (3, hop, n_freqs)

    return split(cos_b), split(sin_b)


def _logmel_kernel(
    r0_ref: Any,
    r1_ref: Any,
    r2_ref: Any,
    cos_ref: Any,
    sin_ref: Any,
    fb_ref: Any,
    out_ref: Any,
) -> None:
    """One (batch, frame-tile) block -> (TILE_F, n_mels) log10-mel."""
    re = jnp.zeros((TILE_F, cos_ref.shape[-1]), jnp.float32)
    im = jnp.zeros_like(re)
    for j, r in enumerate((r0_ref, r1_ref, r2_ref)):
        block = r[0]  # (TILE_F, hop)
        re += jnp.dot(
            block, cos_ref[j], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        im += jnp.dot(
            block, sin_ref[j], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    power = re * re + im * im  # (TILE_F, n_freqs) — never leaves VMEM
    mel = jnp.dot(
        power, fb_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@partial(jax.jit, static_argnames=("interpret",))
def log_mel_spectrogram_pallas(
    wav: jax.Array, interpret: bool = False
) -> jax.Array:
    """Whisper-style log-mel of (B, T) waveforms -> (B, T//hop, n_mels).

    Matches ``ops.melspec.log_mel_spectrogram`` (center reflect padding,
    drop-last-frame, max-8 clamp, (x+4)/4 scaling); T must be a multiple of
    ``hop``. ``interpret=True`` runs in the Pallas interpreter (CPU tests).
    """
    hop, n_fft, n_mels = HOP_LENGTH, N_FFT, N_MELS
    b, t = wav.shape
    assert t % hop == 0, "waveform length must be a multiple of the hop"
    n_frames = t // hop  # == frames after whisper's drop-last

    wav = wav.astype(jnp.float32)
    padded = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")

    n_tiles = -(-n_frames // TILE_F)
    total_frames = n_tiles * TILE_F
    # rows of `hop` samples; frame i reads rows i, i+1, i+2
    need = (total_frames + 2) * hop
    padded = jnp.pad(padded, ((0, 0), (0, max(0, need - padded.shape[1]))))
    rows = lambda k: padded[:, k * hop : (total_frames + k) * hop].reshape(  # noqa: E731
        b, total_frames, hop
    )

    cos_b, sin_b = _split_basis(n_fft, hop)
    fb = mel_filterbank(n_fft=n_fft, n_mels=n_mels)

    shifted_spec = pl.BlockSpec(
        (1, TILE_F, hop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    weight_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    logmel = pl.pallas_call(
        _logmel_kernel,
        grid=(b, n_tiles),
        in_specs=[shifted_spec, shifted_spec, shifted_spec,
                  weight_spec, weight_spec, weight_spec],
        out_specs=pl.BlockSpec(
            (1, TILE_F, n_mels), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, total_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(rows(0), rows(1), rows(2), jnp.asarray(cos_b), jnp.asarray(sin_b),
      jnp.asarray(fb))

    logmel = logmel[:, :n_frames, :]
    max_per_ex = jnp.max(logmel, axis=(1, 2), keepdims=True)
    logmel = jnp.maximum(logmel, max_per_ex - 8.0)
    return (logmel + 4.0) / 4.0
