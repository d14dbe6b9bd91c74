"""4-bit block-ADPCM transport codec for the host->HBM hop.

The end-to-end inference bottleneck in production serving is host->device
bandwidth (BENCH_REPORT.md: the device computes at ~54,000x RT while the
host link moves ~30 MB/s). The pipeline already ships int16 (2 B/sample)
or mu-law int8 (1 B/sample, ~38 dB SNR); this codec gets to **0.547
bytes/sample** (4-bit residuals + 3 header bytes per 64-sample block) —
1.83x fewer bytes than mu-law — while keeping the on-device decode a
fully parallel vector op.

Design (TPU-first, unlike classic IMA ADPCM whose step-size feedback is
inherently sequential):

- the waveform is split into independent 64-sample blocks;
- per block the host stores the exact first sample (int16), a header byte
  (quarter-octave residual scale index + predictor-order bit), and 64
  closed-loop quantized residuals (4-bit two's complement, packed two per
  byte) of a first- or second-order predictor — whichever gives the
  smaller open-loop residual for that block (second order wins on tonal /
  voiced content: measured +4.5 dB on speech-like signals, neutral on
  noise);
- the device reconstructs every block with cumsums over the block axis
  (one for first order, a double cumsum for second order) — cumsum is
  associative, so XLA parallelizes it; there is NO sequential scan and no
  cross-block dependency, unlike IMA ADPCM.

Closed-loop encoding (the encoder quantizes against its own reconstruction)
means the device output is bit-exact to the encoder's prediction chain: no
drift, and an all-zero byte buffer decodes to silence (zero padding of the
transport buffer is safe).

Quality: ~40 dB round-trip SNR on speech-like signals, ~29 dB on pure
high-frequency tones, ~16 dB on broadband white noise. Like mu-law this is
an opt-in throughput transport (``--transport adpcm``) for serving real
audio, not for parity runs. Caveat measured on the synthetic sine fixture:
quantization of a PURE tone produces harmonically-correlated distortion
that a model trained on noise-free sines mis-detects as other labels (both
lossy transports degrade there — adpcm more than mu-law); real broadband
audio does not have this pathology, but validate thresholds on real data
before enabling a lossy transport in production.

Reference has no transport layer at all — it ships float32 tensors to the
GPU per batch (``/root/reference/src/segma/inference.py:92-116``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

BLOCK = 64  # samples per independent block
HEADER_BYTES = 3  # x0 (int16 LE) + scale index (uint8)
PAYLOAD_BYTES = BLOCK // 2  # two 4-bit residuals per byte
BYTES_PER_BLOCK = HEADER_BYTES + PAYLOAD_BYTES  # 35

# quarter-octave residual scales (~0.75 dB scale granularity vs the ~3 dB
# of power-of-two steps — measured +1.4-2 dB round-trip SNR for free);
# index 53 (scale 9742) already covers the max int16 first difference
SCALE_TABLE = np.rint(2.0 ** (np.arange(64) / 4.0)).astype(np.int32)


def n_blocks(n_samples: int) -> int:
    return -(-n_samples // BLOCK)


def encoded_nbytes(n_samples: int) -> int:
    return n_blocks(n_samples) * BYTES_PER_BLOCK


def adpcm_encode(audio: np.ndarray) -> np.ndarray:
    """Encode (..., n) float32 [-1, 1] or int16 PCM -> (..., nb*35) uint8.

    Vectorized across blocks; the (closed-loop) recurrence runs over the 64
    in-block positions only, so encoding a 34-minute file is ~64 numpy steps
    over a ~500k-wide vector (tens of ms, overlapped with dispatch).
    """
    if audio.dtype == np.int16:
        x = audio.astype(np.int32)
    else:
        x = np.rint(np.clip(audio.astype(np.float64), -1.0, 1.0) * 32767.0).astype(
            np.int32
        )
    lead = x.shape[:-1]
    n = x.shape[-1]
    nb = n_blocks(n)
    pad = nb * BLOCK - n
    if pad:
        x = np.concatenate(
            [x, np.zeros((*lead, pad), np.int32)], axis=-1
        )
    blocks = x.reshape(-1, nb, BLOCK)

    x0 = blocks[:, :, 0]
    # per-block predictor order: second order (x[i] ~ 2x[i-1] - x[i-2])
    # wins on tonal/voiced blocks, first order on noise-like blocks; pick
    # whichever leaves the smaller open-loop residual
    d1 = np.diff(blocks, axis=2, prepend=x0[:, :, None])
    r2 = np.diff(d1, axis=2, prepend=np.zeros_like(x0[:, :, None]))
    m1 = np.abs(d1).max(axis=2)
    m2 = np.abs(r2).max(axis=2)
    order2 = m2 < m1
    # residual scale: smallest table entry with 7*scale >= max open-loop
    # residual (closed-loop residuals may exceed it slightly and clip at
    # +-8/7 — bounded, no drift)
    max_res = np.where(order2, m2, m1)
    e = np.searchsorted(SCALE_TABLE, -(-max_res // 7)).astype(np.int32)
    e = np.clip(e, 0, len(SCALE_TABLE) - 1)
    scale = SCALE_TABLE[e]

    nibs = np.empty((blocks.shape[0], nb, BLOCK), np.uint8)
    pred_x = x0.copy()
    pred_d = np.zeros_like(x0)  # stays 0 for first-order blocks
    inv_scale = (1.0 / scale).astype(np.float32)  # f32 mult beats f64 divide
    for i in range(BLOCK):
        r = (blocks[:, :, i] - (pred_x + pred_d)).astype(np.float32)
        q = np.clip(np.rint(r * inv_scale), -8, 7).astype(np.int32)
        step = q * scale
        pred_d = pred_d + np.where(order2, step, 0)
        pred_x = pred_x + np.where(order2, pred_d, step)
        nibs[:, :, i] = (q & 15).astype(np.uint8)

    out = np.empty((blocks.shape[0], nb, BYTES_PER_BLOCK), np.uint8)
    x0_u = (x0 & 0xFFFF).astype(np.uint16)
    out[:, :, 0] = (x0_u & 0xFF).astype(np.uint8)
    out[:, :, 1] = (x0_u >> 8).astype(np.uint8)
    out[:, :, 2] = (e | (order2.astype(np.int32) << 7)).astype(np.uint8)
    out[:, :, HEADER_BYTES:] = nibs[:, :, 0::2] | (nibs[:, :, 1::2] << 4)
    return out.reshape(*lead, nb * BYTES_PER_BLOCK)


def adpcm_decode(data: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Decode (..., nb*35) uint8 -> (..., n_samples) float32 in [-1, 1].

    Pure jax; runs inside the jitted inference program. The only reduction
    is a length-64 cumsum over the block axis — associative, parallel, and
    fused by XLA with the downstream normalization.
    """
    lead = data.shape[:-1]
    nb = data.shape[-1] // BYTES_PER_BLOCK
    b = data.reshape(*lead, nb, BYTES_PER_BLOCK).astype(jnp.int32)
    x0 = b[..., 0] | (b[..., 1] << 8)
    x0 = jnp.where(x0 >= 32768, x0 - 65536, x0)
    hdr = b[..., 2]
    scale = jnp.asarray(SCALE_TABLE)[hdr & 63]
    order2 = (hdr >> 7) == 1
    payload = b[..., HEADER_BYTES:]
    nibs = jnp.stack([payload & 15, (payload >> 4) & 15], axis=-1).reshape(
        *lead, nb, BLOCK
    )
    q = (nibs ^ 8) - 8  # sign-extend 4-bit two's complement
    c1 = jnp.cumsum(q * scale[..., None], axis=-1)  # first-order chain
    c2 = jnp.cumsum(c1, axis=-1)  # second-order: integrate twice
    x = x0[..., None] + jnp.where(order2[..., None], c2, c1)
    flat = x.reshape(*lead, nb * BLOCK)[..., :n_samples]
    return flat.astype(jnp.float32) * (1.0 / 32768.0)


@dataclass
class AdpcmAudio:
    """A file pre-encoded to the ADPCM transport.

    Encoding happens ONCE, off the dispatch path (e.g. in the prefetch
    thread that decodes WAVs); the pipeline then pads the *bytes* with zero
    blocks — which decode to digital silence by construction — so no
    per-dispatch host encode is needed. Slicing at any multiple of BLOCK
    samples is exact (blocks are independent), which the long-file
    segmented dispatch relies on (every current model's frame step is a
    multiple of 64, so chunk strides always align).
    """

    data: np.ndarray  # (n_blocks * BYTES_PER_BLOCK,) uint8
    n_samples: int  # original waveform length in samples

    def block_slice(self, start_sample: int, n_blocks_out: int) -> np.ndarray:
        """Encoded bytes for ``n_blocks_out`` blocks from ``start_sample``
        (must be block-aligned); zero-block padded past the end."""
        if start_sample % BLOCK:
            raise ValueError(
                f"ADPCM slice start {start_sample} is not a multiple of "
                f"{BLOCK}; re-run with an int16 transport for this geometry"
            )
        b0 = start_sample // BLOCK
        out = np.zeros(n_blocks_out * BYTES_PER_BLOCK, np.uint8)
        src = self.data[b0 * BYTES_PER_BLOCK : (b0 + n_blocks_out) * BYTES_PER_BLOCK]
        out[: src.shape[0]] = src
        return out


def adpcm_encode_audio(audio: np.ndarray) -> AdpcmAudio:
    """Encode one decoded file for zero-cost padded dispatch later."""
    return AdpcmAudio(adpcm_encode(audio), int(audio.shape[-1]))


def adpcm_decode_np(data: np.ndarray, n_samples: int) -> np.ndarray:
    """Numpy reference decode (tests pin the jax path against it)."""
    lead = data.shape[:-1]
    nb = data.shape[-1] // BYTES_PER_BLOCK
    b = data.reshape(*lead, nb, BYTES_PER_BLOCK).astype(np.int32)
    x0 = b[..., 0] | (b[..., 1] << 8)
    x0 = np.where(x0 >= 32768, x0 - 65536, x0)
    hdr = b[..., 2]
    scale = SCALE_TABLE[hdr & 63]
    order2 = (hdr >> 7) == 1
    payload = b[..., HEADER_BYTES:]
    nibs = np.stack([payload & 15, (payload >> 4) & 15], axis=-1).reshape(
        *lead, nb, BLOCK
    )
    q = (nibs ^ 8) - 8
    c1 = np.cumsum(q * scale[..., None], axis=-1)
    c2 = np.cumsum(c1, axis=-1)
    x = x0[..., None] + np.where(order2[..., None], c2, c1)
    flat = x.reshape(*lead, nb * BLOCK)[..., :n_samples]
    return flat.astype(np.float32) / 32768.0
