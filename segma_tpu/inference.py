"""Sliding-window inference over arbitrarily long WAV files.

TPU-first redesign of the reference pipeline (``src/segma/inference.py``):
instead of a host-side python loop that decodes, unfolds and forwards one
128-chunk batch at a time (``apply_model_on_audio``, ``inference.py:119-211``),
the whole file is device_put once as a flat waveform and a single jitted
program does:

    pad -> overlap-unfold (two reshapes + concat, no gather)
        -> batched model forward (lax.map over fixed-size batches)
        -> sigmoid + per-label thresholds
        -> run-boundary detection (shift/compare)

Host work is reduced to reading WAV bytes, slicing the valid frame count and
formatting RTTM lines. File lengths are bucketed (in chunks) so the number of
distinct compiled programs is logarithmic.

Chunk geometry parity (reference ``Chunkyfier``, ``inference.py:21-89``,
derived here instead of hardcoded 199/320 asserts):
- chunk stride = chunk_f - missing_n_frames,
- ``missing_n_frames = chunk_f - n_windows * rf_step``,
- tail processed iff >= ``TAIL_MIN_SAMPLES`` (400) samples remain,
- decoded interval = [max(0, rf_start(first)), rf_end(last) + 1] samples.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from math import floor
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.config import Config, load_config
from segma_tpu.models.base import ConvolutionSettings, SegmentationModel
from segma_tpu.ops.adpcm import AdpcmAudio, adpcm_encode_audio, n_blocks
from segma_tpu.utils.conversions import frames_to_seconds
from segma_tpu.utils.encoders import LabelEncoder, MultiLabelEncoder
from segma_tpu.utils.io import get_all_samples, read_pcm16_mono

TAIL_MIN_SAMPLES = 400  # reference inference.py:195


class Chunkyfier:
    """Sliding-chunk bookkeeping, fully derived from geometry.

    The reference hardcodes the 4 s @ 16 kHz numbers via asserts
    (``inference.py:34-35``); here every quantity follows from
    ``chunk_duration_f`` and the model's frame step.
    """

    def __init__(
        self,
        batch_size: int,
        chunk_duration_f: int,
        cnn_settings: ConvolutionSettings,
    ) -> None:
        self.cnn_settings = cnn_settings
        self.chunk_duration_f = chunk_duration_f
        self.batch_size = batch_size

        self.n_windows = cnn_settings.n_windows(chunk_duration_f, strict=True)
        self.missing_n_frames = (
            chunk_duration_f - self.n_windows * cnn_settings.rf_step
        )
        # stride between consecutive chunk starts
        self.chunk_stride = chunk_duration_f - self.missing_n_frames

    def chunk_start_i(self, i: int) -> int:
        return i * self.chunk_stride

    def chunk_end_i(self, i: int) -> int:
        return self.chunk_start_i(i) + self.chunk_duration_f

    def chunk_end_i_coverage(self, i: int) -> int:
        return (i + 1) * self.chunk_stride

    def batch_start_i(self, i: int) -> int:
        return i * self.batch_size * self.chunk_stride

    def batch_end_i(self, i: int) -> int:
        return self.batch_start_i(i) + self.batch_size * self.chunk_duration_f

    def batch_end_i_coverage(self, i: int) -> int:
        return self.batch_end_i(i) - self.batch_size * self.missing_n_frames

    def get_n_fitting_chunks(self, n_frames: int) -> int:
        """Complete overlapped chunks that fit in ``n_frames`` samples."""
        if n_frames < self.chunk_duration_f:
            return 0
        return floor((n_frames - self.chunk_duration_f) / self.chunk_stride) + 1

    def total_frames(
        self,
        n_frames: int,
        strict_tail: bool = False,
        reference_tail: bool = False,
    ) -> int:
        """Total output frames for a file: full chunks plus the >=400-sample
        tail (reference ``apply_model_on_audio`` frame accounting).

        ``reference_tail=True`` reproduces the reference's Whisper tail pass
        bit-for-bit: the padded tail emits a FULL chunk's worth of frames
        (the reference forwards the remaining audio, the feature extractor
        zero-pads, and the model truncates to the chunk's ``n_windows`` —
        reference ``inference.py:191-207`` + ``surgical_hydra.py:103-106``),
        so end-of-file frames are computed from padding. Default: only
        frames whose receptive field is backed by real audio.
        """
        n_fit = self.get_n_fitting_chunks(n_frames)
        tail_start = self.chunk_start_i(n_fit)
        tail_len = n_frames - tail_start
        tail_frames = 0
        if tail_len >= TAIL_MIN_SAMPLES:
            if reference_tail:
                tail_frames = self.n_windows
            else:
                # n_windows clamps to >= 0 at the source (geometry.py)
                tail_frames = self.cnn_settings.n_windows(
                    tail_len, strict=strict_tail
                )
        return n_fit * self.n_windows + tail_frames


def _bucket(n: int, minimum: int = 1) -> int:
    """Round up to the next power of two (bounds jit recompiles)."""
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


@dataclass
class InferencePipeline:
    """Device-resident batched inference for one model + parameter set.

    With a ``mesh``, the chunk axis (the embarrassingly-parallel window
    dimension of long-file inference, SURVEY.md §5.7) is sharded over the
    ``data`` mesh axis and parameters follow the tensor-parallel rules —
    one jitted program scales the same file across all chips.
    """

    model: SegmentationModel
    params: Any
    # 64 is the measured v5e operating point: device MFU peaks there
    # (hubert 40.2% vs 39.0% @128, whisper_fast 25.5% vs 22.2%) and
    # end-to-end whisper-base int16 measured 1171x RT @64 vs 1079x
    # @128 vs 1154x @32 (same n-chunks/window class; BENCH_REPORT.md
    # r5 operating-point row). Single-chunk latency is unaffected
    # (the inner batch clamps to min(batch_size, total)).
    batch_size: int = 64
    mesh: Any = None  # jax.sharding.Mesh | None
    # long files dispatch in segments of at most this many chunks instead of
    # padding to the next power of two (a 600-chunk file would otherwise pad
    # to 1024 — ~70% wasted host->HBM transfer, the measured bottleneck)
    max_bucket_chunks: int = 512
    # "auto": ship buffers as-is (their dtype selects the device-side
    # expansion: f32 / int16 / int8 mu-law). "adpcm": re-encode every padded
    # buffer to 4-bit block ADPCM (0.547 B/sample — 1.83x fewer bytes than
    # mu-law; see segma_tpu/ops/adpcm.py) right before the device hop.
    transport: str = "auto"

    def __post_init__(self) -> None:
        cfg = self.model.config
        # meshless pipeline (--mesh off / single device) over a module that
        # baked in seq-parallel constraints at build time: strip them so the
        # jitted program stays single-device (the constraints are pure data
        # movement — numerics are identical either way)
        module_mesh = getattr(self.model.module, "mesh", None)
        if self.mesh is None and module_mesh is not None:
            self.model = self.model.with_module(
                self.model.module.clone(mesh=None)
            )
        step = int(self.model.conv_settings.rf_step)
        # the model's output grid: one frame per rf_step samples
        # (reference builds ConvolutionSettings((320,),(320,),(0,)),
        #  inference.py:315-319)
        self.frame_settings = ConvolutionSettings((step,), (step,), (0,))
        self.chunkyfier = Chunkyfier(
            self.batch_size, cfg.audio.chunk_duration_f, self.frame_settings
        )
        self.n_windows_chunk = self.model.n_windows
        if self.n_windows_chunk != self.chunkyfier.n_windows:
            raise ValueError(
                f"model produces {self.n_windows_chunk} frames per "
                f"{cfg.audio.chunk_duration_s}s chunk but the frame grid "
                f"expects {self.chunkyfier.n_windows}; check "
                "audio.strict_frames for this model family"
            )
        if self.mesh is not None:
            from segma_tpu.parallel.sharding import shard_params

            self.params = shard_params(self.params, self.mesh)

        self._infer_jit = self._build_infer()
        self._threshold_jit = jax.jit(
            lambda logits, thr: jax.nn.sigmoid(logits) > thr[None, :]
        )

        def _decode(logits, thr):
            """thresholding + run-boundary detection, all on device."""
            mask = jax.nn.sigmoid(logits) > thr[None, :]
            zero = jnp.zeros((1, mask.shape[1]), bool)
            prev = jnp.concatenate([zero, mask[:-1]])
            nxt = jnp.concatenate([mask[1:], zero])
            starts = mask & ~prev
            ends = mask & ~nxt
            return mask, starts, ends

        self._decode_jit = jax.jit(_decode)

        @partial(jax.jit, static_argnums=(3,))
        def _decode_packed(logits, thr, valid, cap: int):
            """Fused threshold + boundary detection + PACKED run emission.

            Instead of shipping two (T, L) boolean masks to the host (the
            round-1 path: ~2·T·L bytes over the slow host link, then a host
            scan), this emits per-label packed run indices — the host copies
            only ``2·L·cap`` int32s (cap ~ hundreds) and formats intervals
            directly. ``logits`` may be the full bucketed device grid with
            ``valid`` (traced) real rows — padding rows are forced inactive,
            so per-file lengths reuse the same compiled program. Returns
            (counts (L,), run start frames (L, cap), run end frames (L, cap)
            inclusive), -1 padded.
            """
            t_idx = jnp.arange(logits.shape[0])[:, None]
            logits = jnp.where(t_idx < valid, logits, -1e9)
            _, starts, ends = _decode(logits, thr)

            def pack(col):
                return jnp.nonzero(col, size=cap, fill_value=-1)[0]

            counts = starts.sum(axis=0, dtype=jnp.int32)
            s_idx = jax.vmap(pack, in_axes=1)(starts)
            e_idx = jax.vmap(pack, in_axes=1)(ends)
            # single (L, 2*cap+1) output -> ONE host download (each separate
            # fetch through the relay pays ~80 ms dispatch latency)
            return jnp.concatenate(
                [counts[:, None], s_idx, e_idx], axis=1
            ).astype(jnp.int32)

        self._decode_packed_jit = _decode_packed

    # -- jitted core -----------------------------------------------------------
    def _build_infer(self) -> Callable:
        ck = self.chunkyfier
        stride, chunk_f = ck.chunk_stride, ck.chunk_duration_f
        overlap = chunk_f - stride
        apply = self.model.apply
        batch_size = self.batch_size
        mesh = self.mesh

        @partial(jax.jit, static_argnums=(2,))
        def infer(params, audio: jax.Array, n_chunks: int) -> jax.Array:
            """audio: (F, n_chunks*stride + chunk_f) -> (F, n_chunks*n_w, L).

            The leading F axis packs independent files (multi-file batching:
            one dispatch amortizes the per-call relay latency over F files).
            ``audio`` may be int16 PCM (normalized here, on device, so the
            host->HBM copy ships half the bytes) or int8 mu-law (expanded
            here: quarter the bytes — see ``mulaw_compress``)."""
            f = audio.shape[0]
            if audio.dtype == jnp.uint8:
                # 4-bit block ADPCM (ops/adpcm.py): parallel cumsum decode
                from segma_tpu.ops.adpcm import adpcm_decode

                audio = adpcm_decode(audio, n_chunks * stride + chunk_f)
            elif audio.dtype == jnp.int8:
                # ITU-T G.711 mu-law expansion (mu = 255)
                y = audio.astype(jnp.float32) * (1.0 / 127.0)
                audio = jnp.sign(y) * (1.0 / 255.0) * (256.0 ** jnp.abs(y) - 1.0)
            elif audio.dtype == jnp.int16:
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            # overlap-unfold via two aligned reshapes (no gather): chunk i =
            # audio[i*stride : (i+1)*stride] ++ the next `overlap` samples.
            body = audio[:, : n_chunks * stride].reshape(f, n_chunks, stride)
            nxt = audio[:, stride : (n_chunks + 1) * stride].reshape(
                f, n_chunks, stride
            )[:, :, :overlap]
            chunks = jnp.concatenate([body, nxt], axis=2).reshape(
                f * n_chunks, chunk_f
            )

            transform = self.model.inference_transform
            total = f * n_chunks
            if mesh is not None:
                # shard the window axis across chips; XLA splits the whole
                # forward (and TP-sharded params add head/ffn parallelism).
                # When the mesh carries a seq>1 axis, the model's internal
                # time-axis constraints own it (latency mode: fewer windows,
                # each split over seq); windows always ride `data`.
                from jax.sharding import NamedSharding, PartitionSpec as P

                chunks = jax.lax.with_sharding_constraint(
                    chunks, NamedSharding(mesh, P("data", None))
                )
                logits = transform(apply(params, chunks, train=False))
                n_w = logits.shape[1]
                return logits.reshape(f, n_chunks * n_w, -1)

            bs = min(batch_size, total)
            n_batches = total // bs
            batched = chunks[: n_batches * bs].reshape(n_batches, bs, chunk_f)
            logits = jax.lax.map(
                lambda c: transform(apply(params, c, train=False)), batched
            )
            logits = logits.reshape(-1, *logits.shape[2:])
            rem = total - n_batches * bs
            if rem:
                last = transform(apply(params, chunks[-rem:], train=False))
                logits = jnp.concatenate([logits, last])
            n_w = logits.shape[1]
            return logits.reshape(f, n_chunks * n_w, -1)

        return infer

    def _ship(self, padded: np.ndarray) -> jnp.ndarray:
        """Host buffer -> device array, applying the transport codec.

        uint8 buffers are already ADPCM bytes (pre-encoded ``AdpcmAudio``
        input) and pass through; ``transport='adpcm'`` encodes everything
        else at the dispatch site (convenient for in-memory waveforms, but
        pays a per-dispatch host encode — prefer ``adpcm_encode_audio``
        once per file on the prefetch thread).
        """
        if self.transport == "adpcm" and padded.dtype != np.uint8:
            from segma_tpu.ops.adpcm import adpcm_encode

            # adpcm_encode interprets int16 as PCM and float as [-1, 1]
            # waveform; anything else (e.g. an int8 mu-law buffer) would be
            # silently clipped to +/-1 LSB and destroyed — reject it.
            if padded.dtype not in (np.int16, np.float32, np.float64):
                raise TypeError(
                    "transport='adpcm' accepts float32/float64 waveforms in "
                    "[-1, 1], int16 PCM, or pre-encoded AdpcmAudio/uint8 "
                    f"blocks — got dtype {padded.dtype} (mu-law int8 must go "
                    "through transport='mulaw')"
                )
            return jnp.asarray(adpcm_encode(padded))
        return jnp.asarray(padded)

    def logits_for_audio_async(
        self, audio: np.ndarray | AdpcmAudio
    ) -> tuple[jax.Array | None, int]:
        """Dispatch full-file inference without blocking.

        ``audio``: mono (n,) float32 in [-1, 1], raw int16 PCM (normalized
        on device — halves the host->HBM transfer), int8 mu-law, or a
        pre-encoded ``AdpcmAudio`` (0.547 B/sample; padded here with zero
        BLOCKS, so no per-dispatch host encode).

        Returns (device logits of shape (grid_frames, L) or None, total_frames):
        slice the first ``total_frames`` rows after blocking.
        """
        ck = self.chunkyfier
        n = audio.n_samples if isinstance(audio, AdpcmAudio) else int(audio.shape[0])
        audio_cfg = self.model.config.audio
        total_frames = ck.total_frames(
            n,
            strict_tail=audio_cfg.strict_frames,
            reference_tail=audio_cfg.reference_tail,
        )
        if total_frames == 0:
            return None, 0
        # chunks needed so the padded grid covers every counted frame
        n_chunks_needed = -(-total_frames // ck.n_windows)
        min_chunks = self.mesh.shape["data"] if self.mesh is not None else 1

        if n_chunks_needed <= self.max_bucket_chunks:
            n_chunks = _bucket(n_chunks_needed, minimum=min_chunks)
            padded_len = n_chunks * ck.chunk_stride + ck.chunk_duration_f
            if isinstance(audio, AdpcmAudio):
                padded = audio.block_slice(0, n_blocks(padded_len))[None]
            else:
                padded = np.zeros((1, padded_len), audio.dtype)
                padded[0, :n] = audio
            logits = self._infer_jit(self.params, self._ship(padded), n_chunks)[0]
            return logits, total_frames

        # long file: dispatch max_bucket_chunks-sized segments (chunks are
        # independent windows, so splitting at chunk boundaries is exact),
        # then concatenate the per-segment grids on device. Caps transfer
        # waste at one partially-filled final bucket instead of up to 2x.
        seg_logits: list[jax.Array] = []
        start_chunk = 0
        while start_chunk < n_chunks_needed:
            seg_chunks = min(self.max_bucket_chunks, n_chunks_needed - start_chunk)
            n_chunks = _bucket(seg_chunks, minimum=min_chunks)
            padded_len = n_chunks * ck.chunk_stride + ck.chunk_duration_f
            off = start_chunk * ck.chunk_stride
            if isinstance(audio, AdpcmAudio):
                # exact: blocks are independent and every current model's
                # chunk stride is a multiple of BLOCK (rf_step 320 = 5*64)
                seg = audio.block_slice(off, n_blocks(padded_len))[None]
            else:
                seg = np.zeros((1, padded_len), audio.dtype)
                take = min(padded_len, max(0, n - off))
                if take > 0:
                    seg[0, :take] = audio[off : off + take]
            out = self._infer_jit(self.params, self._ship(seg), n_chunks)[0]
            seg_logits.append(out[: seg_chunks * ck.n_windows])
            start_chunk += seg_chunks
        logits = jnp.concatenate(seg_logits, axis=0)
        # re-bucket the row count on device (zero-cost transfer) so the
        # decode program compiles once per bucket, not once per file length
        rows = logits.shape[0]
        target = _bucket(rows)
        if target > rows:
            logits = jnp.pad(logits, ((0, target - rows), (0, 0)))
        return logits, total_frames

    def logits_for_audios_async(
        self, audios: list[np.ndarray], pack_files: int = 8
    ) -> list[tuple[jax.Array | None, int]]:
        """Multi-file packed dispatch: one jitted call per group of files
        sharing a chunk bucket (up to ``pack_files`` per call).

        For many short files this amortizes the fixed per-dispatch latency
        (~80 ms through this environment's relay) across the group and
        fills device batches that single short files leave mostly padding.
        Returns per-file (device logits grid (T, L) or None, total_frames)
        in input order — same contract as ``logits_for_audio_async``.
        """
        ck = self.chunkyfier
        audio_cfg = self.model.config.audio
        min_chunks = self.mesh.shape["data"] if self.mesh is not None else 1

        plan: list[tuple[int, int, int]] = []  # (input idx, n_chunks, total)
        results: list[tuple[jax.Array | None, int]] = [(None, 0)] * len(audios)
        for i, audio in enumerate(audios):
            n = (
                audio.n_samples
                if isinstance(audio, AdpcmAudio)
                else int(audio.shape[0])
            )
            total_frames = ck.total_frames(
                n,
                strict_tail=audio_cfg.strict_frames,
                reference_tail=audio_cfg.reference_tail,
            )
            if total_frames == 0:
                continue
            needed = -(-total_frames // ck.n_windows)
            if needed > self.max_bucket_chunks:
                # very long file: the single-file path dispatches it in
                # max_bucket_chunks segments instead of padding to the next
                # power of two (same cap the constructor documents)
                results[i] = self.logits_for_audio_async(audios[i])
                continue
            n_chunks = _bucket(needed, minimum=min_chunks)
            plan.append((i, n_chunks, total_frames))

        # group by (bucket, transport dtype) — mixed dtypes must never share
        # a packed buffer (an f32 waveform cast to int16 would be destroyed)
        by_bucket: dict[tuple, list[tuple[int, int]]] = {}
        for i, n_chunks, total_frames in plan:
            tag = (
                "adpcm"
                if isinstance(audios[i], AdpcmAudio)
                else np.dtype(audios[i].dtype).str
            )
            by_bucket.setdefault((n_chunks, tag), []).append((i, total_frames))

        for (n_chunks, dtype_str), items in by_bucket.items():
            padded_len = n_chunks * ck.chunk_stride + ck.chunk_duration_f
            for g in range(0, len(items), max(1, pack_files)):
                group = items[g : g + max(1, pack_files)]
                if dtype_str == "adpcm":
                    packed = np.stack(
                        [
                            audios[i].block_slice(0, n_blocks(padded_len))
                            for i, _tf in group
                        ]
                    )
                else:
                    packed = np.zeros(
                        (len(group), padded_len), np.dtype(dtype_str)
                    )
                    for row, (i, _tf) in enumerate(group):
                        a = audios[i]
                        packed[row, : a.shape[0]] = a
                logits = self._infer_jit(
                    self.params, self._ship(packed), n_chunks
                )
                for row, (i, tf) in enumerate(group):
                    results[i] = (logits[row], tf)
        return results

    def logits_for_audio(self, audio: np.ndarray) -> np.ndarray:
        """Full-file frame logits (total_frames, n_labels) float32."""
        logits, total_frames = self.logits_for_audio_async(audio)
        if logits is None:
            return np.zeros((0, self.model.n_labels), np.float32)
        # consecutive chunks tile the frame grid exactly (stride = n_w * step),
        # so the flattened logits already live on the global 20 ms grid; the
        # first `total_frames` rows are the frames backed by real audio.
        return np.asarray(logits[:total_frames])

    # -- thresholding + decode ---------------------------------------------------
    def _threshold_vector(self, thresholds: dict[str, dict[str, float]]) -> jnp.ndarray:
        return jnp.asarray(
            threshold_vector(self.model.label_encoder.base_labels, thresholds),
            jnp.float32,
        )

    def apply_thresholds(
        self, logits: np.ndarray, thresholds: dict[str, dict[str, float]]
    ) -> np.ndarray:
        """sigmoid(logits) > per-label lower_bound (reference
        ``apply_thresholds``, ``inference.py:214-234``)."""
        assert logits.shape[-1] == len(thresholds)
        thr = self._threshold_vector(thresholds)
        if logits.shape[0] == 0:
            return np.zeros(logits.shape, bool)
        return np.asarray(self._threshold_jit(jnp.asarray(logits), thr))

    def decode_boundaries(
        self, logits: np.ndarray | jax.Array, thresholds: dict[str, dict[str, float]]
    ) -> tuple[np.ndarray, np.ndarray]:
        """On-device thresholding + run-boundary detection.

        Returns (starts, ends): (T, L) bool masks marking the first and last
        frame of each active run — the host only converts the (tiny) masks
        into interval lists.
        """
        thr = self._threshold_vector(thresholds)
        if logits.shape[0] == 0:
            z = np.zeros(logits.shape, bool)
            return z, z
        _, starts, ends = self._decode_jit(jnp.asarray(logits), thr)
        return np.asarray(starts), np.asarray(ends)

    def decode_intervals(
        self,
        logits: np.ndarray | jax.Array,
        thresholds: dict[str, dict[str, float]],
        valid_frames: int | None = None,
    ) -> list[tuple[int, int, str]]:
        """Fully device-side run-length decode -> sample intervals.

        The jitted program fuses sigmoid + thresholds + boundary detection +
        packed run-index emission, so the host copies O(runs) int32s instead
        of O(T·L) mask bytes and never scans frames (VERDICT round-1 item 9).
        Pass the full bucketed device grid plus ``valid_frames`` to reuse one
        compiled program across file lengths. Bit-identical to the mask path
        (tested); falls back to it in the (pathological) case of more runs
        than the static capacity.
        """
        enc = self.model.label_encoder
        t = int(logits.shape[0])
        valid = t if valid_frames is None else int(valid_frames)
        if t == 0 or valid == 0:
            return []
        thr = self._threshold_vector(thresholds)
        # capacity: one run per 32 frames (640 ms) covers dense dialog with
        # plenty of margin while keeping the download ~8x smaller than the
        # old boolean masks; the worst case (alternating frames, T//2 + 1
        # runs) falls back to the mask path below. Bucketed to limit
        # distinct compilations.
        cap = decode_capacity(t)
        packed = np.asarray(
            self._decode_packed_jit(jnp.asarray(logits), thr, valid, cap)
        )
        intervals = unpack_run_intervals(
            packed, cap, enc.base_labels, self.frame_settings
        )
        if intervals is None:  # capacity overflow: exact mask fallback
            mask_logits = np.asarray(logits)[:valid]
            starts, ends = self.decode_boundaries(mask_logits, thresholds)
            return intervals_from_boundaries(
                starts, ends, self.frame_settings, enc
            )
        return intervals


def decode_capacity(rows: int) -> int:
    """Packed-run capacity for a ``rows``-frame grid: one run per 32 frames
    (640 ms) covers dense dialog with margin, bucketed to limit distinct
    compilations; the worst case (alternating frames) overflows and callers
    fall back to the exact mask path. Shared by the live pipeline and the
    export artifact writer so both sides always agree."""
    return min(_bucket(max(rows // 32, 16)), rows // 2 + 1)


def unpack_run_intervals(
    packed: np.ndarray,
    cap: int,
    labels: list[str] | tuple[str, ...],
    frame_settings: ConvolutionSettings,
) -> list[tuple[int, int, str]] | None:
    """(n_labels, 1+2*cap) packed device runs -> sample intervals.

    Row layout: [count, starts[cap], ends[cap]] per label (frame indices);
    returns None when any label overflowed ``cap`` (caller falls back to the
    exact mask decode). Shared by ``InferencePipeline.decode_intervals`` and
    ``ExportedPipeline.decode_intervals`` — one implementation of the
    run->rf-interval math, so live and exported numerics cannot diverge.
    """
    counts, s_idx, e_idx = packed[:, 0], packed[:, 1 : cap + 1], packed[:, cap + 1 :]
    if int(counts.max(initial=0)) > cap:
        return None
    intervals: list[tuple[int, int, str]] = []
    for li, label in enumerate(labels):
        k = int(counts[li])
        for s, e in zip(s_idx[li, :k], e_idx[li, :k]):
            intervals.append((*frame_settings.run_interval(s, e), label))
    return intervals


def load_thresholds(thresholds: dict | str | Path | None) -> dict | None:
    """Resolve a thresholds argument: dict passes through; a str/Path loads
    the tuner's YAML (with an existence check); None stays None. One home
    for this validation across the live and artifact CLIs."""
    if thresholds is None or isinstance(thresholds, dict):
        return thresholds
    thr_path = Path(thresholds)
    if not thr_path.exists():
        raise ValueError("Path to a valid threshold dict does not exist.")
    with thr_path.open("r") as f:
        return yaml.safe_load(f)


def default_thresholds(labels: tuple[str, ...]) -> dict[str, dict[str, float]]:
    return {label: {"lower_bound": 0.5, "upper_bound": 1.0} for label in labels}


def threshold_vector(
    labels: tuple[str, ...] | list[str], thresholds: dict[str, dict[str, float]]
) -> np.ndarray:
    """Per-label lower bounds in LABEL-ENCODER order.

    Resolves by label NAME whenever the keys match the encoder's label set, so
    a hand-edited YAML with reordered keys cannot silently swap per-label
    thresholds (the reference trusts insertion order, ``inference.py:229-233``
    — a footgun we fix). Falls back to insertion order only for legacy files
    whose keys do not match the label set.
    """
    if set(thresholds) == set(labels):
        values = [thresholds[label]["lower_bound"] for label in labels]
    else:
        values = [t["lower_bound"] for t in thresholds.values()]
    return np.asarray(values, np.float32)


def mulaw_compress(audio: np.ndarray) -> np.ndarray:
    """mu-law (G.711, mu=255) companding to int8 for the host->HBM hop.

    Opt-in transport codec: 8 bits/sample instead of 16, expanded back on
    device inside the jitted pipeline. Speech-transparent (~38 dB SNR) but
    lossy — use for throughput-critical serving, not for parity runs.

    Accepts float32 in [-1, 1] or int16 PCM.
    """
    if audio.dtype == np.int16:
        x = audio.astype(np.float32) / 32768.0
    else:
        x = np.clip(audio.astype(np.float32), -1.0, 1.0)
    mu = 255.0
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.round(y * 127.0).astype(np.int8)


def intervals_from_boundaries(
    starts: np.ndarray,
    ends: np.ndarray,
    conv_settings: ConvolutionSettings,
    label_encoder: MultiLabelEncoder,
) -> list[tuple[int, int, str]]:
    """Device-computed run boundaries -> sample intervals.

    ``starts``/``ends`` are (T, L) bool masks marking the first/last frame
    of each run (from ``InferencePipeline.decode_boundaries``). Decode
    parity: start = max(0, rf_start(first)), end = rf_end(last) + 1.
    """
    intervals: list[tuple[int, int, str]] = []
    for label_i, label in enumerate(label_encoder.base_labels):
        run_starts = np.where(starts[:, label_i])[0]
        run_ends = np.where(ends[:, label_i])[0]  # inclusive last frame
        for s, e in zip(run_starts, run_ends):
            intervals.append((*conv_settings.run_interval(s, e), label))
    return intervals


def create_intervals(
    thresholded: np.ndarray,
    conv_settings: ConvolutionSettings,
    label_encoder: MultiLabelEncoder,
) -> list[tuple[int, int, str]]:
    """Frame mask (T, L) -> sample intervals [(start_f, end_f, label), ...].

    Runs are found with a vectorized diff (replacing
    ``np.ma.notmasked_contiguous``, reference ``inference.py:237-263``);
    decode parity: start = max(0, rf_start(first)), end = rf_end(last) + 1.
    """
    intervals: list[tuple[int, int, str]] = []
    t = thresholded.astype(np.int8)
    padded = np.concatenate(
        [np.zeros((1, t.shape[1]), np.int8), t, np.zeros((1, t.shape[1]), np.int8)]
    )
    diff = np.diff(padded, axis=0)
    for label_i, label in enumerate(label_encoder.base_labels):
        starts = np.where(diff[:, label_i] == 1)[0]
        ends = np.where(diff[:, label_i] == -1)[0]  # exclusive frame index
        for s, e in zip(starts, ends):  # e is exclusive -> last frame e-1
            intervals.append((*conv_settings.run_interval(s, e - 1), label))
    return intervals


def postprocess_intervals(
    intervals: list[tuple[int, int, str]],
    min_duration_f: int = 0,
    merge_gap_f: int = 0,
) -> list[tuple[int, int, str]]:
    """Optional production post-processing (segma_tpu extension; the
    reference emits raw thresholded runs only):

    1. merge same-label intervals separated by < ``merge_gap_f`` samples;
    2. drop intervals shorter than ``min_duration_f`` samples.
    """
    if merge_gap_f > 0:
        from collections import defaultdict

        by_label: dict[str, list[tuple[int, int]]] = defaultdict(list)
        for s, e, label in sorted(intervals):
            runs = by_label[label]
            if runs and s - runs[-1][1] < merge_gap_f:
                runs[-1] = (runs[-1][0], max(runs[-1][1], e))
            else:
                runs.append((s, e))
        intervals = sorted(
            (s, e, label) for label, runs in by_label.items() for s, e in runs
        )
    if min_duration_f > 0:
        intervals = [
            (s, e, label) for s, e, label in intervals if e - s >= min_duration_f
        ]
    return intervals


def write_intervals(
    intervals: list[tuple[int, int, str]],
    audio_path: Path,
    output_p: Path,
    rttm_dirname: str = "raw_rttm",
) -> Path:
    """Write intervals as RTTM under ``output_p / rttm_dirname`` (reference
    emits ``raw_rttm``, ``inference.py:266-283``; override for tools that
    expect ``rttm``)."""
    rttm_out = output_p / rttm_dirname
    rttm_out.mkdir(exist_ok=True, parents=True)
    uri = audio_path.stem
    out = rttm_out / f"{uri}.rttm"
    with out.open("w") as rttm_f:
        for start_f, end_f, label in intervals:
            aa = AudioAnnotation(
                uid=uri,
                start_time_s=float(frames_to_seconds(start_f)),
                duration_s=float(frames_to_seconds(end_f - start_f)),
                label=str(label),
            )
            rttm_f.write(aa.to_rttm() + "\n")
    return out


def save_logits(
    logits: np.ndarray,
    label_encoder: LabelEncoder,
    output_p: Path,
    uri: str,
) -> Path:
    """Dump per-label logits for threshold tuning. Format: ``.npz`` keyed by
    label (replaces the reference's torch ``.pt`` dict,
    ``inference.py:331-342``; the tuner reads both).

    ``label_encoder``: a :class:`MultiLabelEncoder` or a plain label list
    (the artifact path has no encoder object, only manifest labels)."""
    if isinstance(label_encoder, (list, tuple)):
        labels = list(label_encoder)
    else:
        labels = [
            label_encoder.inv_transform(i)
            for i in range(label_encoder.n_labels)
        ]
    logits_out = output_p / "logits"
    logits_out.mkdir(parents=True, exist_ok=True)
    out = logits_out / f"{uri}-logits_dict_t.npz"
    np.savez(out, **{label: logits[:, i] for i, label in enumerate(labels)})
    return out


def _load_mono(
    audio_path: Path, transport: str = "int16", expect_sr: int | None = None
) -> np.ndarray:
    """Decode one file for the device hop.

    transport: 'int16' (default; half the bytes of f32, exact),
    'mulaw' (quarter the bytes; ~38 dB SNR companding noise — throughput
    mode: borderline/single-frame detections can flip, so keep int16 for
    parity-critical runs), 'adpcm' (~7x fewer bytes than f32, encoded HERE
    — on the prefetch thread — so dispatch pads bytes only), 'f32' (full
    precision).

    ``expect_sr`` rejects files whose header rate differs from the model's
    — every downstream number (frame grid, interval seconds) assumes the
    configured rate, so a 44.1 kHz file would yield silently wrong-
    timescale intervals, not an error. (The dataset layer validates this
    at load time; this covers the predict/serve paths.)
    """
    if expect_sr is not None:
        from segma_tpu.utils.io import get_audio_info

        sr = get_audio_info(audio_path).sample_rate
        if sr != expect_sr:
            raise ValueError(
                f"{audio_path}: sample rate {sr} != the model's {expect_sr}"
                " (resample the audio first)"
            )
    raw = read_pcm16_mono(audio_path)
    if raw is not None:
        if transport == "mulaw":
            return mulaw_compress(raw)
        if transport == "adpcm":
            return adpcm_encode_audio(raw)
        if transport == "f32":
            return raw.astype(np.float32) / 32768.0
        return raw
    audio = get_all_samples(audio_path)
    if audio.shape[0] > 1:
        audio = audio.mean(axis=0, keepdims=True)
    mono = audio[0]
    if transport == "mulaw":
        return mulaw_compress(mono)
    if transport == "adpcm":
        return adpcm_encode_audio(mono)
    return mono


def infer_file(
    audio_path: Path,
    pipeline: InferencePipeline,
    output_p: Path,
    thresholds: dict | None = None,
    dump_logits: bool = False,
    rttm_dirname: str = "raw_rttm",
    audio: np.ndarray | None = None,
    min_duration_s: float = 0.0,
    merge_gap_s: float = 0.0,
) -> list[tuple[int, int, str]]:
    """Run the full per-file pipeline: decode WAV -> device logits ->
    thresholds -> intervals -> RTTM (reference ``infer_file``,
    ``inference.py:286-357``)."""
    enc = pipeline.model.label_encoder
    if thresholds is None:
        thresholds = default_thresholds(enc.base_labels)

    if audio is None:
        audio = _load_mono(
            audio_path,
            expect_sr=pipeline.model.config.audio.sample_rate,
        )
    logits_dev, total_frames = pipeline.logits_for_audio_async(audio)
    if logits_dev is None:
        logits_dev = np.zeros((0, pipeline.model.n_labels), np.float32)

    if dump_logits:
        save_logits(
            np.asarray(logits_dev[:total_frames]), enc, output_p, audio_path.stem
        )

    intervals = pipeline.decode_intervals(
        logits_dev, thresholds, valid_frames=total_frames
    )
    sr = pipeline.model.config.audio.sample_rate
    intervals = postprocess_intervals(
        intervals,
        min_duration_f=int(min_duration_s * sr),
        merge_gap_f=int(merge_gap_s * sr),
    )
    write_intervals(intervals, audio_path, output_p, rttm_dirname)
    return intervals


def get_list_of_files_to_process(
    wavs: Path, recursive: bool = False, uris: Path | None = None
) -> tuple[list[Path], int]:
    """Resolve the audio file list from a uri list or a glob (reference
    ``inference.py:360-395``)."""
    wavs = Path(wavs)
    if not wavs.exists():
        raise FileNotFoundError(f"Path `{wavs=}` does not exists")
    if uris:
        with Path(uris).open("r") as uri_f:
            files = [
                (wavs / uri.strip()).with_suffix(".wav")
                for uri in uri_f.readlines()
                if uri.strip()
            ]
    else:
        files = list(wavs.rglob("*.wav") if recursive else wavs.glob("*.wav"))
    return sorted(files), len(files)


def run_inference_on_audios(
    config: Path | str | Config,
    wavs: Path | str,
    checkpoint: Path | str | None,
    output: Path | str,
    uris: Path | str | None = None,
    thresholds: dict | str | Path | None = None,
    batch_size: int = 64,
    recursive: bool = False,
    dump_logits: bool = False,
    rttm_dirname: str = "raw_rttm",
    model: SegmentationModel | None = None,
    min_duration_s: float = 0.0,
    merge_gap_s: float = 0.0,
    transport: str = "int16",
    mesh: Any = "auto",
    pack_files: int = 1,
) -> list[Path]:
    """Batch entry point: load config + checkpoint, then per-file inference
    (reference ``run_inference_on_audios``, ``inference.py:398-459``).

    ``mesh``: "auto" (default) builds the (data, model) device mesh whenever
    more than one device is visible — the window axis of every file shards
    over ``data`` and TP rules apply to the params (SURVEY.md §7 step 8:
    sharded batch inference). Pass None/"off" to force single-device, or an
    existing ``jax.sharding.Mesh``.

    ``pack_files``: >1 packs that many files into each device dispatch
    (``logits_for_audios_async``) — amortizes per-call latency for many
    short files. 1 (default) dispatches per file.
    """
    from segma_tpu.checkpoint import load_model_for_inference

    output = Path(output)
    thresholds = load_thresholds(thresholds)

    files_to_infer_on, n_files = get_list_of_files_to_process(
        Path(wavs), recursive, uris
    )
    if model is None:
        cfg = config if isinstance(config, Config) else load_config(config)
        if "hydra" not in cfg.model.name and "vad" not in cfg.model.name:
            raise ValueError("only MultiLabelEncoder is supported")
        model = load_model_for_inference(cfg, checkpoint)

    if mesh == "auto":
        from segma_tpu.parallel.mesh import make_mesh

        cfg = model.config
        mesh = make_mesh(cfg) if len(jax.devices()) > 1 else None
    elif mesh == "off":
        mesh = None

    pipeline = InferencePipeline(
        model,
        model.params,
        batch_size=batch_size,
        mesh=mesh,
        transport="adpcm" if transport == "adpcm" else "auto",
    )

    # two-level pipelining: a thread reads file i+2 from disk while file
    # i+1's host->device transfer and forward are in flight and file i's
    # results are being finalized on host
    import queue
    import threading
    from collections import deque

    q: queue.Queue = queue.Queue(maxsize=2)
    stop = object()
    decode_error = object()
    failed: list[tuple[Path, Exception]] = []

    def producer():
        try:
            for audio_path in files_to_infer_on:
                try:
                    item = (
                        audio_path,
                        _load_mono(
                            audio_path,
                            transport,
                            expect_sr=model.config.audio.sample_rate,
                        ),
                    )
                except Exception as e:  # noqa: BLE001 — one bad file must
                    # not silently abandon the rest of the batch
                    item = (audio_path, decode_error, e)
                q.put(item)
        finally:
            q.put(stop)

    threading.Thread(target=producer, daemon=True).start()

    enc = model.label_encoder
    thr = thresholds or default_thresholds(enc.base_labels)
    pending: deque = deque()
    i = 0

    def finalize(item) -> None:
        nonlocal i
        i += 1
        audio_path, t0, logits_dev, total_frames = item
        # decode straight from the full bucketed device grid — only the
        # packed run indices cross the host link, and the grid shapes repeat
        # across files so the decode program compiles once per bucket; the
        # full (T, L) logits download happens only for the tuner's dump
        if logits_dev is None:
            logits_dev = np.zeros((0, model.n_labels), np.float32)
        if dump_logits:
            save_logits(
                np.asarray(logits_dev[:total_frames]),
                enc,
                output,
                audio_path.stem,
            )
        intervals = pipeline.decode_intervals(
            logits_dev, thr, valid_frames=total_frames
        )
        sr = model.config.audio.sample_rate
        intervals = postprocess_intervals(
            intervals,
            min_duration_f=int(min_duration_s * sr),
            merge_gap_f=int(merge_gap_s * sr),
        )
        write_intervals(intervals, audio_path, output, rttm_dirname)
        dt = time.perf_counter() - t0
        print(
            f"[log] - ({i:>{len(str(n_files))}}/{n_files}) inference for "
            f"'{audio_path.stem}' in {dt:.2f}s",
            flush=True,
        )

    group: list[tuple[Path, np.ndarray]] = []

    def dispatch_group() -> None:
        """Queue device work for the buffered files; finalize the previous
        in-flight group (keeps one group of transfers+forwards in flight)."""
        if not group:
            return
        t0 = time.perf_counter()
        if len(group) == 1:
            outs = [pipeline.logits_for_audio_async(group[0][1])]
        else:
            outs = pipeline.logits_for_audios_async(
                [a for _, a in group], pack_files=pack_files
            )
        new_items = [
            (path, t0, lg, tf) for (path, _), (lg, tf) in zip(group, outs)
        ]
        group.clear()
        while pending:
            finalize(pending.popleft())
        pending.extend(new_items)

    while True:
        item = q.get()
        if item is stop:
            break
        if len(item) == 3 and item[1] is decode_error:
            audio_path, _, e = item
            failed.append((audio_path, e))
            print(
                f"[log] - SKIPPED '{audio_path}': {type(e).__name__}: {e}",
                flush=True,
            )
            continue
        group.append(item)
        if len(group) >= max(1, pack_files):
            dispatch_group()
    dispatch_group()
    while pending:
        finalize(pending.popleft())
    if failed:
        print(
            f"[log] - WARNING: {len(failed)}/{n_files} files failed to "
            "decode and have no output (listed above)",
            flush=True,
        )
    failed_paths = {p for p, _ in failed}
    return [p for p in files_to_infer_on if p not in failed_paths]


def main(argv: list[str] | None = None) -> None:
    import argparse

    from segma_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(description="segma_tpu batch inference")
    parser.add_argument("--config", default=None)
    parser.add_argument("--uris", help="list of uris to use for prediction")
    parser.add_argument("--wavs", required=True)
    parser.add_argument("--checkpoint", default="models/last/best.ckpt")
    parser.add_argument(
        "--artifact", default=None,
        help="predict from a frozen export directory (scripts/export.py) "
        "instead of config+checkpoint",
    )
    parser.add_argument("--output", required=True)
    parser.add_argument("--thresholds", default=None)
    parser.add_argument("--batch_size", "--batch-size", default=64, type=int)
    parser.add_argument("--save-logits", action="store_true")
    parser.add_argument("--recursive", action="store_true")
    parser.add_argument("--rttm-dirname", default="raw_rttm")
    parser.add_argument(
        "--min-duration", type=float, default=0.0,
        help="drop intervals shorter than this many seconds",
    )
    parser.add_argument(
        "--merge-gap", type=float, default=0.0,
        help="merge same-label intervals separated by less than this many seconds",
    )
    parser.add_argument(
        "--transport", default="int16",
        choices=["int16", "mulaw", "adpcm", "f32"],
        help="host->device sample encoding (mulaw: 4x fewer bytes than f32; "
        "adpcm: ~7x fewer, both lossy)",
    )
    parser.add_argument(
        "--mesh", default="auto", choices=["auto", "off"],
        help="auto: shard the window axis over all visible devices "
        "(mesh layout from config `mesh.data`/`mesh.model`); off: one device",
    )
    parser.add_argument(
        "--pack-files", type=int, default=1,
        help="pack N files per device dispatch (amortizes per-call latency "
        "for many short files)",
    )
    # unknown args flow to the config loader as key.path=value overrides
    # (same convention as the training CLIs)
    args, extra_args = parser.parse_known_args(argv)
    if (args.config is None) == (args.artifact is None):
        parser.error("exactly one of --config or --artifact is required")

    if args.artifact is not None:
        from segma_tpu.export import run_inference_on_artifact

        # frozen artifacts pin their own transport/batch geometry — reject
        # flags that would be silently ignored, and any leftover args (the
        # config path treats them as overrides; here there is no config to
        # override)
        unsupported = [
            flag
            for flag, on in (
                (
                    "--checkpoint",
                    args.checkpoint != parser.get_default("checkpoint"),
                ),
                ("--transport", args.transport != "int16"),
                ("--batch_size", args.batch_size != 64),
                ("--mesh", args.mesh != "auto"),
                ("--pack-files", args.pack_files != 1),
            )
            if on
        ]
        if unsupported:
            parser.error(
                f"{', '.join(unsupported)} not supported with --artifact "
                "(the frozen programs pin transport and batch geometry)"
            )
        if extra_args:
            parser.error(
                f"unrecognized arguments with --artifact: {extra_args}"
            )
        run_inference_on_artifact(
            artifact=args.artifact,
            wavs=args.wavs,
            output=Path(args.output),
            uris=args.uris,
            thresholds=args.thresholds,
            recursive=args.recursive,
            rttm_dirname=args.rttm_dirname,
            min_duration_s=args.min_duration,
            merge_gap_s=args.merge_gap,
            dump_logits=args.save_logits,
        )
        return

    run_inference_on_audios(
        config=load_config(args.config, extra_args),
        uris=args.uris,
        wavs=args.wavs,
        checkpoint=args.checkpoint,
        output=args.output,
        thresholds=args.thresholds,
        batch_size=args.batch_size,
        dump_logits=args.save_logits,
        recursive=args.recursive,
        rttm_dirname=args.rttm_dirname,
        min_duration_s=args.min_duration,
        merge_gap_s=args.merge_gap,
        transport=args.transport,
        mesh=args.mesh,
        pack_files=args.pack_files,
    )


if __name__ == "__main__":
    main()
