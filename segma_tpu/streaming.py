"""Online (streaming) segmentation with bounded latency.

A segma_tpu extension beyond the reference's offline-only pipeline: audio
arrives in arbitrary-sized pushes; whenever a full chunk (stride boundary)
is available it is forwarded through the same jitted model, frames are
thresholded, and intervals are emitted as soon as their runs close. Open
runs stay pending until more audio (or ``flush``) decides them.

Produces byte-identical intervals to the offline pipeline on the same
audio for frame-local models (same chunk geometry, same tail rule, same
decode math) — asserted in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from segma_tpu.inference import (
    TAIL_MIN_SAMPLES,
    Chunkyfier,
    default_thresholds,
    threshold_vector,
)
from segma_tpu.models.base import ConvolutionSettings, SegmentationModel


class StreamFlushedError(RuntimeError):
    """push()/flush() called after flush() completed — the session is over.

    A distinct type so the HTTP layer can map the race to 409 Conflict
    without matching on message text."""


def make_streaming_forward(model: SegmentationModel) -> Callable:
    """One jitted per-chunk forward ``(params, chunk) -> (T, L) logits``,
    shareable across StreamingSegmenter instances."""
    # single-device program: strip a baked-in seq-parallel mesh here (not
    # only in StreamingSegmenter.__init__, which a shared forward bypasses)
    if getattr(model.module, "mesh", None) is not None:
        model = model.with_module(model.module.clone(mesh=None))
    apply = model.apply
    transform = model.inference_transform

    @partial(jax.jit, static_argnums=())
    def forward(params, chunk):
        # int16 chunks normalize ON DEVICE (x * 2^-15 == the host division
        # bit-for-bit): serving pushes arrive as PCM16, so shipping them
        # raw halves the per-chunk host->device bytes
        if chunk.dtype == jnp.int16:
            chunk = chunk.astype(jnp.float32) * (1.0 / 32768.0)
        return transform(apply(params, chunk[None, :], train=False))[0]

    return forward


def _chunk_to_f32(chunk: np.ndarray) -> np.ndarray:
    """Host-side fallback normalization (exported programs are traced on
    f32 inputs; the conversion is bit-identical to the device one)."""
    if chunk.dtype == np.int16:
        return chunk.astype(np.float32) / 32768.0
    return np.asarray(chunk, np.float32)


class ChunkForwardBatcher:
    """Cross-session micro-batcher for streaming chunk forwards.

    N concurrent streaming sessions each dispatch single-chunk forwards;
    through the tunnel every dispatch pays ~80 ms of relay latency, so N
    sessions pay it N times per chunk period. This batcher groups chunks
    from concurrent sessions that arrive within ``window_ms`` into ONE
    padded batched forward (bucketed to powers of two so at most
    log2(max_batch)+1 programs compile), then hands each session its row.

    Signature-compatible with the single-chunk jitted forward — pass an
    instance as ``StreamingSegmenter(forward_fn=...)``. All sessions must
    share the same params (they do in serving: one model, one checkpoint).
    """

    def __init__(
        self,
        model: SegmentationModel,
        window_ms: float = 3.0,
        max_batch: int = 8,
    ) -> None:
        if getattr(model.module, "mesh", None) is not None:
            model = model.with_module(model.module.clone(mesh=None))
        apply = model.apply
        transform = model.inference_transform

        @jax.jit
        def jitted(params, chunks):  # (B, chunk_f) -> (B, T, L)
            if chunks.dtype == jnp.int16:  # device-side normalization
                chunks = chunks.astype(jnp.float32) * (1.0 / 32768.0)
            return transform(apply(params, chunks, train=False))

        def batch_forward(params, chunks, n_real):
            # pad rows ride the same dispatch here (one compiled program
            # per bucket shape); n_real matters only for per-row fallbacks
            return jitted(params, chunks)

        # powers of two up to max_batch: at most log2(max_batch)+1 compiled
        # shapes for the one jitted program
        buckets, b = [], 1
        while b < max(1, max_batch):
            buckets.append(b)
            b *= 2
        buckets.append(max(1, max_batch))
        self._setup(batch_forward, window_ms, buckets)

    @classmethod
    def from_exported(
        cls, exported: Any, window_ms: float = 3.0
    ) -> "ChunkForwardBatcher":
        """Batcher over an artifact's exported stream programs: singleton
        groups run ``stream.jaxexp``, larger groups pad to the next shipped
        ``stream_batch<b>.jaxexp`` bucket (StableHLO programs are frozen
        shapes, so the buckets are baked at export time — powers of two,
        same padding-waste bound as the live jit's buckets)."""
        if not exported.stream_batch_fns:
            raise ValueError(
                "artifact has no batched streaming programs "
                "(stream_batch<b>.jaxexp) — re-export to enable "
                "cross-session batching"
            )
        single_f32 = exported.stream_fn
        single_i16 = exported.stream_i16_fn
        fns = dict(exported.stream_batch_fns)
        # r4+ artifacts trace the batch buckets on int16 (what serving
        # sessions buffer — half the bytes/chunk, no host conversion);
        # r3 all-f32 layouts fall back via the manifest-derived property
        batch_dtype = exported.stream_batch_dtype

        def batch_forward(_params, chunks, n_real):
            chunks = np.asarray(chunks)
            if chunks.dtype != batch_dtype:
                if batch_dtype == np.float32:
                    chunks = _chunk_to_f32(chunks)  # r3 programs take f32
                else:
                    # int16-traced buckets can't take a promoted-f32 group
                    # (mid-stream dtype mix, rare): exact per-row singles —
                    # over the REAL rows only, pad rows would each cost a
                    # full relay dispatch for output nobody reads
                    chunks = _chunk_to_f32(chunks[:n_real])
                    return np.stack(
                        [np.asarray(single_f32.call(c)) for c in chunks]
                    )
            if chunks.shape[0] == 1:
                single = (
                    single_i16
                    if chunks.dtype == np.int16 and single_i16 is not None
                    else single_f32
                )
                if single is single_f32:
                    return np.asarray(
                        single.call(_chunk_to_f32(chunks[0]))
                    )[None]
                return np.asarray(single.call(chunks[0]))[None]
            return np.asarray(fns[int(chunks.shape[0])].call(chunks))

        self = cls.__new__(cls)
        self._setup(batch_forward, window_ms, [1, *fns])
        return self

    def _setup(
        self, batch_forward: Callable, window_ms: float, buckets: list[int]
    ) -> None:
        import queue
        import threading

        self._batch_forward = batch_forward
        self.window_s = window_ms / 1000.0
        self._bucket_sizes = sorted(set(buckets))
        self.max_batch = self._bucket_sizes[-1]
        self.dispatches = 0  # observability / tests
        self._q: queue.Queue = queue.Queue()
        self._threading = threading
        threading.Thread(target=self._run, daemon=True).start()

    def __call__(self, params, chunk) -> np.ndarray:
        done = self._threading.Event()
        box: dict = {}
        self._q.put((params, np.asarray(chunk), done, box))
        done.wait()
        if "err" in box:
            raise box["err"]
        return box["logits"]

    def _bucket(self, n: int) -> int:
        for b in self._bucket_sizes:
            if b >= n:
                return b
        return self.max_batch

    def _run(self) -> None:
        import queue
        import time as _time

        while True:
            group = [self._q.get()]
            deadline = _time.monotonic() + self.window_s
            while len(group) < self.max_batch:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    group.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            self.dispatches += 1
            try:
                params = group[0][0]
                cs = [c for _, c, _, _ in group]
                if len({c.dtype for c in cs}) > 1:
                    # sessions may buffer different dtypes: promote int16
                    # to f32 (bit-exact) — np.stack's own promotion would
                    # mix raw PCM magnitudes with [-1, 1] floats
                    cs = [_chunk_to_f32(c) for c in cs]
                chunks = np.stack(cs)
                bucket = self._bucket(len(group))
                if bucket > len(group):  # pad to the compiled bucket size
                    pad = np.zeros(
                        (bucket - len(group), chunks.shape[1]), chunks.dtype
                    )
                    chunks = np.concatenate([chunks, pad])
                logits = np.asarray(
                    self._batch_forward(params, jnp.asarray(chunks), len(group))
                )
                for i, (_, _, done, box) in enumerate(group):
                    box["logits"] = logits[i]
                    done.set()
            except Exception as e:  # noqa: BLE001 — propagate per session
                for _, _, done, box in group:
                    box["err"] = e
                    done.set()


class _ExportedShim:
    """Just enough of the SegmentationModel surface for StreamingSegmenter,
    reconstructed from an artifact manifest (geometry + labels; the forward
    itself is the exported ``stream.jaxexp`` program)."""

    module = None  # no flax module: nothing to strip a mesh from

    def __init__(self, manifest: dict) -> None:
        from types import SimpleNamespace

        step = int(manifest["rf_step"])
        self.conv_settings = ConvolutionSettings((step,), (step,), (0,))
        self.config = SimpleNamespace(
            audio=SimpleNamespace(
                chunk_duration_f=int(manifest["chunk_duration_f"]),
                strict_frames=bool(manifest["strict_frames"]),
                reference_tail=bool(manifest["reference_tail"]),
                sample_rate=int(manifest["sample_rate"]),
            )
        )
        self.label_encoder = SimpleNamespace(
            base_labels=tuple(manifest["labels"])
        )


class StreamingSegmenter:
    """Push samples in, get finalized ``(start_f, end_f, label)`` out."""

    @classmethod
    def from_exported(
        cls,
        exported: Any,
        thresholds: dict[str, dict[str, float]] | None = None,
        forward_fn: Callable | None = None,
    ) -> "StreamingSegmenter":
        """Online segmentation off a frozen artifact
        (:class:`segma_tpu.export.ExportedPipeline` with a ``stream.jaxexp``
        program) — byte-identical intervals to the live segmenter on the
        same pushes (params are baked into the program). ``forward_fn``
        (e.g. :meth:`ChunkForwardBatcher.from_exported`) shares one
        cross-session dispatcher across segmenters."""
        if exported.stream_fn is None:
            raise ValueError("artifact has no streaming program")

        if forward_fn is None:
            i16 = exported.stream_i16_fn

            def forward_fn(_params, chunk):
                chunk = np.asarray(chunk)
                if chunk.dtype == np.int16 and i16 is not None:
                    # r4+ artifacts ship an int16-input program: raw PCM16
                    # crosses the wire, the device normalizes (the measured
                    # live-int16 vs artifact-f32 p99 gap, BENCH_REPORT.md)
                    return i16.call(chunk)
                # f32 pushes (or r3 artifacts): the f32-traced program
                return exported.stream_fn.call(_chunk_to_f32(chunk))

        return cls(
            _ExportedShim(exported.manifest),
            params=None,
            thresholds=thresholds or exported.manifest["thresholds"],
            forward_fn=forward_fn,
        )

    def __init__(
        self,
        model: SegmentationModel,
        params: Any,
        thresholds: dict[str, dict[str, float]] | None = None,
        forward_fn: Any = None,
    ) -> None:
        """``forward_fn``: optional pre-jitted ``(params, chunk) -> logits``
        to share one compiled program across many segmenters (e.g. one per
        HTTP streaming session) instead of re-tracing per instance."""
        # streaming is single-device: strip a seq-parallel mesh the module
        # may have baked in at build time (same normalization as
        # InferencePipeline.__post_init__ — the constraints are pure data
        # movement, numerics are identical)
        if getattr(model.module, "mesh", None) is not None:
            model = model.with_module(model.module.clone(mesh=None))
        self.model = model
        self.params = params
        cfg = model.config
        step = int(model.conv_settings.rf_step)
        self.frame_settings = ConvolutionSettings((step,), (step,), (0,))
        self.ck = Chunkyfier(1, cfg.audio.chunk_duration_f, self.frame_settings)
        self.strict_tail = cfg.audio.strict_frames
        enc = model.label_encoder
        thresholds = thresholds or default_thresholds(enc.base_labels)
        # resolve by label name (same helper as InferencePipeline) so YAML key
        # order can never swap per-label thresholds in streaming mode
        self.thr = threshold_vector(enc.base_labels, thresholds)
        self.labels = enc.base_labels

        self._buffer = np.zeros(0, np.float32)
        self._consumed = 0  # absolute sample index of buffer[0]
        self._n_chunks = 0
        # per-label open-run start frame (or -1)
        self._open = np.full(len(self.labels), -1, np.int64)
        self._n_frames = 0  # frames decoded so far
        self._finalized: list[tuple[int, int, str]] = []
        self._done = False

        if forward_fn is not None:
            self._forward = forward_fn
        else:
            self._forward = make_streaming_forward(model)

    # -- internals ---------------------------------------------------------------
    def _emit_frames(self, probs_mask: np.ndarray) -> list[tuple[int, int, str]]:
        """Advance the run state over new frames; return closed intervals.

        Vectorized transition detection (prepend the carry state, diff the
        padded mask): the host does O(runs) Python work per chunk instead of
        O(frames x labels) — at device speeds the per-frame loop was the
        streaming throughput ceiling.
        """
        out: list[tuple[int, int, str]] = []
        base = self._n_frames
        t = probs_mask.shape[0]
        carry = (self._open >= 0)[None, :]  # (1, L) open-run state
        padded = np.concatenate([carry, probs_mask]).astype(np.int8)
        diff = np.diff(padded, axis=0)  # +1 = run opens at f, -1 = closes
        for li, label in enumerate(self.labels):
            opens = np.where(diff[:, li] == 1)[0]
            closes = np.where(diff[:, li] == -1)[0]
            open_start = int(self._open[li])
            # closes pair in order: first with the carried-open run (if
            # any), the rest with this chunk's opens; at most one open
            # can be left over (still running past the chunk end)
            oi = 0
            for c in closes:
                start = open_start if open_start >= 0 else base + int(opens[oi])
                if open_start >= 0:
                    open_start = -1
                else:
                    oi += 1
                out.append(
                    (
                        *self.frame_settings.run_interval(
                            start, base + int(c) - 1
                        ),
                        label,
                    )
                )
            if oi < len(opens):  # one run left open past the chunk end
                open_start = base + int(opens[oi])
            self._open[li] = open_start
        self._n_frames += t
        return out

    def _process_chunk(self, chunk: np.ndarray, keep_frames: int) -> np.ndarray:
        logits = np.asarray(self._forward(self.params, jnp.asarray(chunk)))
        probs = 1.0 / (1.0 + np.exp(-logits[:keep_frames]))
        return probs > self.thr[None, :]

    # -- public API ---------------------------------------------------------------
    def push(self, samples: np.ndarray) -> list[tuple[int, int, str]]:
        """Feed more mono samples (float32 in [-1, 1] or int16 PCM);
        returns newly finalized intervals.

        int16 pushes are buffered AND shipped as int16 — the device
        normalizes (bit-identical to the host division, half the bytes
        per chunk). Mixing dtypes mid-stream promotes the buffer to f32
        transparently (also bit-exact)."""
        if self._done:
            raise StreamFlushedError(
                "flush() already called on this segmenter"
            )
        samples = np.asarray(samples)
        if samples.dtype != np.int16:
            samples = samples.astype(np.float32)
        if self._buffer.size == 0:
            self._buffer = self._buffer.astype(samples.dtype)
        elif samples.dtype != self._buffer.dtype:
            if self._buffer.dtype == np.int16:
                self._buffer = self._buffer.astype(np.float32) / 32768.0
            if samples.dtype == np.int16:
                samples = samples.astype(np.float32) / 32768.0
        self._buffer = np.concatenate([self._buffer, samples])
        out: list[tuple[int, int, str]] = []
        ck = self.ck
        while True:
            chunk_start = ck.chunk_start_i(self._n_chunks)
            avail = self._consumed + self._buffer.shape[0] - chunk_start
            if avail < ck.chunk_duration_f:
                break
            off = chunk_start - self._consumed
            chunk = self._buffer[off : off + ck.chunk_duration_f]
            out.extend(self._emit_frames(self._process_chunk(chunk, ck.n_windows)))
            self._n_chunks += 1
            # drop samples no later chunk needs
            next_start = ck.chunk_start_i(self._n_chunks)
            drop = next_start - self._consumed
            if drop > 0:
                self._buffer = self._buffer[drop:]
                self._consumed = next_start
        self._finalized.extend(out)
        return out

    def flush(self) -> list[tuple[int, int, str]]:
        """Process the tail (>= 400 samples) and close all open runs."""
        if self._done:
            raise StreamFlushedError(
                "flush() already called on this segmenter"
            )
        self._done = True
        ck = self.ck
        out: list[tuple[int, int, str]] = []
        tail_start = ck.chunk_start_i(self._n_chunks)
        tail_len = self._consumed + self._buffer.shape[0] - tail_start
        if tail_len >= TAIL_MIN_SAMPLES:
            if self.model.config.audio.reference_tail:
                # bit-faithful reference tail: a full chunk of frames
                # computed from zero padding (see Chunkyfier.total_frames)
                tail_frames = ck.n_windows
            else:
                tail_frames = self.frame_settings.n_windows(
                    int(tail_len), strict=self.strict_tail
                )
            if tail_frames > 0:
                off = tail_start - self._consumed
                tail = self._buffer[off:]
                chunk = np.zeros(ck.chunk_duration_f, self._buffer.dtype)
                chunk[: tail.shape[0]] = tail
                out.extend(
                    self._emit_frames(self._process_chunk(chunk, tail_frames))
                )
        # close open runs at the final frame
        for li, label in enumerate(self.labels):
            if self._open[li] >= 0:
                out.append(
                    (
                        *self.frame_settings.run_interval(
                            int(self._open[li]), self._n_frames - 1
                        ),
                        label,
                    )
                )
                self._open[li] = -1
        self._finalized.extend(out)
        return out

    @property
    def intervals(self) -> list[tuple[int, int, str]]:
        """Everything finalized so far."""
        return sorted(self._finalized)
