"""The per-model serving core: decode, dispatch, streaming sessions.

:class:`SegmentationService` owns one pipeline (live
:class:`~segma_tpu.inference.InferencePipeline` or frozen
:class:`~segma_tpu.export.ExportedPipeline`), its thresholds, and the
device serialization shared by HTTP threads. The reference has no serving
surface; its closest analog is the per-file CLI loop
(``src/segma/inference.py:442-459``).
"""

from __future__ import annotations

import json
import queue
import tempfile
import threading
import time
from pathlib import Path
from typing import Any

import numpy as np

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.inference import _load_mono, default_thresholds
from segma_tpu.serve.stats import _Stats
from segma_tpu.utils.conversions import frames_to_seconds


# Upload bound: a Content-Length bigger than this is refused with 413
# before the body is read (one request must not be able to exhaust host
# RAM). 512 MiB covers ~4.5 h of int16 WAV per request; batch the CLI for
# anything longer.
MAX_BODY_BYTES = 512 << 20

# Streaming sessions hold host-side buffers and a dict slot until flushed
# or TTL-evicted; an unauthenticated client must not be able to open them
# without bound. Overridable per service (--max-sessions).
MAX_STREAM_SESSIONS = 256


class SessionLimitError(RuntimeError):
    """stream_start refused: the concurrent-session cap is reached.

    A distinct type so the HTTP layer can map it to 429 Too Many Requests
    without matching on message text."""


class _MicroBatcher:
    """Group concurrent requests into one packed device dispatch.

    Requests arriving within ``window_ms`` of the first queued one (up to
    ``max_batch``) share a single ``logits_for_audios_async`` call — same
    mechanism as the predict CLI's ``--pack-files`` (fills device batches
    that single short requests leave mostly idle; measured 1.7x on
    whisper-base over 20 s clips)."""

    def __init__(
        self, service: "SegmentationService", window_ms: float, max_batch: int
    ) -> None:
        self.service = service
        self.window_s = window_ms / 1000.0
        self.max_batch = max(1, max_batch)
        self.q: queue.Queue = queue.Queue()
        self.dispatches = 0  # observability / tests
        threading.Thread(target=self._run, daemon=True).start()

    def submit(self, audio: np.ndarray) -> list[tuple]:
        done = threading.Event()
        box: dict[str, Any] = {}
        self.q.put((audio, done, box))
        done.wait()
        if "err" in box:
            raise box["err"]
        return box["result"]

    def _run(self) -> None:
        while True:
            group = [self.q.get()]
            deadline = time.monotonic() + self.window_s
            while len(group) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    group.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            self.dispatches += 1
            try:
                results = self.service._segment_audios(
                    [audio for audio, _, _ in group]
                )
                for (_, done, box), result in zip(group, results):
                    box["result"] = result
                    done.set()
            except Exception as e:  # noqa: BLE001 — propagate per request
                for _, done, box in group:
                    box["err"] = e
                    done.set()


class SegmentationService:
    """Model + thresholds + device serialization, shared by HTTP threads.

    ``pipeline`` is either a live :class:`InferencePipeline` (model zoo +
    checkpoint) or a :class:`segma_tpu.export.ExportedPipeline` (frozen
    StableHLO artifact directory) — the serving surface is identical.
    """

    def __init__(
        self,
        pipeline: Any,
        thresholds: dict[str, dict[str, float]] | None = None,
        transport: str = "int16",
        batch_window_ms: float = 0.0,
        max_batch: int = 8,
        device_lock: threading.Lock | None = None,
        max_sessions: int = MAX_STREAM_SESSIONS,
    ) -> None:
        self.pipeline = pipeline
        self.max_sessions = max_sessions
        self.exported = not hasattr(pipeline, "model")
        if self.exported:
            m = pipeline.manifest
            self.labels = list(pipeline.labels)
            self.sample_rate = int(m["sample_rate"])
            self.model_name = f"{m['model_name']} (exported artifact)"
            self.thresholds = thresholds or m["thresholds"]
            # decode uploads to int16; ExportedPipeline.prepare() re-encodes
            # for whatever transport the artifact was frozen with
            transport = "int16"
        else:
            enc = pipeline.model.label_encoder
            self.labels = list(enc.base_labels)
            self.sample_rate = pipeline.model.config.audio.sample_rate
            self.model_name = pipeline.model.name
            self.thresholds = thresholds or default_thresholds(enc.base_labels)
        self.transport = transport
        # bundle serving passes ONE lock shared by every model's service:
        # there is one accelerator regardless of how many frozen programs
        # sit in front of it
        self._device_lock = device_lock or threading.Lock()
        self.stats = _Stats()
        # sid -> (segmenter, per-session lock, last_use). The per-session
        # lock serializes pushes/flushes hitting ONE segmenter's mutable
        # buffer state; concurrency ACROSS sessions is governed separately
        # (device lock, or the ChunkForwardBatcher when active).
        self._streams: dict[str, tuple] = {}
        self._streams_lock = threading.Lock()
        self._stream_forward = None
        self._batcher = (
            _MicroBatcher(self, batch_window_ms, max_batch)
            if batch_window_ms > 0
            else None
        )

    # -- decode -----------------------------------------------------------------
    @staticmethod
    def _decode_l16(body: bytes, content_type: str) -> np.ndarray:
        """RFC 2586 audio/L16 is big-endian network byte order; the
        non-standard ``;endianness=little`` parameter selects s16le
        (ffmpeg/sox default). Raw octet-streams default to little-endian.
        Returns native-order int16 for the device path."""
        ct = content_type.lower()  # media types are case-insensitive
        le = "little" in ct or not ct.startswith("audio/l16")
        return np.frombuffer(body, dtype="<i2" if le else ">i2").astype(
            np.int16
        )

    def _audio_from_body(self, body: bytes, content_type: str) -> np.ndarray:
        if content_type.lower().startswith("audio/l16"):
            return self._decode_l16(body, content_type)
        if body[:4] != b"RIFF":
            raise ValueError(
                "body must be a RIFF/WAVE file or raw int16 PCM "
                "(Content-Type: audio/l16)"
            )
        # the WAV reader is path-based (shared with the dataset layer);
        # spool the upload to tmpfs — decode cost is trivial vs device time
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(body)
            f.flush()
            return _load_mono(
                Path(f.name), self.transport, expect_sr=self.sample_rate
            )

    # -- inference ---------------------------------------------------------------
    def _segment_audios(self, audios: list[np.ndarray]) -> list[list[tuple]]:
        """Decoded audios -> per-audio sorted interval lists (one packed
        device dispatch when several arrive together)."""
        if self.exported:
            # exported programs are frozen at batch 1: no cross-request
            # packing, but the lock still serializes device use
            with self._device_lock:
                return [
                    sorted(self.pipeline.segment(a, self.thresholds))
                    for a in audios
                ]
        with self._device_lock:
            if len(audios) == 1:
                outs = [self.pipeline.logits_for_audio_async(audios[0])]
            else:
                outs = self.pipeline.logits_for_audios_async(
                    audios, pack_files=len(audios)
                )
            results = []
            for lg, tf in outs:
                if lg is None:
                    results.append([])
                else:
                    results.append(
                        sorted(
                            self.pipeline.decode_intervals(
                                lg, self.thresholds, valid_frames=tf
                            )
                        )
                    )
            return results

    def segment(self, body: bytes, content_type: str = "") -> list[tuple]:
        """audio bytes -> sorted [(start_f, end_f, label), ...]."""
        return self.segment_audio(self._audio_from_body(body, content_type))

    # -- streaming sessions --------------------------------------------------------
    STREAM_TTL_S = 600.0

    def _pcm_from_body(self, body: bytes, content_type: str) -> np.ndarray:
        """Raw PCM16 push payload (no WAV container mid-stream)."""
        if body[:4] == b"RIFF":
            raise ValueError(
                "stream pushes take raw PCM16 (audio/l16), not WAV files"
            )
        return self._decode_l16(body, content_type)

    def _evict_stale_streams(self) -> None:
        now = time.monotonic()
        stale = [
            sid
            for sid, (_seg, _lock, ts) in self._streams.items()
            if now - ts > self.STREAM_TTL_S
        ]
        for sid in stale:
            self._streams.pop(sid, None)

    def stream_start(self) -> str:
        """Open an online-segmentation session; returns its id."""
        import uuid

        from segma_tpu.streaming import (
            StreamingSegmenter,
            make_streaming_forward,
        )

        with self._streams_lock:
            self._evict_stale_streams()
            if len(self._streams) >= self.max_sessions:
                raise SessionLimitError(
                    f"{len(self._streams)} streaming sessions open (cap "
                    f"{self.max_sessions}); flush existing sessions or "
                    "raise --max-sessions"
                )
            if self.exported:
                # frozen artifacts stream off their exported per-chunk
                # program (raises ValueError -> 400 for artifacts exported
                # before stream.jaxexp existed). With micro-batching on,
                # concurrent sessions share the artifact's fixed-shape
                # batched programs (its exported bucket sizes govern, not
                # --max-batch — StableHLO programs cannot re-trace).
                fwd = None
                if (
                    self._batcher is not None
                    and self.pipeline.stream_batch_fns
                ):
                    if self._stream_forward is None:
                        from segma_tpu.streaming import ChunkForwardBatcher

                        self._stream_forward = ChunkForwardBatcher.from_exported(
                            self.pipeline,
                            window_ms=self._batcher.window_s * 1000.0,
                        )
                    fwd = self._stream_forward
                seg = self.pipeline.streaming_segmenter(
                    self.thresholds, forward_fn=fwd
                )
                sid = uuid.uuid4().hex[:16]
                self._streams[sid] = (seg, threading.Lock(), time.monotonic())
                return sid
            if self._stream_forward is None:
                if self._batcher is not None:
                    # micro-batching enabled: concurrent sessions' chunk
                    # forwards share one padded batched dispatch (each
                    # single-chunk dispatch pays ~80 ms relay latency;
                    # batching pays it once per window)
                    from segma_tpu.streaming import ChunkForwardBatcher

                    self._stream_forward = ChunkForwardBatcher(
                        self.pipeline.model,
                        window_ms=self._batcher.window_s * 1000.0,
                        max_batch=self._batcher.max_batch,
                    )
                else:
                    # one compiled per-chunk program shared by every session
                    self._stream_forward = make_streaming_forward(
                        self.pipeline.model
                    )
            sid = uuid.uuid4().hex[:16]
            seg = StreamingSegmenter(
                self.pipeline.model,
                self.pipeline.params,
                self.thresholds,
                forward_fn=self._stream_forward,
            )
            self._streams[sid] = (seg, threading.Lock(), time.monotonic())
        return sid

    def _stream(self, sid: str, claim: bool = False) -> tuple:
        with self._streams_lock:
            self._evict_stale_streams()
            entry = self._streams.get(sid)
            if entry is None:
                raise KeyError(sid)
            seg, lock, _ = entry
            if claim:
                # atomically remove: a racing push/second flush gets a
                # clean 404 instead of touching a flushed segmenter
                self._streams.pop(sid)
            else:
                self._streams[sid] = (seg, lock, time.monotonic())
        return seg, lock

    def _dispatch_lock(self) -> Any:
        """Cross-session lock for streaming device dispatch. With the
        ChunkForwardBatcher active, holding the device lock across push()
        would serialize sessions and starve the batcher of concurrent
        chunks — the batcher is itself the dispatch serialization point."""
        from segma_tpu.streaming import ChunkForwardBatcher

        if isinstance(self._stream_forward, ChunkForwardBatcher):
            import contextlib

            return contextlib.nullcontext()
        return self._device_lock

    def stream_push(self, sid: str, body: bytes, content_type: str) -> list:
        """Feed PCM16 samples; returns newly finalized intervals."""
        seg, lock = self._stream(sid)
        samples = self._pcm_from_body(body, content_type)
        with lock, self._dispatch_lock():
            return seg.push(samples)

    def stream_flush(self, sid: str) -> list:
        """Process the tail, close all open runs, end the session."""
        seg, lock = self._stream(sid, claim=True)
        with lock, self._dispatch_lock():
            return seg.flush()

    def stream_discard(self, sid: str) -> None:
        """Drop a session without running the tail forward — for error
        paths where no client is left to receive the result. Waits out any
        in-flight push so its buffers are not yanked mid-dispatch."""
        try:
            _seg, lock = self._stream(sid, claim=True)
        except KeyError:
            return
        with lock:
            pass

    def segment_audio(self, audio: np.ndarray) -> list[tuple]:
        """decoded audio -> sorted [(start_f, end_f, label), ...]."""
        if self._batcher is not None:
            return self._batcher.submit(audio)
        return self._segment_audios([audio])[0]

    # -- formatting ---------------------------------------------------------------
    def to_json(self, intervals: list[tuple], uri: str) -> bytes:
        return json.dumps(
            {
                "uri": uri,
                "sample_rate": self.sample_rate,
                "intervals": [
                    {
                        "label": label,
                        "start_s": round(
                            float(frames_to_seconds(s, self.sample_rate)), 6
                        ),
                        "end_s": round(
                            float(frames_to_seconds(e, self.sample_rate)), 6
                        ),
                    }
                    for s, e, label in intervals
                ],
            }
        ).encode()

    def to_rttm(self, intervals: list[tuple], uri: str) -> bytes:
        lines = [
            AudioAnnotation(
                uid=uri,
                start_time_s=float(frames_to_seconds(s, self.sample_rate)),
                duration_s=float(frames_to_seconds(e - s, self.sample_rate)),
                label=str(label),
            ).to_rttm()
            for s, e, label in intervals
        ]
        return ("\n".join(lines) + ("\n" if lines else "")).encode()

    def health(self) -> bytes:
        import jax

        from segma_tpu import __version__

        return json.dumps(
            {
                "status": "ok",
                "version": __version__,
                "model": self.model_name,
                "labels": self.labels,
                "device": str(jax.devices()[0]),
            }
        ).encode()
