"""HTTP serving for segmentation — a production deployment surface.

Extension beyond the reference (which ships only CLI batch inference;
its closest analog is the per-file loop in ``src/segma/inference.py:442-459``).
One device-resident :class:`~segma_tpu.inference.InferencePipeline` is
fronted by a threading HTTP server:

- ``GET  /healthz``            liveness + model/device info
- ``GET  /metrics``            Prometheus text: request/error counters,
  audio-seconds processed, latency quantiles, batch dispatches
  (per-model ``{model="..."}`` series under bundle serving)
- ``GET  /v1/models``          catalog of served models (labels,
  artifact provenance, default election)
- ``POST /v1/segment``         one audio body -> intervals
  - body: a RIFF/WAVE file, or raw 16 kHz mono int16 PCM with
    ``Content-Type: audio/l16`` (big-endian per RFC 2586; append
    ``;endianness=little`` for s16le streams)
  - query: ``uri=<name>`` (labels the output), ``format=json|rttm``
- ``POST /v1/stream/start``    open an online-segmentation session
- ``POST /v1/stream/<sid>/push``  raw PCM16 samples -> intervals
  finalized so far (incremental; same ``audio/l16`` semantics,
  octet-stream defaults to little-endian)
- ``POST /v1/stream/<sid>/flush`` process the tail, close open runs,
  end the session. Sessions idle >10 min are evicted. Streaming works
  from a live model pipeline (``--config``) and from artifacts that ship
  a ``stream.jaxexp`` program (every export from this build; older
  artifacts get a 400 pointing at re-export).

Bundle serving (``--bundle <dir>``, see ``segma_tpu.bundle``) loads every
exported artifact under one directory and routes per request via the
``model=<name>`` query parameter on ``/v1/segment`` / ``/v1/stream/start``
/ ``/v1/stream/ws``; omitted, the bundle's default election applies.
``POST /admin/reload`` re-scans the bundle directory without a restart:
new/re-exported artifacts are loaded and warmed before they route,
unchanged ones keep their service (metrics and sessions intact), removed
ones stop taking new requests while open streaming sessions drain.

The HTTP layer is multi-threaded so upload + WAV decode of request i+1
overlap device compute of request i; actual device work is serialized by a
lock (one accelerator, one program at a time). Responses are bit-identical
to ``scripts/predict.py`` on the same audio: the same jitted forward,
packed run-length decode and interval math run underneath.
"""

from __future__ import annotations

import collections
import json
import queue
import struct
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any
from urllib.parse import parse_qs, urlparse

import numpy as np

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.inference import (
    InferencePipeline,
    _load_mono,
    default_thresholds,
)
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

    def __init__(self, service, window_ms: float, max_batch: int) -> None:
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


class _Stats:
    """Thread-safe serving counters + latency reservoir for ``/metrics``."""

    def __init__(self, window: int = 1024) -> None:
        self._lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.audio_seconds = 0.0
        self.started = time.monotonic()
        self._lat = collections.deque(maxlen=window)

    def record(self, latency_s: float, audio_s: float) -> None:
        with self._lock:
            self.requests += 1
            self.audio_seconds += audio_s
            self._lat.append(latency_s)

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    def samples(
        self, service: "SegmentationService", labels: dict[str, str]
    ) -> list[tuple[str, str, dict[str, str], float | int]]:
        """(metric, prom_type, labels, value) rows for one service."""
        with self._lock:
            lat = sorted(self._lat)
            requests, errors = self.requests, self.errors
            audio_s = self.audio_seconds
        rows = [
            ("segma_requests_total", "counter", labels, requests),
            ("segma_request_errors_total", "counter", labels, errors),
            ("segma_audio_seconds_total", "counter", labels, round(audio_s, 3)),
            (
                "segma_uptime_seconds",
                "gauge",
                labels,
                round(time.monotonic() - self.started, 3),
            ),
            (
                "segma_batch_dispatches_total",
                "counter",
                labels,
                service._batcher.dispatches if service._batcher else requests,
            ),
        ]
        for p in (0.5, 0.9, 0.99):
            if lat:
                v = lat[min(len(lat) - 1, int(p * len(lat)))]
                rows.append(
                    (
                        "segma_request_latency_seconds",
                        "summary",
                        {**labels, "quantile": str(p)},
                        round(v, 4),
                    )
                )
        return rows

    def render(self, service: "SegmentationService") -> bytes:
        """Prometheus text exposition for a single unlabeled service."""
        return render_metrics([(None, service)])


def render_metrics(
    entries: list[tuple[str | None, "SegmentationService"]],
) -> bytes:
    """Prometheus text format over one or more services.

    A ``None`` label renders bare samples (single-model server); a name
    adds ``{model="<name>"}`` so one bundle server exposes per-model
    series. ``# TYPE`` headers appear once per metric as the exposition
    format requires, whatever the service count.
    """
    rows: list[tuple[str, str, dict[str, str], float | int]] = []
    for name, service in entries:
        labels = {} if name is None else {"model": name}
        rows.extend(service.stats.samples(service, labels))
    order = list(dict.fromkeys(m for m, _, _, _ in rows))
    lines: list[str] = []
    for metric in order:
        group = [r for r in rows if r[0] == metric]
        lines.append(f"# TYPE {metric} {group[0][1]}")
        for _, _, labels, value in group:
            lab = (
                "{"
                + ",".join(f'{k}="{v}"' for k, v in labels.items())
                + "}"
                if labels
                else ""
            )
            lines.append(f"{metric}{lab} {value}")
    # process-level host memory gauge: long-lived servers on a leaky host
    # stack (e.g. a relay client retaining transfer payloads) need an
    # alertable RSS signal so operators recycle before the OOM killer does
    from segma_tpu.utils import host_rss_gb

    lines.append("# TYPE segma_host_rss_bytes gauge")
    lines.append(f"segma_host_rss_bytes {int(host_rss_gb() * 1e9)}")
    return ("\n".join(lines) + "\n").encode()


class SegmentationService:
    """Model + thresholds + device serialization, shared by HTTP threads.

    ``pipeline`` is either a live :class:`InferencePipeline` (model zoo +
    checkpoint) or a :class:`segma_tpu.export.ExportedPipeline` (frozen
    StableHLO artifact directory) — the serving surface is identical.
    """

    def __init__(
        self,
        pipeline,
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

    def _stream(self, sid: str, claim: bool = False):
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

    def _dispatch_lock(self):
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


class ModelRouter:
    """Request routing across the models of one server process.

    Single-model serving wraps its one :class:`SegmentationService`;
    bundle serving (``--bundle``) holds one service per artifact, all
    sharing one device lock. ``?model=<name>`` on ``/v1/segment`` and
    ``/v1/stream/start`` (and ``/v1/stream/ws``) selects; omitting it
    routes to the default election from ``bundle.json``.
    """

    def __init__(
        self,
        services: dict[str, SegmentationService],
        default: str,
        reloader=None,
    ) -> None:
        if default not in services:
            raise KeyError(f"default model {default!r} not in {sorted(services)}")
        self.services = services
        self.default = default
        # hot-reload hook (bundle serving only): () -> (services, default,
        # report). Swapped-out services are retired, not dropped — their
        # live streaming sessions keep draining via service_for_sid.
        self.reloader = reloader
        self._retired: list[SegmentationService] = []
        self._swap_lock = threading.Lock()

    @classmethod
    def single(cls, service: SegmentationService) -> "ModelRouter":
        name = service.model_name.split(" (")[0]
        return cls({name: service}, name)

    def get(self, name: str | None = None) -> SegmentationService:
        name = name or self.default
        try:
            return self.services[name]
        except KeyError:
            raise KeyError(
                f"unknown model {name!r} (serving: {sorted(self.services)})"
            ) from None

    def service_for_sid(self, sid: str) -> SegmentationService:
        """Find the service owning a streaming session (push/flush carry
        only the sid; the model was chosen at /v1/stream/start). Retired
        services (hot-reload swapped them out) are searched too, so open
        sessions drain across a reload."""
        for svc in [*self.services.values(), *self._retired]:
            with svc._streams_lock:
                if sid in svc._streams:
                    return svc
        raise KeyError(sid)

    def reload(self) -> bytes:
        """Re-scan the bundle and swap the routing table (POST
        /admin/reload). New/changed artifacts are loaded and warmed;
        unchanged ones keep their service (metrics continuity); removed
        or replaced ones stop taking new requests but their open
        streaming sessions drain to completion."""
        if self.reloader is None:
            raise ValueError(
                "hot reload is only available under --bundle serving"
            )
        with self._swap_lock:
            new_services, default, report = self.reloader(self.services)
            old = self.services
            # swap atomically (readers never see a half-built table)
            self.services = new_services
            self.default = default
            retiring = [
                svc
                for name, svc in old.items()
                if new_services.get(name) is not svc
            ]
            # prune retired services whose sessions have all drained —
            # evicting stale ones first, so an abandoned session (client
            # vanished, never flushed) cannot pin its service forever
            kept_retired = []
            for svc in (*self._retired, *retiring):
                with svc._streams_lock:
                    svc._evict_stale_streams()
                    if svc._streams:
                        kept_retired.append(svc)
            self._retired = kept_retired
            return json.dumps(report).encode()

    def models_payload(self) -> bytes:
        """GET /v1/models: the catalog — name, labels, provenance."""
        models = {}
        for name, svc in self.services.items():
            entry: dict[str, Any] = {
                "model": svc.model_name,
                "labels": svc.labels,
                "sample_rate": svc.sample_rate,
                "streaming": (
                    not svc.exported or svc.pipeline.supports_streaming
                ),
            }
            if svc.exported:
                m = svc.pipeline.manifest
                entry.update(
                    transport=m.get("transport"),
                    framework_version=m.get("framework_version"),
                    model_version=m.get("model_version"),
                    created_at=m.get("created_at"),
                )
            models[name] = entry
        return json.dumps({"default": self.default, "models": models}).encode()

    def metrics_payload(self) -> bytes:
        if len(self.services) == 1:
            return render_metrics([(None, self.get())])
        return render_metrics(sorted(self.services.items()))

    def health_payload(self) -> bytes:
        payload = json.loads(self.get().health())
        if len(self.services) > 1:
            payload["models"] = sorted(self.services)
            payload["default"] = self.default
        return json.dumps(payload).encode()


def _make_handler(router: ModelRouter, max_body_bytes: int = MAX_BODY_BYTES):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _body_length(self) -> int | None:
            """Content-Length, bounded; None means an error reply (400/413)
            was already sent."""
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length < 0:
                    raise ValueError(length)
            except ValueError:
                # a garbage header must get a clean 400, not an unhandled
                # exception that drops the connection without a response
                self.close_connection = True
                self._error(400, "invalid Content-Length header")
                return None
            if length > max_body_bytes:
                # the body was never read: this keep-alive connection is
                # now mid-upload and unusable — close it after replying
                self.close_connection = True
                self._error(
                    413,
                    f"body of {length} bytes exceeds the "
                    f"{max_body_bytes} byte cap",
                )
                return None
            return length

        def _reply(self, code: int, payload: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _error(self, code: int, message: str) -> None:
            self._reply(
                code, json.dumps({"error": message}).encode(), "application/json"
            )

        def _stream_route(self, url) -> None:
            """POST /v1/stream/start | /v1/stream/<sid>/push | .../flush."""
            parts = url.path.split("/")  # ['', 'v1', 'stream', ...]
            t0 = time.monotonic()
            if parts[3:] == ["start"]:
                # drain any request body: leaving unread bytes on a
                # keep-alive connection desyncs the NEXT request (its
                # request line would be parsed out of this body)
                length = self._body_length()
                if length is None:
                    return
                if length:
                    self.rfile.read(length)
                model = parse_qs(url.query).get("model", [None])[0]
                try:
                    service = router.get(model)
                except KeyError as e:
                    self._error(404, str(e))
                    return
                try:
                    sid = service.stream_start()
                    self._reply(
                        200,
                        json.dumps({"session": sid}).encode(),
                        "application/json",
                    )
                except SessionLimitError as e:
                    service.stats.record_error()
                    self._error(429, str(e))
                except ValueError as e:  # exported artifact: batch-only
                    service.stats.record_error()
                    self._error(400, str(e))
                except Exception as e:  # noqa: BLE001 — keep the server alive
                    service.stats.record_error()
                    self._error(500, f"{type(e).__name__}: {e}")
                return
            if len(parts) != 5 or parts[4] not in ("push", "flush"):
                self._error(404, f"unknown path {url.path!r}")
                return
            sid, op = parts[3], parts[4]
            try:
                service = router.service_for_sid(sid)
            except KeyError:
                router.get().stats.record_error()
                self._error(404, "unknown or expired stream session")
                return
            length = self._body_length()
            if length is None:
                service.stats.record_error()
                return
            try:
                body = self.rfile.read(length)
                if op == "push":
                    intervals = service.stream_push(
                        sid, body, self.headers.get("Content-Type", "")
                    )
                    audio_s = (length / 2) / service.sample_rate
                else:
                    intervals = service.stream_flush(sid)
                    audio_s = 0.0
                self._reply(
                    200,
                    service.to_json(sorted(intervals), sid),
                    "application/json",
                )
                service.stats.record(time.monotonic() - t0, audio_s)
            except KeyError:
                # session raced away (second flush / TTL eviction) between
                # the router lookup and the operation
                service.stats.record_error()
                self._error(404, "unknown or expired stream session")
            except Exception as e:  # noqa: BLE001 — keep the server alive
                service.stats.record_error()
                from segma_tpu.streaming import StreamFlushedError

                if isinstance(e, StreamFlushedError):
                    # racing flush on the same session -> client conflict
                    self._error(409, str(e))
                elif isinstance(e, ValueError):
                    self._error(400, str(e))
                else:  # e.g. XlaRuntimeError (device failure)
                    self._error(500, f"{type(e).__name__}: {e}")

        def _ws_route(self, url) -> None:
            """GET /v1/stream/ws — WebSocket streaming session.

            Binary frames carry raw s16le PCM pushes; each push is answered
            with a text frame of newly finalized intervals. A text "flush"
            frame (or a close frame) processes the tail, answers with the
            final intervals, and ends the session. Per-push overhead drops
            from a full HTTP request to a 2-14 byte frame header."""
            from segma_tpu import ws

            key = self.headers.get("Sec-WebSocket-Key")
            if (
                key is None
                or self.headers.get("Upgrade", "").lower() != "websocket"
            ):
                self._error(400, "websocket upgrade required")
                return
            try:
                service = router.get(parse_qs(url.query).get("model", [None])[0])
            except KeyError as e:
                self._error(404, str(e))
                return
            try:
                sid = service.stream_start()
            except SessionLimitError as e:
                self._error(429, str(e))
                return
            except ValueError as e:  # exported artifact: batch-only
                self._error(400, str(e))
                return
            self.send_response(101)
            self.send_header("Upgrade", "websocket")
            self.send_header("Connection", "Upgrade")
            self.send_header("Sec-WebSocket-Accept", ws.accept_key(key))
            self.end_headers()
            self.close_connection = True
            # register for the drain path (graceful shutdown force-closes
            # long-lived WS sockets instead of waiting them out), and reap
            # dead peers: a socket idle past the session TTL raises
            # timeout -> OSError -> discard below
            self.server.ws_conns.add(self.connection)
            self.connection.settimeout(SegmentationService.STREAM_TTL_S)

            def send(opcode: int, payload: bytes) -> None:
                self.wfile.write(ws.encode_frame(opcode, payload))
                self.wfile.flush()

            def finish(close_payload: bytes = b"") -> None:
                try:
                    intervals = service.stream_flush(sid)
                    send(ws.OP_TEXT, service.to_json(sorted(intervals), sid))
                except KeyError:
                    pass  # session already flushed/evicted
                # echo the peer's close code only when it is well-formed
                # (RFC 6455 §5.5.1: a close payload is empty or >= 2 bytes)
                send(
                    ws.OP_CLOSE,
                    close_payload[:2] if len(close_payload) >= 2 else b"",
                )

            try:
                while True:
                    op, payload = ws.read_frame(self.rfile)
                    t0 = time.monotonic()
                    if op == ws.OP_PING:
                        send(ws.OP_PONG, payload)
                    elif op == ws.OP_CLOSE:
                        finish(payload)
                        return
                    elif op == ws.OP_BINARY:
                        intervals = service.stream_push(
                            sid, payload, "audio/l16;endianness=little"
                        )
                        send(ws.OP_TEXT, service.to_json(sorted(intervals), sid))
                        service.stats.record(
                            time.monotonic() - t0,
                            (len(payload) / 2) / service.sample_rate,
                        )
                    elif op == ws.OP_TEXT and payload.strip() == b"flush":
                        finish()
                        return
                    else:
                        raise ws.WebSocketError(
                            f"unexpected frame opcode {op:#x}"
                        )
            except (ConnectionError, ws.WebSocketError, OSError):
                # peer vanished or spoke garbage: drop the session quietly
                service.stats.record_error()
                service.stream_discard(sid)
            except KeyError:
                service.stats.record_error()  # session evicted mid-stream
            except Exception as e:  # noqa: BLE001 — keep the server alive
                # bad payload (odd byte count -> ValueError) or a device
                # failure mid-push: tell the peer while the socket may
                # still be writable, then drop the session. Without this
                # the handler thread would die with a traceback and the
                # session would leak until TTL eviction.
                service.stats.record_error()
                try:
                    send(
                        ws.OP_CLOSE,
                        struct.pack("!H", 1011)
                        + f"{type(e).__name__}: {e}".encode()[:120],
                    )
                except Exception:  # noqa: BLE001 — socket already gone
                    pass
                service.stream_discard(sid)
            finally:
                self.server.ws_conns.discard(self.connection)

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            if url.path == "/v1/stream/ws":
                # long-lived: NOT counted in-flight — the drain path
                # force-closes the registered socket instead of waiting
                self._ws_route(url)
                return
            with self.server.track_inflight():
                self._get_inner(url)

        def _get_inner(self, url) -> None:
            path = url.path
            if path == "/healthz":
                self._reply(200, router.health_payload(), "application/json")
            elif path == "/metrics":
                self._reply(
                    200,
                    router.metrics_payload(),
                    "text/plain; version=0.0.4",
                )
            elif path == "/v1/models":
                self._reply(200, router.models_payload(), "application/json")
            else:
                self._error(404, f"unknown path {self.path!r}")

        def do_POST(self):  # noqa: N802
            with self.server.track_inflight():
                self._post_inner(urlparse(self.path))

        def _post_inner(self, url) -> None:
            if url.path.startswith("/v1/stream"):
                self._stream_route(url)
                return
            if url.path == "/admin/reload":
                length = self._body_length()
                if length is None:
                    return
                if length:
                    self.rfile.read(length)  # drain (reloads take no body)
                if router.reloader is None:
                    self._error(
                        409,
                        "hot reload is only available under --bundle serving",
                    )
                    return
                try:
                    self._reply(200, router.reload(), "application/json")
                except Exception as e:  # noqa: BLE001 — a failed rescan
                    # (torn artifact, bad bundle.json) leaves the previous
                    # routing table untouched; report it, keep serving
                    self._error(500, f"{type(e).__name__}: {e}")
                return
            if url.path != "/v1/segment":
                self._error(404, f"unknown path {self.path!r}")
                return
            q = parse_qs(url.query)
            uri = q.get("uri", ["audio"])[0]
            fmt = q.get("format", ["json"])[0]
            try:
                service = router.get(q.get("model", [None])[0])
            except KeyError as e:
                self._error(404, str(e))
                return
            length = self._body_length()
            if length is None:
                service.stats.record_error()
                return
            t0 = time.monotonic()
            try:
                body = self.rfile.read(length)
                audio = service._audio_from_body(
                    body, self.headers.get("Content-Type", "")
                )
                intervals = service.segment_audio(audio)
                if fmt == "rttm":
                    self._reply(200, service.to_rttm(intervals, uri), "text/plain")
                else:
                    self._reply(
                        200, service.to_json(intervals, uri), "application/json"
                    )
                n = audio.n_samples if hasattr(audio, "n_samples") else audio.size
                service.stats.record(
                    time.monotonic() - t0, n / service.sample_rate
                )
            except ValueError as e:
                service.stats.record_error()
                self._error(400, str(e))
            except Exception as e:  # noqa: BLE001 — keep the server alive
                service.stats.record_error()
                self._error(500, f"{type(e).__name__}: {e}")

    return Handler


class _Server(ThreadingHTTPServer):
    """ThreadingHTTPServer + real drain support.

    ``daemon_threads`` stays True (an idle keep-alive connection must not
    be able to block process exit), so stdlib ``server_close`` joins
    nothing — instead requests are COUNTED: ``drain()`` waits for the
    in-flight count to reach zero (bounded by ``grace_s``) and then
    force-closes registered long-lived WebSocket sockets, whose handlers
    exit via their normal disconnect path (session discarded)."""

    daemon_threads = True

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self.ws_conns: set = set()

    def track_inflight(self):
        import contextlib

        @contextlib.contextmanager
        def cm():
            with self._inflight_lock:
                self._inflight += 1
            try:
                yield
            finally:
                with self._inflight_lock:
                    self._inflight -= 1

        return cm()

    def inflight(self) -> int:
        with self._inflight_lock:
            return self._inflight

    def drain(self, grace_s: float = 30.0) -> None:
        """Let in-flight requests finish (up to ``grace_s``), then
        force-close long-lived WS sessions so nothing outlives us."""
        import socket as _socket

        deadline = time.monotonic() + grace_s
        while time.monotonic() < deadline and self.inflight() > 0:
            time.sleep(0.05)
        for conn in list(self.ws_conns):
            try:
                conn.shutdown(_socket.SHUT_RDWR)
            except OSError:
                pass


def make_server(
    service: SegmentationService | ModelRouter,
    host: str = "127.0.0.1",
    port: int = 8000,
    max_body_bytes: int = MAX_BODY_BYTES,
) -> ThreadingHTTPServer:
    """Bind (but do not start) the HTTP server; ``port=0`` picks a free one.

    Accepts one :class:`SegmentationService` (wrapped into a single-model
    router) or a :class:`ModelRouter` over a bundle's services.
    """
    router = (
        service
        if isinstance(service, ModelRouter)
        else ModelRouter.single(service)
    )
    return _Server((host, port), _make_handler(router, max_body_bytes))


def _start_rss_watchdog(
    server: ThreadingHTTPServer, limit_gb: float, poll_s: float = 10.0
) -> dict:
    """Graceful self-recycle for long-lived servers on a leaky host stack
    (the relay client retains transfer payloads — see CLAUDE.md): when RSS
    crosses ``limit_gb``, stop accepting, drain in-flight requests, and
    let the process exit (75) so the orchestrator restarts it — instead of
    the kernel OOM killer resetting clients mid-reply. Returns a state
    dict whose ``fired`` key records whether the watchdog tripped."""
    from segma_tpu.utils import host_rss_gb
    from segma_tpu.utils.logging import log

    state = {"fired": False}

    def watch() -> None:
        while True:
            time.sleep(poll_s)
            rss = host_rss_gb()
            if rss > limit_gb:
                log(
                    f"host RSS {rss:.2f} GB > --max-rss-gb {limit_gb:g}: "
                    "draining and exiting for an orchestrator restart"
                )
                state["fired"] = True
                server.shutdown()
                return

    threading.Thread(target=watch, daemon=True).start()
    return state


def _serve_until_signalled(
    server: ThreadingHTTPServer, max_rss_gb: float = 0.0
) -> None:
    """serve_forever with graceful termination.

    SIGTERM — what k8s/systemd/SLURM send on stop — stops accepting, then
    ``_Server.drain()`` waits for in-flight requests to finish replying
    (handler threads are daemon: stdlib close joins nothing) and
    force-closes long-lived WS sessions, instead of resetting clients
    mid-reply at process exit. ``shutdown()`` runs on a helper thread: it
    blocks until the serve loop exits, and the signal fires ON the loop's
    thread. ``max_rss_gb`` > 0 arms the RSS self-recycle watchdog (exit 75
    when it fires)."""
    import signal

    from segma_tpu.utils.logging import log

    def _term(signum, frame):
        log("SIGTERM: draining in-flight requests and shutting down")
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        prev = signal.signal(signal.SIGTERM, _term)
    except ValueError:  # not the main thread (library/test embedding)
        prev = None
    watchdog = (
        _start_rss_watchdog(server, max_rss_gb) if max_rss_gb > 0 else None
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    finally:
        if prev is not None:
            signal.signal(signal.SIGTERM, prev)
        # REAL drain: the accept loop stopping does not finish in-flight
        # replies (handler threads are daemon and are never joined) — wait
        # for them, then force-close long-lived WS sessions
        if hasattr(server, "drain"):
            server.drain()
    if watchdog is not None and watchdog["fired"]:
        raise SystemExit(75)  # EX_TEMPFAIL: restart me


def _warm_stream_programs(pipeline, batching: bool) -> None:
    """Compile/link an artifact's streaming programs before traffic (the
    batched buckets only when micro-batching will use them)."""
    if not pipeline.supports_streaming:
        return
    chunk_f = int(pipeline.manifest["chunk_duration_f"])
    pipeline.stream_fn.call(np.zeros(chunk_f, np.float32))
    if batching:
        for b, fn in sorted((pipeline.stream_batch_fns or {}).items()):
            fn.call(np.zeros((b, chunk_f), np.float32))


def bundle_reloader(
    bundle: Path | str,
    default_model: str | None = None,
    thresholds: dict | None = None,
    transport: str = "int16",
    batch_window_ms: float = 0.0,
    max_batch: int = 8,
    device_lock: threading.Lock | None = None,
    max_sessions: int = MAX_STREAM_SESSIONS,
):
    """Factory for the bundle scan callable used at startup and by
    ``POST /admin/reload``: ``rescan(current_services) -> (services,
    default, report)``. Services whose artifact manifest is unchanged are
    reused (metrics/session continuity); new or re-exported artifacts get
    fresh services, warmed under the shared device lock before they route.
    """
    shared_lock = device_lock or threading.Lock()

    def rescan(current: dict) -> tuple[dict, str, dict]:
        from segma_tpu.bundle import load_bundle

        manifest, pipelines = load_bundle(bundle, default=default_model)
        services: dict[str, SegmentationService] = {}
        added: list[str] = []
        replaced: list[str] = []
        kept: list[str] = []
        for name, pipe in pipelines.items():
            prev = current.get(name)
            if (
                prev is not None
                and prev.exported
                and prev.pipeline.manifest == pipe.manifest
            ):
                services[name] = prev
                kept.append(name)
                continue
            svc = SegmentationService(
                pipe,
                thresholds,
                transport=transport,
                batch_window_ms=batch_window_ms,
                max_batch=max_batch,
                device_lock=shared_lock,
                max_sessions=max_sessions,
            )
            warm = np.zeros(int(pipe.manifest["chunk_duration_f"]), np.int16)
            with shared_lock:  # in-flight requests share the device
                pipe.segment(warm, svc.thresholds)
                _warm_stream_programs(pipe, batch_window_ms > 0)
            services[name] = svc
            (replaced if name in current else added).append(name)
        report = {
            "default": manifest["default"],
            "added": sorted(added),
            "replaced": sorted(replaced),
            "kept": sorted(kept),
            "removed": sorted(set(current) - set(pipelines)),
        }
        return services, manifest["default"], report

    return rescan


def serve_forever(
    config: Any = None,
    checkpoint: Path | str | None = None,
    host: str = "127.0.0.1",
    port: int = 8000,
    thresholds: dict | None = None,
    batch_size: int = 128,
    batch_window_ms: float = 0.0,
    max_batch: int = 8,
    transport: str = "int16",
    artifact: Path | str | None = None,
    bundle: Path | str | None = None,
    default_model: str | None = None,
    max_body_mb: float = 512.0,
    mesh: Any = "auto",
    max_sessions: int = MAX_STREAM_SESSIONS,
    max_rss_gb: float = 0.0,
) -> None:
    """Load the model(s) and serve until interrupted (CLI entry).

    One of: ``config`` (+ ``checkpoint``) for a live model-zoo pipeline,
    ``artifact`` for a frozen export directory (``scripts/export.py``), or
    ``bundle`` for a directory of several artifacts served behind one port
    (``segma_tpu.bundle``; select per request with ``?model=<name>``).
    """
    from segma_tpu.utils.logging import log

    max_body_bytes = int(max_body_mb * (1 << 20))
    if bundle is not None:
        rescan = bundle_reloader(
            bundle,
            default_model=default_model,
            thresholds=thresholds,
            transport=transport,
            batch_window_ms=batch_window_ms,
            max_batch=max_batch,
            max_sessions=max_sessions,
        )
        log("loading bundle artifacts (load+link+warm)...")
        services, default, _ = rescan({})
        router = ModelRouter(services, default, reloader=rescan)
        server = make_server(router, host, port, max_body_bytes)
        log(
            f"serving bundle [{', '.join(sorted(services))}] "
            f"(default {default}) on "
            f"http://{host}:{server.server_address[1]}"
        )
        _serve_until_signalled(server, max_rss_gb)
        return

    if artifact is not None:
        from segma_tpu.export import ExportedPipeline

        pipeline = ExportedPipeline.load(artifact)
        warm_f = (
            pipeline.manifest["chunk_duration_f"]
        )
    else:
        from segma_tpu.checkpoint import load_model_for_inference
        from segma_tpu.config import Config, load_config

        cfg = config if isinstance(config, Config) else load_config(config)
        model = load_model_for_inference(cfg, checkpoint)
        if mesh == "auto":
            # same device-mesh policy as the predict CLI: batch requests
            # shard their window axis across every chip of the slice
            import jax

            from segma_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(cfg) if len(jax.devices()) > 1 else None
        elif mesh == "off":
            mesh = None
        pipeline = InferencePipeline(
            model,
            model.params,
            batch_size=batch_size,
            transport="adpcm" if transport == "adpcm" else "auto",
            mesh=mesh,
        )
        warm_f = cfg.audio.chunk_duration_f
    service = SegmentationService(
        pipeline,
        thresholds,
        transport=transport,
        batch_window_ms=batch_window_ms,
        max_batch=max_batch,
        max_sessions=max_sessions,
    )
    # warmup: compile (or, for artifacts, load+link) the smallest forward +
    # decode before accepting traffic so the first request doesn't pay it
    log("warming up (first compile)...")
    warm = np.zeros(warm_f, np.int16)
    if service.exported:
        pipeline.segment(warm, service.thresholds)
        _warm_stream_programs(pipeline, batch_window_ms > 0)
    else:
        lg, tf = pipeline.logits_for_audio_async(warm)
        if lg is not None:
            pipeline.decode_intervals(lg, service.thresholds, valid_frames=tf)
    server = make_server(service, host, port, max_body_bytes)
    log(
        f"serving {service.model_name} on "
        f"http://{host}:{server.server_address[1]}"
    )
    _serve_until_signalled(server, max_rss_gb)
