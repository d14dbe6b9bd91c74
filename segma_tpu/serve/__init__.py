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

from segma_tpu.serve.http import _make_handler, _Server, make_server
from segma_tpu.serve.router import (
    ModelRouter,
    _warm_stream_programs,
    bundle_reloader,
)
from segma_tpu.serve.runtime import (
    _serve_until_signalled,
    _start_rss_watchdog,
    serve_forever,
)
from segma_tpu.serve.service import (
    MAX_BODY_BYTES,
    MAX_STREAM_SESSIONS,
    SegmentationService,
    SessionLimitError,
    _MicroBatcher,
)
from segma_tpu.serve.stats import _Stats, render_metrics

__all__ = [
    "MAX_BODY_BYTES",
    "MAX_STREAM_SESSIONS",
    "ModelRouter",
    "SegmentationService",
    "SessionLimitError",
    "bundle_reloader",
    "make_server",
    "render_metrics",
    "serve_forever",
]
