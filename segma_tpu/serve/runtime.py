"""Process lifecycle: signal-aware serve loop, RSS watchdog, CLI entry.

``serve_forever`` is the ``segma-tpu serve`` entry point: it loads the
model(s), warms the compile cache, binds the server and runs until
SIGTERM/SIGINT — with a graceful drain and an optional RSS self-recycle
(exit 75) for leaky host stacks (see CLAUDE.md).
"""

from __future__ import annotations

import threading
import time
from http.server import ThreadingHTTPServer
from pathlib import Path
from typing import Any

import numpy as np

from segma_tpu.inference import InferencePipeline
from segma_tpu.serve.http import make_server
from segma_tpu.serve.router import ModelRouter, _warm_stream_programs, bundle_reloader
from segma_tpu.serve.service import MAX_STREAM_SESSIONS, SegmentationService


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


def serve_forever(
    config: Any = None,
    checkpoint: Path | str | None = None,
    host: str = "127.0.0.1",
    port: int = 8000,
    thresholds: dict | None = None,
    batch_size: int = 64,
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
