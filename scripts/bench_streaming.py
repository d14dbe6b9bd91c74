"""Streaming-session latency/concurrency benchmark (library level).

Measures per-push latency (p50/p99) for real-time-sized pushes and
N-session concurrency throughput, with and without the cross-session
``ChunkForwardBatcher`` — the numbers behind BENCH_REPORT.md's streaming
row. Library-level (no HTTP) so the result isolates device dispatch from
socket overhead.

Usage:
    python scripts/bench_streaming.py [--sessions 1 4 8] [--push-ms 500]
    python scripts/bench_streaming.py --artifact <export-dir>   # frozen
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from segma_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SR = 16_000


def build_model(config: str | None, checkpoint: str | None):
    import jax

    from segma_tpu.config import load_config
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = load_config(
        config
        or Path(__file__).resolve().parent.parent
        / "segma_tpu"
        / "config"
        / "default.yml",
        [] if config else ["model.name=conv_vad"],
    )
    if checkpoint:  # same weights as an exported artifact -> fair live-vs-
        # artifact comparison (the model itself is latency-shape-bound, but
        # keep the programs byte-comparable)
        from segma_tpu.checkpoint import load_model_for_inference

        return load_model_for_inference(cfg, checkpoint)
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models[cfg.model.name](enc, cfg)
    model.init_params(jax.random.key(0))
    return model


def run_sessions(
    model, n_sessions: int, push_s: float, total_s: float, batcher=None,
    exported=None, dtype: str = "f32",
) -> dict:
    """N concurrent sessions each stream ``total_s`` seconds of audio in
    ``push_s``-sized pushes; returns per-push latency stats."""
    from segma_tpu.streaming import StreamingSegmenter

    push_n = int(push_s * SR)
    n_pushes = int(total_s / push_s)
    lat: list[list[float]] = [[] for _ in range(n_sessions)]

    def run(i: int) -> None:
        if exported is not None:
            seg = StreamingSegmenter.from_exported(exported, forward_fn=batcher)
        else:
            seg = StreamingSegmenter(model, model.params, forward_fn=batcher)
        # per-thread generator: np.random.Generator is not thread-safe,
        # and per-session seeds keep inputs independent AND reproducible
        rng = np.random.default_rng(i)
        audio = rng.standard_normal(push_n * n_pushes) * 0.3
        if dtype == "int16":  # the serving path: PCM16 ships raw
            audio = (audio * 32767.0).clip(-32768, 32767).astype(np.int16)
        else:
            audio = audio.astype(np.float32)
        for k in range(n_pushes):
            t0 = time.perf_counter()
            seg.push(audio[k * push_n : (k + 1) * push_n])
            lat[i].append(time.perf_counter() - t0)
        seg.flush()

    threads = [
        threading.Thread(target=run, args=(i,)) for i in range(n_sessions)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    all_lat = np.array([x for sess in lat for x in sess])
    audio_total = n_sessions * total_s
    return {
        "sessions": n_sessions,
        "push_ms": push_s * 1000,
        "p50_ms": round(float(np.percentile(all_lat, 50)) * 1000, 2),
        "p99_ms": round(float(np.percentile(all_lat, 99)) * 1000, 2),
        "max_ms": round(float(all_lat.max()) * 1000, 2),
        "wall_s": round(wall, 3),
        "aggregate_xrt": round(audio_total / wall, 1),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sessions", type=int, nargs="*", default=[1, 4, 8])
    parser.add_argument("--push-ms", type=float, default=500.0)
    parser.add_argument("--total-s", type=float, default=16.0)
    parser.add_argument(
        "--dtype", default="f32", choices=["f32", "int16"],
        help="push dtype (int16 = what HTTP serving ships; chunks then "
        "cross to the device raw, half the bytes)",
    )
    parser.add_argument(
        "--artifact", default=None,
        help="benchmark streaming off a frozen export dir (stream.jaxexp / "
        "stream_batch<N>.jaxexp) instead of a live model",
    )
    parser.add_argument(
        "--config", default=None,
        help="live-model config (default: default.yml + model.name=conv_vad)",
    )
    parser.add_argument(
        "--checkpoint", default=None,
        help="load live-model weights from a checkpoint (pass the same "
        "run an artifact was exported from for a live-vs-artifact A/B)",
    )
    args = parser.parse_args()

    from segma_tpu.streaming import ChunkForwardBatcher

    exported = None
    if args.artifact:
        from segma_tpu.export import ExportedPipeline

        exported = ExportedPipeline.load(args.artifact)
        model = None
    else:
        model = build_model(args.config, args.checkpoint)
    push_s = args.push_ms / 1000.0

    def make_batcher():
        if exported is not None:
            return ChunkForwardBatcher.from_exported(exported, window_ms=5.0)
        return ChunkForwardBatcher(model, window_ms=5.0, max_batch=8)

    # warmup: compile/link the single-chunk program (and batched buckets)
    if exported is not None:
        # group formation is timing-dependent, so a warm RUN can miss
        # buckets — warm every exported stream program directly instead
        chunk_f = int(exported.manifest["chunk_duration_f"])
        np.asarray(exported.stream_fn.call(np.zeros(chunk_f, np.float32)))
        if getattr(exported, "stream_i16_fn", None) is not None:
            np.asarray(exported.stream_i16_fn.call(np.zeros(chunk_f, np.int16)))
        bdt = exported.stream_batch_dtype  # int16 r4+, f32 r3 layouts
        for b, fn in sorted((exported.stream_batch_fns or {}).items()):
            np.asarray(fn.call(np.zeros((b, chunk_f), bdt)))
    warm = run_sessions(model, 1, push_s, 4.0, exported=exported, dtype=args.dtype)
    print(f"[warmup] {warm}", file=sys.stderr)

    rows = []
    for n in args.sessions:
        rows.append(
            {
                "mode": "serial-forward",
                **run_sessions(
                    model, n, push_s, args.total_s, exported=exported,
                    dtype=args.dtype,
                ),
            }
        )
        if n > 1:
            batcher = make_batcher()
            # warm the batched buckets
            run_sessions(model, n, push_s, 4.0, batcher=batcher, exported=exported, dtype=args.dtype)
            r = run_sessions(
                model, n, push_s, args.total_s, batcher=batcher,
                exported=exported, dtype=args.dtype,
            )
            r["dispatches"] = batcher.dispatches
            rows.append({"mode": "batched-forward", **r})
    if exported is not None:
        for r in rows:
            r["source"] = "artifact"
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
