"""Benchmark: conv-frontend VAD sliding-window inference throughput.

Measures audio-hours of 16 kHz audio segmented per wall-second per chip
(reported as xRT = audio-seconds/sec), on the full device-resident pipeline:
overlap-unfold -> log-mel -> ConvVAD forward -> logits. This is the
BASELINE.json headline config ("conv-frontend VAD frame inference ...
sliding-window batched inference over long multi-minute wav").

Prints one JSON line:
    {"metric": ..., "value": xRT, "unit": "x_realtime", "vs_baseline": xRT/500}
(the rebuild target is >500x real-time per chip, BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import numpy as np

from segma_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from segma_tpu.config import load_config
from segma_tpu.inference import InferencePipeline
from segma_tpu.models import Models
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent / "segma_tpu" / "config"
SR = 16_000
TARGET_XRT = 500.0  # driver north star: >500x real-time per chip


def probe_device(timeout_s: float = 240.0) -> str:
    """Fail fast (with a readable error) if the TPU runtime is unusable.

    Round 1's multichip dryrun died on a libtpu client/terminal version
    mismatch; this surfaces that class of drift as a tiny eager op BEFORE
    the expensive pipeline build, so the except-branch in __main__ can
    report it in the JSON instead of a silent non-zero exit. The probe
    runs under a watchdog: a WEDGED relay tunnel (observed in round 2 —
    RPCs that neither complete nor error for 10+ minutes) becomes a
    reported TimeoutError instead of a bench that hangs forever.
    """
    import threading

    box: dict = {}

    def _probe():
        try:
            dev = jax.devices()[0]
            # end-to-end runtime check: transfer + compile + execute + fetch
            np.asarray(jax.jit(lambda x: x + 1)(np.ones((8,), np.float32)))
            box["dev"] = str(dev)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            box["err"] = e

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        # observed stall windows last minutes then clear: give the stuck
        # RPC one more bounded window before reporting the environment
        # failure (a zeroed bench record costs more than the extra wait)
        t.join(timeout_s)
    if t.is_alive():
        raise TimeoutError(
            f"device probe did not respond within {2 * timeout_s:.0f}s "
            "(relay tunnel stalled)"
        )
    if "err" in box:
        raise box["err"]
    return box["dev"]


def probe_link(upload_mb: float = 8.0, reps: int = 3) -> dict:
    """Measured link-quality telemetry for the bench record.

    The tunnel's bandwidth varies ~3x hour-to-hour (CLAUDE.md): without
    these fields a slow window is indistinguishable from a real transport
    regression in the round-over-round record (r3 9084x vs r4 3737x on
    identical code). Reports:
      - upload_mb_s: host->device bandwidth (best of ``reps`` timed
        device_puts, completion forced by a data-dependent scalar fetch —
        block_until_ready does not reliably force the relay);
      - dispatch_ms: per-call round-trip latency (median of 10 tiny jitted
        calls, warm);
      - compile_cache_entries: persistent-cache state (cold cache explains
        slow warmups, not slow steady state).
    Keep uploads small and few: the relay client RETAINS every transfer
    payload in host RSS (CLAUDE.md), so this probe leaks ~reps*upload_mb.
    """
    stats: dict = {}
    f = jax.jit(lambda x: x.sum())
    payload = np.ones(int(upload_mb * 1e6 // 4), np.float32)
    _ = float(f(np.ones((8,), np.float32)))  # compile the tiny program
    ups = []
    for _ in range(reps):
        t0 = time.perf_counter()
        buf = jax.device_put(payload)
        _ = float(f(buf))  # data dependency: forces the upload to land
        ups.append(time.perf_counter() - t0)
        del buf
    stats["upload_mb_s"] = round(payload.nbytes / 1e6 / min(ups), 2)
    small = np.ones((8,), np.float32)
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float(f(small))
        lats.append(time.perf_counter() - t0)
    stats["dispatch_ms"] = round(sorted(lats)[len(lats) // 2] * 1e3, 1)
    cache_dir = Path.home() / ".cache" / "segma_tpu_xla"
    stats["compile_cache_entries"] = (
        len(list(cache_dir.iterdir())) if cache_dir.is_dir() else 0
    )
    # window-quality verdict for the re-run policy (BENCH_REPORT.md):
    # healthy windows measure >=20 MB/s and <=120 ms dispatch; below that,
    # throughput numbers reflect the tunnel, not the code
    stats["window"] = (
        "healthy"
        if stats["upload_mb_s"] >= 20.0 and stats["dispatch_ms"] <= 120.0
        else "degraded"
    )
    return stats


def main() -> None:
    probe_device()
    link_pre = probe_link()
    cfg = load_config(CONFIG_DIR / "default.yml", ["model.name=conv_vad"])
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    model.init_params(jax.random.key(0))

    pipe = InferencePipeline(model, model.params, batch_size=128)
    ck = pipe.chunkyfier

    # ~34 minutes of audio per call (512 chunks). Two transports are
    # measured (round-3 VERDICT item 3):
    #   - adpcm4 (0.547 B/sample, device-expanded): the lossy serving fast
    #     path and the headline number (the host link is the measured
    #     bottleneck in this environment);
    #   - int16 (2 B/sample, device-normalized): EXACT numerics — the
    #     parity-grade figure, reported alongside so nobody mistakes a
    #     lossy number for it.
    from segma_tpu.ops.adpcm import adpcm_encode_audio

    n_chunks = 512
    n_samples = n_chunks * ck.chunk_stride + ck.missing_n_frames
    audio_s = n_samples / SR
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(n_samples) * 3000).astype(np.int16)

    def measure(audio, iters: int = 5, rounds: int = 5):
        """Best sustained xRT over several rounds of pipelined dispatch
        (the tunnel's bandwidth varies ~3x by the minute; min wall wins —
        the rounds are spaced a few seconds apart so they sample different
        bandwidth windows instead of one)."""
        _ = pipe.logits_for_audio(audio)  # warmup/compile
        walls = []
        frames = 0
        for r in range(rounds):
            if r:
                time.sleep(6.0)
            t0 = time.perf_counter()
            # queue every transfer+forward, then drain — the host->device
            # copies of call i+1 overlap the device compute of call i
            pending = [pipe.logits_for_audio_async(audio) for _ in range(iters)]
            outs = [np.asarray(lg[:tf]) for lg, tf in pending]
            walls.append(time.perf_counter() - t0)
            frames = int(outs[-1].shape[0])
        wall = min(walls)
        xrt = iters * audio_s / wall
        return xrt, {
            "xrt": round(xrt, 2),
            "wall_s": round(wall, 3),
            "wall_s_all_rounds": [round(w, 3) for w in walls],
            "frames": frames,
        }

    adpcm_xrt, adpcm_detail = measure(adpcm_encode_audio(pcm))
    int16_xrt, int16_detail = measure(pcm)

    # flagship-backbone exact-numerics figure (round-4 VERDICT item 5):
    # whisper-base surgical_hydra, padded 30 s context, int16 transport,
    # pipelined dispatch — captured in the driver-readable JSON instead of
    # prose. Failure here (e.g. a cold-cache compile outlasting a tunnel
    # stall window) must not zero the headline: errors land in the
    # sub-object.
    backbones: dict = {}
    try:
        backbones["whisper_base_exact_int16"] = measure_whisper_exact()
    except BaseException as e:  # noqa: BLE001 — report, keep the headline
        if isinstance(e, KeyboardInterrupt):
            raise
        backbones["whisper_base_exact_int16"] = {
            "error": f"{type(e).__name__}: {e}"[:500]
        }

    link_post = probe_link()  # the window can shift mid-bench: record both

    result = {
        "metric": "conv-frontend VAD sliding-window inference (audio-sec/sec/chip)",
        "value": round(adpcm_xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(adpcm_xrt / TARGET_XRT, 4),
        "link": {"pre": link_pre, "post": link_post},
        # exact-numerics figure at top level: int16 transport, bit-identical
        # logits to the f32 path (normalization happens on device)
        "exact_int16_value": round(int16_xrt, 2),
        "exact_int16_vs_baseline": round(int16_xrt / TARGET_XRT, 4),
        "detail": {
            "device": str(jax.devices()[0]),
            "audio_s_per_call": round(audio_s, 1),
            "iters": 5,
            "audio_hours_per_sec": round(adpcm_xrt / 3600, 4),
            "transports": {
                "adpcm4 (0.547 B/sample, device-expanded, lossy)": adpcm_detail,
                "int16 (2 B/sample, device-normalized, exact)": int16_detail,
            },
        },
        "backbones": backbones,
    }
    print(json.dumps(result))


def measure_whisper_exact(
    n_chunks: int = 64, iters: int = 4, rounds: int = 3
) -> dict:
    """whisper-base (surgical_hydra, padded 30 s context) exact-numerics
    throughput: int16 transport + pipelined dispatch, best-of-N rounds.
    Random encoder weights — throughput is weight-agnostic. Same machinery
    as scripts/bench_backbones.py whisper_padded --transport int16."""
    import warnings

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_hydra",
            "model.config.encoder=whisper_base_random",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-weights warning expected
        model = Models["surgical_hydra"](enc, cfg)
    model.init_params(jax.random.key(0))
    pipe = InferencePipeline(model, model.params, batch_size=32)
    ck = pipe.chunkyfier
    n_samples = n_chunks * ck.chunk_stride + ck.missing_n_frames
    audio_s = n_samples / SR
    pcm = (
        np.random.default_rng(0).standard_normal(n_samples) * 3000
    ).astype(np.int16)
    _ = pipe.logits_for_audio(pcm)  # warmup/compile
    walls = []
    for r in range(rounds):
        if r:
            time.sleep(6.0)
        t0 = time.perf_counter()
        pending = [pipe.logits_for_audio_async(pcm) for _ in range(iters)]
        _ = [np.asarray(lg[:tf]) for lg, tf in pending]
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    return {
        "xrt": round(iters * audio_s / wall, 2),
        "wall_s_all_rounds": [round(w, 3) for w in walls],
        "audio_s_per_call": round(audio_s, 1),
        "n_chunks": n_chunks,
        "batch": 32,
        "transport": "int16 (exact numerics)",
        "context": "padded 30 s (reference-faithful)",
    }


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — always emit the JSON line
        if isinstance(e, KeyboardInterrupt):
            raise
        msg = f"{type(e).__name__}: {e}"
        if "libtpu version mismatch" in msg:
            msg = "libtpu client/terminal version mismatch (runtime drift): " + msg
        print(
            json.dumps(
                {
                    "metric": "conv-frontend VAD sliding-window inference "
                    "(audio-sec/sec/chip)",
                    "value": 0.0,
                    "unit": "x_realtime",
                    "vs_baseline": 0.0,
                    "error": msg[:2000],
                }
            )
        )
        if isinstance(e, TimeoutError):
            # the runtime thread is stuck in an RPC; interpreter shutdown
            # (atexit XLA client teardown) could hang on it — exit hard
            # after the JSON line has been flushed
            sys.stdout.flush()
            import os

            os._exit(0)
        sys.exit(0)
