"""Per-backbone inference throughput benchmark (reproduces BENCH_REPORT.md).

Measures sliding-window inference xRT for each encoder family with the
mu-law transport and pipelined dispatch. Random encoder weights — the
numbers measure pipeline+architecture throughput, which is weight-agnostic.

Usage: python scripts/bench_backbones.py [--backbones whisper hubert wavlm]
"""

from __future__ import annotations

import argparse
import sys
import time
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from segma_tpu.config import load_config
from segma_tpu.inference import InferencePipeline, mulaw_compress
from segma_tpu.models import Models
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"

CONFIGS = {
    "conv_vad": ["model.name=conv_vad"],
    "whisper": [
        "model.name=surgical_hydra",
        "model.config.encoder=whisper_base_random",
        "model.config.fast_context=true",
    ],
    # reference-exact context: full 30 s padded whisper attention window
    "whisper_padded": [
        "model.name=surgical_hydra",
        "model.config.encoder=whisper_base_random",
    ],
    "hubert": [
        "model.name=surgical_hubert_hydra",
        "model.config.wav_encoder=hubert_base_random",
        "audio.strict_frames=true",
    ],
    "wavlm": [
        "model.name=surgical_wavlm_hydra",
        "model.config.wav_encoder=wavlm_base_random",
        "audio.strict_frames=true",
    ],
}


def bench_one(
    name: str,
    n_chunks: int,
    batch_size: int,
    iters: int,
    rounds: int,
    transport: str = "mulaw",
):
    cfg = load_config(CONFIG_DIR / "default.yml", CONFIGS[name])
    enc = MultiLabelEncoder(cfg.data.classes)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-weights warning expected
        model = Models[cfg.model.name](enc, cfg)
    model.init_params(jax.random.key(0))
    pipe = InferencePipeline(
        model,
        model.params,
        batch_size=batch_size,
        transport="adpcm" if transport == "adpcm" else "auto",
    )
    ck = pipe.chunkyfier
    n = n_chunks * ck.chunk_stride + ck.missing_n_frames
    pcm = (np.random.default_rng(0).standard_normal(n) * 3000).astype(np.int16)
    if transport == "adpcm":
        from segma_tpu.ops.adpcm import adpcm_encode_audio

        # encoded ONCE (as the prefetch thread does in production); the
        # dispatch path pads bytes only (0.547 B/sample on the wire)
        audio = adpcm_encode_audio(pcm)
    else:
        audio = {
            "mulaw": mulaw_compress(pcm),
            "int16": pcm,
            "f32": pcm.astype(np.float32) / 32768.0,
        }[transport]
    t0 = time.perf_counter()
    _ = pipe.logits_for_audio(audio)
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    walls = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        pending = [pipe.logits_for_audio_async(audio) for _ in range(iters)]
        _ = [np.asarray(lg[:tf]) for lg, tf in pending]
        walls.append(time.perf_counter() - t0)
    audio_s = iters * n / 16_000
    print(
        f"{name} [{transport}]: best {audio_s / min(walls):.0f}x RT "
        f"(walls {[f'{w:.2f}' for w in walls]}, {audio_s:.0f}s audio)",
        flush=True,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--backbones", nargs="*", default=list(CONFIGS), choices=list(CONFIGS)
    )
    parser.add_argument("--n-chunks", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument(
        "--transport", default="mulaw",
        choices=["mulaw", "adpcm", "int16", "f32"],
    )
    args = parser.parse_args()
    for name in args.backbones:
        bench_one(
            name,
            args.n_chunks,
            args.batch_size,
            args.iters,
            args.rounds,
            args.transport,
        )
