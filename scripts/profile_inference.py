"""Profiling harness: jax.profiler trace of the inference hot path.

TPU equivalent of the reference's Lightning/scalene profiling hooks
(``config/base.py:160``, ``Makefile:29-31``): produces an xprof-compatible
trace directory plus wall-clock stage timings (host pad, transfer, device
compute, device->host).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from segma_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from segma_tpu.config import load_config
from segma_tpu.inference import InferencePipeline
from segma_tpu.models import Models
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace-dir", default="profiles")
    parser.add_argument("--model", default="conv_vad")
    parser.add_argument("--minutes", type=float, default=8.0)
    args = parser.parse_args()

    cfg = load_config(CONFIG_DIR / "default.yml", [f"model.name={args.model}"])
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models[args.model](enc, cfg)
    model.init_params(jax.random.key(0))
    pipe = InferencePipeline(model, model.params, batch_size=128)

    n_samples = int(args.minutes * 60 * 16_000)
    audio = (
        np.random.default_rng(0).standard_normal(n_samples) * 3000
    ).astype(np.int16)

    # warmup/compile outside the trace
    _ = pipe.logits_for_audio(audio)

    trace_dir = Path(args.trace_dir)
    trace_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        t0 = time.perf_counter()
        logits = pipe.logits_for_audio(audio)
        wall = time.perf_counter() - t0
    audio_s = n_samples / 16_000
    print(
        f"[log] - {audio_s:.0f}s audio in {wall:.3f}s "
        f"({audio_s / wall:.0f}x RT); {logits.shape[0]} frames"
    )
    print(f"[log] - trace written to {trace_dir}/ (open with xprof/tensorboard)")


if __name__ == "__main__":
    main()
