"""Whisper encoder snapshotter (parity: reference
``scripts/save_load_whisper.py:6-49``): download an HF Whisper model at a
chosen precision and save its *encoder* locally — producing the
``whisper_tiny_encoder`` / ``whisper_base_encoder`` dirs the configs point
at. Also sanity-converts the snapshot to the flax encoder.

Requires network access for the download step; conversion of an existing
snapshot is fully offline.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODELS = {
    "tiny": "openai/whisper-tiny",
    "base": "openai/whisper-base",
    "small": "openai/whisper-small",
}


def snapshot(size: str, out: Path, precision: str = "fp32") -> Path:
    import torch
    from transformers import WhisperModel

    dtype = {
        "fp32": torch.float32,
        "fp16": torch.float16,
        "bf16": torch.bfloat16,
    }[precision]
    model = WhisperModel.from_pretrained(MODELS[size], torch_dtype=dtype)
    out.mkdir(parents=True, exist_ok=True)
    model.encoder.save_pretrained(out)
    print(f"[log] - saved {MODELS[size]} encoder to {out}")
    return out


def check_convert(out: Path) -> None:
    from segma_tpu.models.whisper.convert import convert_encoder_params

    cfg, params = convert_encoder_params(out)
    n = sum(
        v.size
        for layer in params.values()
        for v in (layer.values() if isinstance(layer, dict) else [layer])
        if hasattr(v, "size")
    )
    print(f"[log] - converted to flax: {cfg} (~{n} top-level params)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", default="base", choices=list(MODELS))
    parser.add_argument("--precision", default="fp32", choices=["fp32", "fp16", "bf16"])
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--convert-only",
        action="store_true",
        help="skip download; just verify flax conversion of an existing dir",
    )
    args = parser.parse_args()
    out = Path(args.out or f"whisper_{args.size}_encoder")
    if not args.convert_only:
        snapshot(args.size, out, args.precision)
    check_convert(out)
