"""WavLM encoder snapshotter (parity: reference
``scripts/save_load_wavlm.py:6-41``): download a WavLM model at a chosen
precision and save it locally for offline use.

Requires network access for the download step.
"""

from __future__ import annotations

import argparse
from pathlib import Path

MODELS = {
    "base": "microsoft/wavlm-base",
    "base-plus": "microsoft/wavlm-base-plus",
    "large": "microsoft/wavlm-large",
}

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", default="base", choices=list(MODELS))
    parser.add_argument("--precision", default="fp32", choices=["fp32", "fp16", "bf16"])
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import torch
    from transformers import WavLMModel

    dtype = {
        "fp32": torch.float32,
        "fp16": torch.float16,
        "bf16": torch.bfloat16,
    }[args.precision]
    out = Path(args.out or f"wavlm_{args.size}")
    model = WavLMModel.from_pretrained(MODELS[args.size], torch_dtype=dtype)
    out.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(out)
    print(f"[log] - saved {MODELS[args.size]} to {out}")
