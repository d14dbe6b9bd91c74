"""Export a trained model as a self-contained serving artifact.

Production-deployment extension beyond the reference (segma_tpu addition):
the output directory carries serialized StableHLO programs (params baked
in) + a JSON manifest, and serves via ``segma_tpu.export.ExportedPipeline``
with no model zoo, registry, or checkpoint handling in the serving process.

Usage:
    python scripts/export.py --config models/<run>/config.yml \
        --checkpoint models/<run>/checkpoints/best.ckpt \
        --output artifacts/<run> [--thresholds best_thresholds.yml] \
        [--transport int16] [--buckets 8 32 128 512]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="segma_tpu artifact export")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default="models/last/best.ckpt")
    parser.add_argument("--output", required=True)
    parser.add_argument("--thresholds", default=None)
    parser.add_argument(
        "--transport", default="int16",
        choices=["int16", "mulaw", "adpcm", "f32"],
    )
    parser.add_argument("--buckets", type=int, nargs="*", default=[8, 32, 128, 512])
    parser.add_argument("--batch_size", "--batch-size", default=128, type=int)
    parser.add_argument(
        "--platforms", nargs="*", default=["cpu", "tpu"],
        help="lowering targets baked into the artifact",
    )
    args, extra = parser.parse_known_args()

    from segma_tpu.checkpoint import load_model_for_inference
    from segma_tpu.config import load_config
    from segma_tpu.export import export_inference
    from segma_tpu.inference import load_thresholds

    thresholds = load_thresholds(args.thresholds)
    cfg = load_config(args.config, extra)
    model = load_model_for_inference(cfg, args.checkpoint)
    out = export_inference(
        model,
        args.output,
        thresholds=thresholds,
        buckets=tuple(args.buckets),
        batch_size=args.batch_size,
        transport=args.transport,
        platforms=tuple(args.platforms),
    )
    n_bytes = sum(p.stat().st_size for p in Path(out).glob("*"))
    print(f"[log] - exported {model.name} -> {out} ({n_bytes / 1e6:.1f} MB)")
