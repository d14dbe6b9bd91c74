"""Export CLI: freeze a trained model into a self-contained artifact.

Production-deployment extension beyond the reference (segma_tpu addition):
the output directory carries serialized StableHLO programs (params baked
in) + a JSON manifest, served by ``segma_tpu.export.ExportedPipeline``.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv: list[str] | None = None) -> None:
    from segma_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

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
    parser.add_argument("--batch_size", "--batch-size", default=64, type=int)
    parser.add_argument(
        "--platforms", nargs="*", default=["cpu", "tpu"],
        help="lowering targets baked into the artifact. NOTE: multi-"
        "platform tracing uses the portable mel frontend — whisper-family "
        "exports can flip the odd borderline frame vs the live TPU path; "
        "pass 'tpu' alone for byte-identical TPU-only artifacts",
    )
    parser.add_argument(
        "--model-version", default=None,
        help="free-form version string stamped into the manifest "
        "(surfaced by bundle catalogs and GET /v1/models)",
    )
    parser.add_argument(
        "--stream-batches", type=int, nargs="*", default=[2, 4, 8],
        help="cross-session streaming batch buckets (each program embeds "
        "a weight copy; pass nothing after the flag to ship only the "
        "single-chunk stream program)",
    )
    args, extra = parser.parse_known_args(argv)

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
        model_version=args.model_version,
        stream_batches=tuple(args.stream_batches),
    )
    n_bytes = sum(p.stat().st_size for p in Path(out).glob("*"))
    print(f"[log] - exported {model.name} -> {out} ({n_bytes / 1e6:.1f} MB)")
