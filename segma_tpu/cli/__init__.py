"""``segma-tpu`` console command: one dispatcher over every entry point.

``pip install -e . && segma-tpu predict --help`` — the ``scripts/`` tree
remains as thin parity shims over the same functions (the reference keeps
its CLIs in ``scripts/``; this package-internal home is what makes the
console_scripts packaging possible).
"""

from __future__ import annotations

import sys

_COMMANDS = {
    "train": ("segma_tpu.cli.train", "full training run"),
    "auto-train": (
        "segma_tpu.cli.auto_train",
        "training with --auto-resume/--run-id (cluster requeue contract)",
    ),
    "predict": (
        "segma_tpu.inference",
        "sliding-window inference over WAV files -> RTTM",
    ),
    "tune": ("segma_tpu.tune", "per-label threshold grid search"),
    "evaluate": (
        "segma_tpu.evaluate",
        "macro-average F-measure / DER vs ground-truth RTTM",
    ),
    "serve": ("segma_tpu.cli.serve", "HTTP serving (batch + streaming)"),
    "export": (
        "segma_tpu.cli.export",
        "freeze a trained model into a StableHLO artifact",
    ),
    "import": (
        "segma_tpu.cli.import_checkpoint",
        "convert a reference torch checkpoint",
    ),
    "bundle": (
        "segma_tpu.cli.bundle",
        "catalog a directory of artifacts for multi-model serving",
    ),
    "doctor": (
        "segma_tpu.cli.doctor",
        "environment diagnostics (devices, cache, mesh, stall probe)",
    ),
}


def _usage() -> str:
    lines = ["usage: segma-tpu <command> [args]", "", "commands:"]
    for name, (_, desc) in _COMMANDS.items():
        lines.append(f"  {name:<12} {desc}")
    lines.append("")
    lines.append("run `segma-tpu <command> --help` for command arguments")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        return
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}\n\n{_usage()}", file=sys.stderr)
        raise SystemExit(2)
    import importlib

    module = importlib.import_module(_COMMANDS[cmd][0])
    module.main(argv[1:])
