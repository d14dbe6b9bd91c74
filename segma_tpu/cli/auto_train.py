"""Resumable training CLI (parity: reference ``scripts/auto_train.py:69-251``).

``--auto-resume`` continues from the run's ``last`` checkpoint, ``--run-id``
pins the run directory (and logging id), ``--output`` overrides the
experiment root. Designed to be driven by the self-requeueing cluster
scripts from ``segma_tpu.utils.experiment``.
"""

from __future__ import annotations

from pathlib import Path

from segma_tpu.cli.train import build_argparser, run_training
from segma_tpu.config import load_config
from segma_tpu.utils.logging import log


def main(argv: list[str] | None = None) -> None:
    parser = build_argparser()
    parser.add_argument(
        "--auto-resume",
        action="store_true",
        help="resume from the run's last checkpoint if present",
    )
    parser.add_argument("--run-id", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    args, extra_args = parser.parse_known_args(argv)

    cfg = load_config(config_path=args.config, cli_extra_args=extra_args)

    resume_from = args.resume_from
    if args.auto_resume and resume_from is None and args.run_id:
        root = (
            Path(args.output)
            if args.output
            else Path(cfg.model.chkp_path or "models")
        )
        from segma_tpu.checkpoint import find_resumable

        # newest VALID resume point (last/, else a surviving epoch dir) —
        # a corrupted last/ must not turn the SLURM requeue contract into
        # a crash loop
        resumable = find_resumable(root / args.run_id / "checkpoints")
        if resumable is not None:
            resume_from = resumable
            log(f"auto-resume from {resumable}")
        else:
            log(
                "auto-resume requested but no (valid) checkpoint found; "
                "fresh run"
            )

    result = run_training(
        cfg,
        args.tags,
        resume_from=resume_from,
        run_id=args.run_id,
        output=args.output,
    )
    if result.get("interrupted"):
        # preempted or self-recycled: EX_TEMPFAIL keeps the requeue loop
        # alive (the `finished` sentinel is gated on exit 0)
        raise SystemExit(75)
