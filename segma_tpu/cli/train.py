"""Training CLI (parity: reference ``scripts/train.py:48-200``).

Importable home of the training entry point; ``scripts/train.py`` and the
``segma-tpu train`` console command are thin shims over :func:`main`.
"""

from __future__ import annotations

import argparse
import time
from datetime import datetime
from pathlib import Path

from typing import Any

from segma_tpu.config import Config, load_config
from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
from segma_tpu.models import Models
from segma_tpu.parallel.mesh import make_mesh
from segma_tpu.train import Trainer
from segma_tpu.utils import set_seed
from segma_tpu.utils.encoders import MultiLabelEncoder
from segma_tpu.utils.logging import MetricsLogger, log


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c",
        "--config",
        type=str,
        default="segma_tpu/config/default.yml",
        help="Config file to be loaded and used for the training.",
    )
    parser.add_argument(
        "--tags", nargs="*", default=[], help="Tags for the logging instance."
    )
    parser.add_argument(
        "--resume-from", type=str, default=None, help="Checkpoint to resume from."
    )
    return parser


def fast_context_hint(cfg: Config) -> str | None:
    """One-line steer toward the measured-better whisper operating point.

    The padded 30 s context spends ~7.5x the useful attention/MLP work on
    padding (BENCH_REPORT.md MFU tables: 4.38 ms vs 75.7 ms per 32x4 s
    forward, 32.2% vs 19.2% MFU). ``fast_context=true`` removes that waste
    and is numerically self-consistent as long as training and inference
    use the same setting — only parity with reference-trained padded
    checkpoints (``audio.reference_tail`` mode) needs the padded default.
    Returns the hint for a NEW whisper-family training that left both off,
    else None."""
    mc = cfg.model.config
    if not hasattr(mc, "fast_context") or mc.fast_context:
        return None
    if cfg.audio.reference_tail:
        return None  # parity mode: the padded context is the point
    return (
        "hint: model.config.fast_context=true runs the whisper encoder on "
        "the chunk's own frames instead of the padded 30 s context — "
        "measured ~17x faster forward (32.2% vs 19.2% MFU at 4 s chunks, "
        "BENCH_REPORT.md). Numerics differ from the padded reference; use "
        "it for NEW trainings (train and infer with the same setting), "
        "keep the default for reference-parity checkpoints."
    )


def run_training(
    cfg: Config,
    tags: list[str],
    resume_from: str | None = None,
    run_id: str | None = None,
    output: str | None = None,
) -> dict[str, Any]:
    from segma_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if cfg.train.debug_nans:
        __import__("jax").config.update("jax_debug_nans", True)
    if cfg.train.seed is not None:  # 0 is a valid seed
        set_seed(cfg.train.seed)

    if "hydra" not in cfg.model.name and "vad" not in cfg.model.name:
        raise ValueError("Only `MultiLabelEncoder` is supported")
    l_encoder = MultiLabelEncoder(labels=cfg.data.classes)

    model = Models[cfg.model.name](l_encoder, cfg)

    hint = fast_context_hint(cfg)
    if hint:
        log(hint)

    log("SegmentationDataLoader initializing ...")
    sfd = SegmaFileDataset.from_config(cfg)
    sfd.load()
    dm = SegmentationDataLoader(
        dataset=sfd,
        label_encoder=l_encoder,
        config=cfg,
        conv_settings=model.conv_settings,
    )
    log("SegmentationDataLoader initialized")

    import jax

    chkp_root = Path(output) if output else Path(cfg.model.chkp_path or "models")
    stamp = run_id or datetime.fromtimestamp(time.time()).strftime("%Y%m%d_%H%M%S")
    run_dir = chkp_root / stamp
    # multi-host: process 0 is the single writer for the run dir (same
    # election Trainer applies to checkpoints) — every other controller
    # keeps identical in-memory state but writes no files and starts no
    # wandb run
    is_main = jax.process_index() == 0
    if is_main:
        run_dir.mkdir(parents=True, exist_ok=True)
        cfg.save(run_dir / "config.yml")

    wandb_cfg = None
    if not cfg.wandb.offline and is_main:
        wandb_cfg = {
            "project": cfg.wandb.project,
            "name": cfg.wandb.name,
            "tags": tags,
            "config": cfg.as_dict(),
        }
    logger = MetricsLogger(
        run_dir / "metrics.jsonl" if is_main else None,
        wandb_config=wandb_cfg,
        echo=is_main,
    )

    mesh = make_mesh(cfg) if len(jax.devices()) > 1 else None
    trainer = Trainer(
        model=model, config=cfg, run_dir=run_dir, mesh=mesh, logger=logger
    )
    log("started training")
    result = trainer.fit(dm, resume_from=resume_from)

    if result.get("interrupted"):
        # preempted: last/ holds the resumable state; requeue with
        # --auto-resume (the SLURM scripts do this automatically)
        log(f"preempted — resume from {run_dir / 'checkpoints' / 'last'}")
        return result

    if is_main:
        # static best-model pointer (reference symlinks models/last/best.ckpt);
        # atomic replace so a concurrent reader never sees a missing link
        import os

        static_p = Path("models/last")
        static_p.mkdir(parents=True, exist_ok=True)
        best_link = static_p / "best.ckpt"
        tmp_link = static_p / f".best.ckpt.{os.getpid()}"
        tmp_link.unlink(missing_ok=True)
        tmp_link.symlink_to(Path(result["best_path"]).resolve())
        os.replace(tmp_link, best_link)

    log(f"best model score: {result['best_score']}")
    log(f"best model path: {result['best_path']}")
    return result


def main(argv: list[str] | None = None) -> None:
    args, extra_args = build_argparser().parse_known_args(argv)
    cfg = load_config(config_path=args.config, cli_extra_args=extra_args)
    result = run_training(cfg, args.tags, resume_from=args.resume_from)
    if result.get("interrupted"):
        # preempted or self-recycled: exit EX_TEMPFAIL so the requeue
        # script does NOT drop the `finished` sentinel — the successor job
        # auto-resumes from last/
        raise SystemExit(75)
