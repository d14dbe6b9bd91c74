"""Metrics logging: JSONL + stdout, with optional wandb mirroring.

Replaces the reference's WandbLogger + ``print("[log] ...")`` combination
(``scripts/train.py:103-136``); wandb is optional and absent environments
degrade to local logging transparently.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsLogger:
    """Append-only JSONL metrics stream with console echo."""

    def __init__(
        self,
        path: Path | str | None = None,
        wandb_config: dict | None = None,
        echo: bool = True,
    ) -> None:
        self.path = Path(path) if path is not None else None
        if self.path is not None:
            self.path.parent.mkdir(parents=True, exist_ok=True)
        self.echo = echo
        self._wandb = None
        if wandb_config is not None:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(**wandb_config)
            except Exception:
                self._wandb = None

    def log(self, metrics: dict) -> None:
        record = {"ts": time.time(), **metrics}
        if self.path is not None:
            with self.path.open("a") as f:
                f.write(json.dumps(record) + "\n")
        if self.echo:
            short = {
                k: (round(v, 5) if isinstance(v, float) else v)
                for k, v in metrics.items()
            }
            print(f"[log] - {short}", flush=True)
        if self._wandb is not None:
            self._wandb.log(metrics)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def log(msg: str) -> None:
    """Timestamped console log line."""
    print(f"[log @ {time.strftime('%Y%m%d_%H:%M:%S')}] - {msg}", flush=True)
