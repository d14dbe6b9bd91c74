"""Hyperparameter-sweep generator (parity: reference
``scripts/gen_experiments.py:7-48``): build N experiments over a parameter
grid and write a ``meta_run.sh`` that submits them all.
"""

from __future__ import annotations

import argparse
import sys
from itertools import product
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.utils.experiment import Experiment


def gen_sweep(
    config: str,
    grid: dict[str, list],
    out_dir: Path,
    target: str = "slurm",
) -> Path:
    """Cartesian-product sweep over dotted config keys."""
    out_dir.mkdir(parents=True, exist_ok=True)
    keys = list(grid)
    lines = ["#!/bin/bash", "set -eu"]
    for values in product(*(grid[k] for k in keys)):
        overrides = [f"{k}={v}" for k, v in zip(keys, values)]
        exp = Experiment(
            config_path=config, target=target, extra_train_args=overrides
        )
        paths = exp.write(out_dir)
        submit = "sbatch" if target == "slurm" else "bash"
        lines.append(f"{submit} {paths['run']}")
    meta = out_dir / "meta_run.sh"
    meta.write_text("\n".join(lines) + "\n")
    meta.chmod(0o755)
    return meta


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default="segma_tpu/config/default.yml")
    parser.add_argument("--out", default="experiments")
    parser.add_argument("--target", default="slurm", choices=["slurm", "xpk"])
    parser.add_argument(
        "--grid",
        nargs="*",
        default=["data.dataset_multiplier=0.1,0.3,0.5,0.7,0.9"],
        help="key=v1,v2,... sweep entries",
    )
    args = parser.parse_args()

    grid = {}
    for item in args.grid:
        key, _, vals = item.partition("=")
        grid[key] = vals.split(",")
    meta = gen_sweep(args.config, grid, Path(args.out), target=args.target)
    print(f"[log] - wrote {meta}")
