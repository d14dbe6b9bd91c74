"""Experiment orchestration: run ids, cluster scripts with auto-requeue.

Role of the reference ``src/segma/utils/experiment.py:21-238``: generate a
self-resubmitting training job script plus a companion predict+evaluate
script, under a human-readable run id (timestamp + random word).

Two targets are emitted:
- ``slurm``: sbatch scripts whose resilience loop resubmits the job with
  ``--dependency=afterany:$SLURM_JOBID`` until a ``finished`` sentinel file
  exists (the reference's recovery mechanism, ``experiment.py:175-188``);
- ``xpk``: an XPK/GKE-style TPU workload launcher (the TPU-native cluster
  path; the same sentinel + auto-resume semantics are delegated to
  ``--restart-on-user-code-failure`` plus ``auto_train.py --auto-resume``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

# compact built-in word list (reference ships a 3,198-word file;
# readable uniqueness comes from the timestamp anyway)
WORD_LIST = [
    f"{a}{b}"
    for a in (
        "amber", "basalt", "cobalt", "dune", "ember", "fjord", "garnet",
        "heron", "indigo", "jasper", "krill", "lagoon", "moss", "nimbus",
        "onyx", "pampa", "quartz", "reef", "sepia", "tundra", "umber",
        "vortex", "willow", "xenon", "yarrow", "zephyr",
    )
    for b in ("", "-north", "-south", "-east", "-west")
]


def new_experiment_id(rng: np.random.Generator | None = None) -> str:
    """``YYYYMMDD_HHMMSS-<word>`` run identifier."""
    rng = rng or np.random.default_rng()
    word = WORD_LIST[int(rng.integers(len(WORD_LIST)))]
    return time.strftime("%Y%m%d_%H%M%S") + f"-{word}"


@dataclass
class Experiment:
    """Generates cluster job scripts for one training run."""

    config_path: str
    target: str = "slurm"  # slurm | xpk
    run_id: str = field(default_factory=new_experiment_id)
    output_root: str = "models"
    partition: str = "gpu"
    time_limit: str = "48:00:00"
    mem: str = "100G"
    cpus: int = 24
    tpu_type: str = "v5litepod-8"
    docker_image: str = "segma-tpu:latest"
    extra_train_args: list[str] = field(default_factory=list)

    @property
    def run_dir(self) -> Path:
        return Path(self.output_root) / self.run_id

    def train_command(self) -> str:
        args = " ".join(self.extra_train_args)
        return (
            f"python scripts/auto_train.py -c {self.config_path} "
            f"--auto-resume --run-id {self.run_id} --output {self.output_root} "
            f"{args}".strip()
        )

    def pred_eval_command(self, dataset: str, wavs: str) -> str:
        ckpt = self.run_dir / "checkpoints" / "best.ckpt"
        out = self.run_dir / "predictions"
        return "\n".join(
            [
                f"python scripts/predict.py --config {self.run_dir}/config.yml "
                f"--wavs {wavs} --uris {dataset}/test.txt --checkpoint {ckpt} "
                f"--output {out} --save-logits",
                f"python scripts/evaluate.py --gt {dataset}/rttm "
                f"--pred {out}/raw_rttm -c {self.run_dir}/config.yml",
            ]
        )

    # -- script generation ------------------------------------------------------
    def slurm_script(self) -> str:
        """Training sbatch script with the self-requeue resilience loop."""
        return f"""#!/bin/bash
#SBATCH --job-name=segma-{self.run_id}
#SBATCH --partition={self.partition}
#SBATCH --time={self.time_limit}
#SBATCH --mem={self.mem}
#SBATCH --cpus-per-task={self.cpus}
#SBATCH --output=logs/{self.run_id}-%j.out

set -u
RUN_DIR={self.run_dir}
mkdir -p "$RUN_DIR" logs

# resilience: resubmit this script after this job ends (any exit state)
# until the training loop drops the `finished` sentinel
if [ -f "$RUN_DIR/finished" ]; then
    # successor job queued before the run completed: nothing left to do
    # (without this guard it would auto-resume a finished run and train
    # at least one extra epoch over its checkpoints)
    exit 0
fi
sbatch --dependency=afterany:$SLURM_JOBID "$0"

{self.train_command()}
status=$?

# only a COMPLETED run drops the sentinel: interrupted/self-recycled runs
# exit 75 (EX_TEMPFAIL) and must be picked up by the queued successor job
[ "$status" -eq 0 ] && touch "$RUN_DIR/finished"
exit "$status"
"""

    def xpk_script(self) -> str:
        """XPK-style TPU workload launcher."""
        return f"""#!/bin/bash
# TPU workload via xpk (GKE). Requires a provisioned cluster.
set -eu
xpk workload create \\
  --workload segma-{self.run_id} \\
  --tpu-type {self.tpu_type} \\
  --docker-image {self.docker_image} \\
  --restart-on-user-code-failure \\
  --command "{self.train_command()}"
"""

    def pred_eval_script(self, dataset: str, wavs: str) -> str:
        return f"""#!/bin/bash
#SBATCH --job-name=segma-pe-{self.run_id}
#SBATCH --partition={self.partition}
#SBATCH --time=20:00:00
#SBATCH --mem=40G
#SBATCH --output=logs/{self.run_id}-pe-%j.out

set -eu
{self.pred_eval_command(dataset, wavs)}
"""

    def write(self, out_dir: Path | str = "experiments") -> dict[str, Path]:
        # a sweep can generate several experiments within one second; if
        # the timestamp+word id collides with a sibling (~1/130 chance per
        # pair), suffix a counter rather than silently overwriting its
        # scripts
        base, n = self.run_id, 2
        while (Path(out_dir) / self.run_id).exists():
            self.run_id = f"{base}-{n}"
            n += 1
        out_dir = Path(out_dir) / self.run_id
        out_dir.mkdir(parents=True, exist_ok=True)
        paths = {}
        if self.target == "slurm":
            paths["run"] = out_dir / "run.sh"
            paths["run"].write_text(self.slurm_script())
        else:
            paths["run"] = out_dir / "run_xpk.sh"
            paths["run"].write_text(self.xpk_script())
        for p in paths.values():
            p.chmod(0o755)
        return paths

    def write_pred_eval(
        self, dataset: str, wavs: str, out_dir: Path | str = "experiments"
    ) -> Path:
        out_dir = Path(out_dir) / self.run_id
        out_dir.mkdir(parents=True, exist_ok=True)
        p = out_dir / "pred_eval.sh"
        p.write_text(self.pred_eval_script(dataset, wavs))
        p.chmod(0o755)
        return p
