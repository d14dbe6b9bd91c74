"""Experiment orchestration tests."""

from pathlib import Path

import numpy as np

from segma_tpu.utils.experiment import Experiment, new_experiment_id


def test_new_experiment_id_format():
    rid = new_experiment_id(np.random.default_rng(0))
    stamp, word = rid.split("-", 1)
    assert len(stamp) == 15 and stamp[8] == "_"
    assert word


def test_slurm_script_self_requeues(tmp_path):
    exp = Experiment(config_path="cfg.yml", run_id="test-run", target="slurm")
    paths = exp.write(tmp_path)
    script = paths["run"].read_text()
    assert "--dependency=afterany:$SLURM_JOBID" in script
    assert "finished" in script
    # the sentinel is gated on exit status: an interrupted/self-recycled
    # run (exit 75) must NOT mark itself finished, or the queued successor
    # would refuse to resume it
    assert '[ "$status" -eq 0 ] && touch "$RUN_DIR/finished"' in script
    assert "auto_train.py" in script and "--auto-resume" in script
    assert paths["run"].stat().st_mode & 0o111  # executable


def test_xpk_script(tmp_path):
    exp = Experiment(config_path="cfg.yml", run_id="r", target="xpk")
    paths = exp.write(tmp_path)
    script = paths["run"].read_text()
    assert "xpk workload create" in script
    assert "--tpu-type v5litepod-8" in script


def test_pred_eval_script(tmp_path):
    exp = Experiment(config_path="cfg.yml", run_id="r")
    p = exp.write_pred_eval("data/ds", "data/ds/wav", tmp_path)
    s = p.read_text()
    assert "predict.py" in s and "evaluate.py" in s
    assert "best.ckpt" in s


def test_gen_sweep(tmp_path):
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.gen_experiments import gen_sweep

    meta = gen_sweep(
        "cfg.yml",
        {"data.dataset_multiplier": [0.1, 0.5], "train.lr": [1e-3]},
        tmp_path,
    )
    lines = meta.read_text().strip().split("\n")
    assert sum("sbatch" in ln for ln in lines) == 2
    # each generated run.sh carries its overrides
    run_scripts = list(tmp_path.glob("*/run.sh"))
    assert len(run_scripts) == 2
    joined = "".join(p.read_text() for p in run_scripts)
    assert "data.dataset_multiplier=0.1" in joined
    assert "train.lr=0.001" in joined


def test_same_second_sweep_never_collides(tmp_path, monkeypatch):
    """Two experiments generated in the same second with the SAME drawn
    word must not overwrite each other (regression: probabilistic suite
    failure — write() re-draws the id on collision)."""
    import numpy as np

    from segma_tpu.utils import experiment as exp_mod

    # force the word draw deterministic so the ids WOULD collide
    orig_rng = np.random.default_rng
    monkeypatch.setattr(
        exp_mod.np.random, "default_rng", lambda *a, **k: orig_rng(0)
    )
    e1 = exp_mod.Experiment(config_path="c.yml")
    e1.write(tmp_path)
    e2 = exp_mod.Experiment(config_path="c.yml")
    e2.write(tmp_path)
    assert e1.run_id != e2.run_id
    assert len(list(tmp_path.glob("*/run.sh"))) == 2
