"""MetricsLogger: JSONL stream, wandb mirror (mocked at the module API
boundary), and per-step train-loss logging through a real Trainer fit
(reference on_step logging parity, reference models/base.py:171-187)."""

import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.utils.logging import MetricsLogger

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


class _FakeRun:
    def __init__(self):
        self.logged: list[dict] = []
        self.finished = False

    def log(self, metrics):
        self.logged.append(dict(metrics))

    def finish(self):
        self.finished = True


@pytest.fixture
def fake_wandb(monkeypatch):
    """Inject a recording stand-in for the wandb module API boundary."""
    run = _FakeRun()
    mod = types.ModuleType("wandb")
    mod.init = lambda **kwargs: (setattr(mod, "init_kwargs", kwargs), run)[1]
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod, run


def test_wandb_mirror_receives_same_keys_as_jsonl(tmp_path, fake_wandb):
    mod, run = fake_wandb
    logger = MetricsLogger(
        tmp_path / "metrics.jsonl",
        wandb_config={"project": "p", "name": "n"},
        echo=False,
    )
    assert mod.init_kwargs == {"project": "p", "name": "n"}
    logger.log({"train/loss": 1.0, "epoch": 0})
    logger.log({"val/loss": 0.5, "val/f1_score": 0.9, "epoch": 0})
    logger.finish()

    jsonl = [
        json.loads(line)
        for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(jsonl) == len(run.logged) == 2
    for rec, mirrored in zip(jsonl, run.logged):
        assert set(rec) - {"ts"} == set(mirrored)
        for k in mirrored:
            assert rec[k] == mirrored[k]
    assert run.finished


def test_wandb_absent_is_silent(tmp_path, monkeypatch):
    """No wandb installed -> JSONL still works, mirror silently off."""
    import builtins

    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError("no wandb")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_wandb)
    logger = MetricsLogger(
        tmp_path / "m.jsonl", wandb_config={"project": "p"}, echo=False
    )
    logger.log({"a": 1})
    logger.finish()
    assert (tmp_path / "m.jsonl").exists()


def test_per_step_logging_and_wandb_mirror_in_fit(
    synthetic_dataset, tmp_path, fake_wandb
):
    """A real (tiny) Trainer fit emits per-step train/loss_step and per-head
    step losses at the configured cadence, both to metrics.jsonl and to the
    wandb mirror."""
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.train import Trainer
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            f"data.dataset_path={synthetic_dataset}",
            "data.classes=[male,female,key_child,other_child]",
            "data.dataset_multiplier=0.3",
            "model.name=conv_vad",
            "model.config={hidden: 32, depth: 1, dtype: f32}",
            "audio.chunk_duration_s=1.0",
            "train.batch_size=4",
            "train.max_epochs=1",
            "train.seed=0",
            "train.log_every_n_steps=2",
            "wandb.offline=true",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)

    _, run = fake_wandb
    run_dir = tmp_path / "run"
    logger = MetricsLogger(
        run_dir / "metrics.jsonl", wandb_config={"project": "p"}, echo=False
    )
    trainer = Trainer(model=model, config=cfg, run_dir=run_dir, logger=logger)
    trainer.fit(dm)

    jsonl = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    step_recs = [r for r in jsonl if "train/loss_step" in r]
    assert step_recs, "no per-step records at log_every_n_steps=2"
    labels = ("male", "female", "key_child", "other_child")
    for r in step_recs:
        assert r["step"] % 2 == 0
        for label in labels:
            assert f"train/loss_step_{label}" in r
        assert np.isfinite(r["train/loss_step"])
    # hydra-style conv_vad: per-head step losses are real per-label values
    last = step_recs[-1]
    vals = {round(last[f"train/loss_step_{label}"], 8) for label in labels}
    assert len(vals) > 1
    # every jsonl record is mirrored to wandb with identical keys
    mirrored_step = [m for m in run.logged if "train/loss_step" in m]
    assert len(mirrored_step) == len(step_recs)
    assert set(mirrored_step[-1]) == set(last) - {"ts"}
