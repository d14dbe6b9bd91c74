"""Training loop tests: scheduler/early-stop semantics, checkpoint manager,
and an end-to-end overfit smoke run on synthetic data."""

from pathlib import Path

import numpy as np
import pytest

from segma_tpu.checkpoint import (
    CheckpointManager,
    load_params,
    resolve_checkpoint,
    save_params,
)
from segma_tpu.config import load_config
from segma_tpu.train import (
    EarlyStopping,
    ReduceLROnPlateau,
    Trainer,
    get_metric,
)

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


# ---------------------------------------------------------------------------
# Host-side control logic
# ---------------------------------------------------------------------------


def test_get_metric():
    assert get_metric("loss") == ("min", "val/loss")
    assert get_metric("f1_score") == ("max", "val/f1_score")
    assert get_metric("auroc") == ("max", "val/auroc")
    with pytest.raises(ValueError):
        get_metric("bogus")


def test_reduce_lr_on_plateau():
    sched = ReduceLROnPlateau("min", patience=2, factor=0.1)
    assert not sched.step(1.0)
    assert not sched.step(0.9)  # improved
    assert not sched.step(0.95)  # bad 1
    assert not sched.step(0.95)  # bad 2
    assert sched.step(0.95)  # bad 3 > patience -> reduce
    assert sched.scale == pytest.approx(0.1)


def test_early_stopping():
    es = EarlyStopping("min", patience=3)
    vals = [1.0, 0.9, 0.95, 0.95, 0.95]
    stops = [es.step(v) for v in vals]
    assert stops == [False, False, False, False, True]


def test_checkpoint_manager_topk_best_last(tmp_path):
    mgr = CheckpointManager(tmp_path, monitor="val/loss", mode="min", save_top_k=2)
    params = {"heads": {"kernel": np.ones((2, 2), np.float32)}}
    for epoch, score in enumerate([0.5, 0.3, 0.4, 0.6]):
        p = {"heads": {"kernel": np.full((2, 2), score, np.float32)}}
        mgr.step(epoch, score, p, meta={})
    # top-2 kept: 0.3 and 0.4
    kept_scores = sorted(s for s, _ in mgr.kept)
    assert kept_scores == [0.3, 0.4]
    assert mgr.best_score == 0.3
    # best symlink resolves to the 0.3 checkpoint
    best = resolve_checkpoint(tmp_path / "best.ckpt")
    restored = load_params(best, params)
    assert restored["heads"]["kernel"][0, 0] == np.float32(0.3)
    # last/ holds the most recent (0.6)
    last = load_params(tmp_path / "last", params)
    assert last["heads"]["kernel"][0, 0] == np.float32(0.6)


def test_save_load_roundtrip(tmp_path):
    tree = {"a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    save_params(tmp_path / "ck", tree, meta={"epoch": 3})
    out = load_params(tmp_path / "ck", tree)
    np.testing.assert_array_equal(out["a"]["w"], tree["a"]["w"])
    from segma_tpu.checkpoint import load_meta

    assert load_meta(tmp_path / "ck")["epoch"] == 3


# ---------------------------------------------------------------------------
# End-to-end overfit smoke test
# ---------------------------------------------------------------------------


@pytest.fixture
def train_cfg(synthetic_dataset):
    return load_config(
        CONFIG_DIR / "default.yml",
        [
            f"data.dataset_path={synthetic_dataset}",
            "data.classes=[male,female,key_child,other_child]",
            "data.dataset_multiplier=0.3",
            "model.name=conv_vad",
            "model.config={hidden: 32, depth: 1, dtype: f32}",
            "audio.chunk_duration_s=1.0",
            "train.batch_size=4",
            "train.max_epochs=3",
            "train.seed=0",
            "train.lr=0.003",
            "wandb.offline=true",
        ],
    )


def test_cosine_lr_function():
    from segma_tpu.train import cosine_lr

    # warmup ramps linearly to base
    assert cosine_lr(0, 1.0, 100, warmup_steps=10) == pytest.approx(0.1)
    assert cosine_lr(9, 1.0, 100, warmup_steps=10) == pytest.approx(1.0)
    # midpoint of decay = half of base (min_ratio 0)
    assert cosine_lr(55, 1.0, 100, warmup_steps=10) == pytest.approx(0.5)
    # end of schedule hits the floor
    assert cosine_lr(100, 1.0, 100, warmup_steps=10) == pytest.approx(0.0)
    assert cosine_lr(100, 1.0, 100, warmup_steps=10, min_lr_ratio=0.1) == (
        pytest.approx(0.1)
    )
    # monotone non-increasing after warmup
    vals = [cosine_lr(s, 1.0, 100, warmup_steps=10) for s in range(10, 101)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_cosine_schedule_in_fit(train_cfg, tmp_path):
    """train.scheduler.type=cosine: the logged LR decays over epochs and
    training still converges."""
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = train_cfg  # function-scoped fixture: safe to mutate
    cfg.train.scheduler.type = "cosine"
    cfg.train.scheduler.warmup_steps = 2
    cfg.train.scheduler.min_lr_ratio = 0.1
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    trainer = Trainer(model=model, config=cfg, run_dir=tmp_path / "run")
    result = trainer.fit(dm)
    hist = result["history"]
    lrs = [h["lr"] for h in hist]
    assert lrs[-1] < lrs[0]  # decayed
    assert lrs[-1] >= 0.1 * cfg.train.lr - 1e-9  # floor respected
    assert hist[-1]["train/loss"] < hist[0]["train/loss"]


def test_grad_accumulation_matches_full_batch(train_cfg):
    """k micro-batches of size B with grad_accum_steps=k must produce the
    same parameter update as one batch of size k*B (mean losses over
    equal-sized micro-batches average exactly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segma_tpu.models import Models
    from segma_tpu.train import make_optimizer, make_train_step
    from segma_tpu.utils.encoders import MultiLabelEncoder

    enc = MultiLabelEncoder(train_cfg.data.classes)
    model = Models["conv_vad"](enc, train_cfg)
    params0 = model.init_params(jax.random.key(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16_000)), jnp.float32)
    y = jnp.asarray((rng.random((4, model.n_windows, 4)) > 0.8), jnp.float32)
    key = jax.random.key(7)

    # full batch, no accumulation
    opt_full = make_optimizer(model, 0.01)
    step_full = make_train_step(model, opt_full)
    p_full, _, loss_full, _ = step_full(
        jax.tree.map(jnp.copy, params0), opt_full.init(params0),
        {"x": x, "y": y}, key,
    )

    # two micro-batches with grad_accum_steps=2 (same dropout key so the
    # stochastic parts match per micro-batch pair... conv_vad has no
    # dropout, so keys are inert here)
    opt_acc = make_optimizer(model, 0.01, grad_accum_steps=2)
    step_acc = make_train_step(model, opt_acc)
    p_acc = jax.tree.map(jnp.copy, params0)
    s_acc = opt_acc.init(params0)
    for lo, hi in ((0, 2), (2, 4)):
        p_acc, s_acc, loss_acc, _ = step_acc(
            p_acc, s_acc, {"x": x[lo:hi], "y": y[lo:hi]}, key
        )
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # LR injection works through the MultiSteps wrapper
    from segma_tpu.train import get_learning_rate, set_learning_rate

    assert get_learning_rate(s_acc) == pytest.approx(0.01)
    s_acc = set_learning_rate(s_acc, 0.001)
    assert get_learning_rate(s_acc) == pytest.approx(0.001)


def test_grad_accum_params_frozen_between_updates(train_cfg):
    """With grad_accum_steps=2, the first micro-step must NOT change
    params (updates are zero until the accumulation window closes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segma_tpu.models import Models
    from segma_tpu.train import make_optimizer, make_train_step
    from segma_tpu.utils.encoders import MultiLabelEncoder

    enc = MultiLabelEncoder(train_cfg.data.classes)
    model = Models["conv_vad"](enc, train_cfg)
    params = model.init_params(jax.random.key(0))
    opt = make_optimizer(model, 0.01, grad_accum_steps=2)
    step = make_train_step(model, opt)
    state = opt.init(params)
    batch = {
        "x": jnp.zeros((2, 16_000), jnp.float32),
        "y": jnp.zeros((2, model.n_windows, 4), jnp.float32),
    }
    before = jax.tree.map(np.asarray, params)
    params, state, _, _ = step(params, state, batch, jax.random.key(1))
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_preemption_resumes_from_epoch_boundary(train_cfg, tmp_path):
    """A SIGTERM-style preemption mid-epoch stops after the in-flight step
    and leaves last/ at the last COMPLETED epoch (mid-epoch params are never
    persisted — replaying the epoch on top of them would double-apply its
    first steps); a fresh Trainer resumes from that boundary and finishes
    (role of SLURM's pre-kill SIGTERM; reference has no in-process handling
    at all)."""
    import signal

    from segma_tpu.checkpoint import load_meta
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    # host path: the test instruments trainer.train_step, which the
    # device-cache path rebuilds inside fit() (device-path preemption has
    # its own tests in test_device_cache.py)
    train_cfg.train.data_cache = "host"
    enc = MultiLabelEncoder(train_cfg.data.classes)
    model = Models["conv_vad"](enc, train_cfg)
    ds = SegmaFileDataset.from_config(train_cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, train_cfg, model.conv_settings)

    run_dir = tmp_path / "run"
    trainer = Trainer(model=model, config=train_cfg, run_dir=run_dir)
    # simulate SIGTERM arriving during the 3rd train step of epoch 1
    steps_per_epoch = len(dm.train_dataloader())
    orig_step = trainer.train_step
    calls = {"n": 0}

    def wrapped(*args):
        calls["n"] += 1
        if calls["n"] == steps_per_epoch + 3:
            trainer._handle_preempt_signal(signal.SIGTERM, None)
        return orig_step(*args)

    trainer.train_step = wrapped
    result = trainer.fit(dm)
    assert result["interrupted"] is True
    assert calls["n"] == steps_per_epoch + 3  # stopped after in-flight step
    # last/ holds epoch 0 (the completed one), not the interrupted epoch 1
    last = run_dir / "checkpoints" / "last"
    assert (last / "params.msgpack").exists()
    assert (last / "opt_state.msgpack").exists()
    assert load_meta(last)["epoch"] == 0

    # fresh trainer resumes from the boundary and completes epoch 1
    model2 = Models["conv_vad"](MultiLabelEncoder(train_cfg.data.classes),
                                train_cfg)
    t2 = Trainer(model=model2, config=train_cfg, run_dir=run_dir,
                 max_epochs=2)
    result2 = t2.fit(dm, resume_from=last)
    assert result2["interrupted"] is False
    assert [m["epoch"] for m in result2["history"]] == [1]
    assert result2["best_path"] is not None


def test_preemption_before_first_epoch_leaves_nothing(train_cfg, tmp_path):
    """Preempted before any epoch completes: nothing is persisted (a fresh
    start IS the exact redo) and the run reports interrupted."""
    import signal

    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    # host path: the wrapper below relies on train_step not being rebuilt
    # in fit() (the device-cache path rebuilds it)
    train_cfg.train.data_cache = "host"
    enc = MultiLabelEncoder(train_cfg.data.classes)
    model = Models["conv_vad"](enc, train_cfg)
    ds = SegmaFileDataset.from_config(train_cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, train_cfg, model.conv_settings)

    trainer = Trainer(model=model, config=train_cfg, run_dir=tmp_path / "run")
    orig_step = trainer.train_step

    def wrapped(*args):
        trainer._handle_preempt_signal(signal.SIGTERM, None)
        return orig_step(*args)

    trainer.train_step = wrapped
    result = trainer.fit(dm)
    assert result["interrupted"] is True
    assert not (tmp_path / "run" / "checkpoints" / "last").exists()


def test_trainer_fit_smoke(train_cfg, tmp_path):
    """Loss must go down over a few epochs on the sine-tone dataset, and the
    checkpoint layout must materialize."""
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    enc = MultiLabelEncoder(train_cfg.data.classes)
    model = Models["conv_vad"](enc, train_cfg)
    ds = SegmaFileDataset.from_config(train_cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, train_cfg, model.conv_settings)

    trainer = Trainer(model=model, config=train_cfg, run_dir=tmp_path / "run")
    result = trainer.fit(dm)

    hist = result["history"]
    assert len(hist) == 3
    assert hist[-1]["train/loss"] < hist[0]["train/loss"]
    assert np.isfinite(hist[-1]["val/loss"])
    assert "val/f1_score" in hist[-1]
    # checkpoints: best symlink + last + at least one epoch dir
    ckpt_dir = tmp_path / "run" / "checkpoints"
    assert (ckpt_dir / "best.ckpt").exists()
    assert (ckpt_dir / "last" / "params.msgpack").exists()
    # metrics stream written
    assert (tmp_path / "run" / "metrics.jsonl").exists()


def test_trainer_resume(train_cfg, tmp_path):
    """Resuming from last.ckpt continues at the right epoch."""
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    enc = MultiLabelEncoder(train_cfg.data.classes)
    ds = SegmaFileDataset.from_config(train_cfg)
    ds.load(use_cache=False)

    model = Models["conv_vad"](enc, train_cfg)
    dm = SegmentationDataLoader(ds, enc, train_cfg, model.conv_settings)
    t1 = Trainer(model=model, config=train_cfg, run_dir=tmp_path / "run", max_epochs=1)
    t1.fit(dm)

    model2 = Models["conv_vad"](enc, train_cfg)
    t2 = Trainer(
        model=model2, config=train_cfg, run_dir=tmp_path / "run2", max_epochs=2
    )
    result = t2.fit(dm, resume_from=tmp_path / "run" / "checkpoints" / "last")
    # epoch 0 done in run1 -> run2 starts at epoch 1
    assert result["history"][0]["epoch"] == 1


def test_resume_trajectory_exact(train_cfg, tmp_path):
    """Trajectory-exact resume: a run trained 1 epoch, checkpointed, and
    resumed for 2 more ends with BIT-IDENTICAL params to an uninterrupted
    3-epoch run. Crops and dropout keys derive from (seed, epoch) — not a
    stream position lost on restart — so preemption is invisible to the
    trajectory (num_workers=1 for deterministic batch order)."""
    import jax

    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = train_cfg
    cfg.train.dataloader.num_workers = 1
    # host path: the SIGTERM arm instruments trainer.train_step, which the
    # device-cache path rebuilds inside fit(); device-path exact resume is
    # pinned in test_device_cache.py
    cfg.train.data_cache = "host"

    enc = MultiLabelEncoder(cfg.data.classes)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)

    def leaves(params):
        trainable, _ = model_a.split_params(params)
        return [np.asarray(x) for x in jax.tree.leaves(trainable)]

    # uninterrupted 3-epoch run
    model_a = Models["conv_vad"](enc, cfg)
    dm_a = SegmentationDataLoader(ds, enc, cfg, model_a.conv_settings)
    ta = Trainer(model=model_a, config=cfg, run_dir=tmp_path / "a", max_epochs=3)
    ra = ta.fit(dm_a)

    # 1 epoch, then resume for epochs 1-2 in a fresh Trainer/model
    model_b = Models["conv_vad"](enc, cfg)
    dm_b = SegmentationDataLoader(ds, enc, cfg, model_b.conv_settings)
    tb1 = Trainer(model=model_b, config=cfg, run_dir=tmp_path / "b1", max_epochs=1)
    tb1.fit(dm_b)
    model_c = Models["conv_vad"](enc, cfg)
    dm_c = SegmentationDataLoader(ds, enc, cfg, model_c.conv_settings)
    tb2 = Trainer(model=model_c, config=cfg, run_dir=tmp_path / "b2", max_epochs=3)
    rb = tb2.fit(dm_c, resume_from=tmp_path / "b1" / "checkpoints" / "last")

    assert rb["history"][0]["epoch"] == 1
    for a, b in zip(leaves(ra["params"]), leaves(rb["params"])):
        np.testing.assert_array_equal(a, b)
    # and the logged loss trajectory matches too
    assert [m["train/loss"] for m in ra["history"][1:]] == [
        m["train/loss"] for m in rb["history"]
    ]

    # mid-epoch SIGTERM arm: preempt during epoch 1, resume, finish —
    # still bit-identical (resume redoes epoch 1 from the epoch-0
    # boundary; mid-epoch params are never persisted)
    import signal

    model_d = Models["conv_vad"](enc, cfg)
    dm_d = SegmentationDataLoader(ds, enc, cfg, model_d.conv_settings)
    td = Trainer(model=model_d, config=cfg, run_dir=tmp_path / "d", max_epochs=3)
    steps_per_epoch = len(dm_d.train_dataloader())
    orig_step = td.train_step
    calls = {"n": 0}

    def wrapped(*args):
        calls["n"] += 1
        if calls["n"] == steps_per_epoch + 2:  # 2nd step of epoch 1
            td._handle_preempt_signal(signal.SIGTERM, None)
        return orig_step(*args)

    td.train_step = wrapped
    rd1 = td.fit(dm_d)
    assert rd1["interrupted"] is True
    model_e = Models["conv_vad"](enc, cfg)
    dm_e = SegmentationDataLoader(ds, enc, cfg, model_e.conv_settings)
    te = Trainer(model=model_e, config=cfg, run_dir=tmp_path / "e", max_epochs=3)
    re_ = te.fit(dm_e, resume_from=tmp_path / "d" / "checkpoints" / "last")
    for a, b in zip(leaves(ra["params"]), leaves(re_["params"])):
        np.testing.assert_array_equal(a, b)


def test_trainer_auroc_metric(train_cfg, tmp_path):
    """validation_metric=auroc computes per-label AUROC and monitors it."""
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = train_cfg
    cfg.train.validation_metric = "auroc"
    cfg.train.extra_val_metrics = ["loss"]
    cfg.train.max_epochs = 1

    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    trainer = Trainer(model=model, config=cfg, run_dir=tmp_path / "run")
    result = trainer.fit(dm)
    m = result["history"][0]
    assert 0.0 <= m["val/auroc"] <= 1.0
    assert "val/auroc_male" in m


def test_auroc_np_exact():
    from segma_tpu.ops.metrics import binary_auroc_np

    scores = np.array([[0.9], [0.8], [0.3], [0.1]])
    targets = np.array([[1], [0], [1], [0]])
    # pairs: (0.9,0.8)+, (0.9,0.1)+, (0.3,0.8)-, (0.3,0.1)+ -> 3/4
    assert binary_auroc_np(scores, targets)[0] == pytest.approx(0.75)
    # degenerate labels -> 0.5
    assert binary_auroc_np(scores, np.zeros((4, 1)))[0] == 0.5


def test_class_weighted_loss():
    """train.class_weights scales per-label hydra losses."""
    import jax.numpy as jnp

    from segma_tpu.models.base import hydra_loss

    logits = jnp.zeros((2, 3, 2))
    targets = jnp.ones((2, 3, 2))
    total_u, per_u = hydra_loss(logits, targets)
    total_w, per_w = hydra_loss(
        logits, targets, class_weights=jnp.array([0.4, 1.0])
    )
    assert float(per_w[0]) == pytest.approx(0.4 * float(per_u[0]))
    assert float(per_w[1]) == pytest.approx(float(per_u[1]))
    assert float(total_w) < float(total_u)


def test_resume_restores_optimizer_and_scheduler(train_cfg, tmp_path):
    """Exact resume: adam moments + scheduler/early-stop counters persist."""
    import jax.numpy as jnp

    from segma_tpu.checkpoint import load_opt_state, load_train_state
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    enc = MultiLabelEncoder(train_cfg.data.classes)
    ds = SegmaFileDataset.from_config(train_cfg)
    ds.load(use_cache=False)
    model = Models["conv_vad"](enc, train_cfg)
    dm = SegmentationDataLoader(ds, enc, train_cfg, model.conv_settings)
    t1 = Trainer(model=model, config=train_cfg, run_dir=tmp_path / "r1", max_epochs=2)
    t1.fit(dm)

    last = tmp_path / "r1" / "checkpoints" / "last"
    ts = load_train_state(last)
    assert ts["scheduler"]["best"] is not None
    assert "early_stopping" in ts

    # restoring opt_state yields nonzero adam moments
    model2 = Models["conv_vad"](enc, train_cfg)
    model2.init_params(__import__("jax").random.key(0))
    t2 = Trainer(model=model2, config=train_cfg, run_dir=tmp_path / "r2", max_epochs=3)
    template = t2.optimizer.init(model2.params)
    restored = load_opt_state(last, template)
    assert restored is not None
    mu_leaves = __import__("jax").tree.leaves(restored.inner_state.inner_state[0].mu)
    assert any(float(jnp.abs(m).sum()) > 0 for m in mu_leaves)

    # and the resumed fit picks up scheduler state without crashing
    result = t2.fit(dm, resume_from=last)
    assert result["history"][0]["epoch"] == 2
    assert t2.scheduler.best is not None


def test_profiler_config_slot(train_cfg, tmp_path):
    """train.profiler traces one epoch to <run_dir>/profile."""
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = train_cfg
    cfg.train.profiler = "jax"
    cfg.train.max_epochs = 2
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    trainer = Trainer(model=model, config=cfg, run_dir=tmp_path / "run")
    trainer.fit(dm)
    assert (tmp_path / "run" / "profile").exists()


def test_resolve_checkpoint_run_dir(tmp_path):
    """resolve_checkpoint accepts a run dir (follows checkpoints/best.ckpt)."""
    from segma_tpu.checkpoint import resolve_checkpoint, save_params

    run = tmp_path / "run"
    ck = run / "checkpoints" / "epoch=00-val_loss=0.5"
    save_params(ck, {"a": np.zeros(2, np.float32)})
    (run / "checkpoints" / "best.ckpt").symlink_to(ck.resolve())
    assert resolve_checkpoint(run) == ck.resolve()
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(tmp_path / "nothing")


def test_checkpoint_manager_rediscovers_existing(tmp_path):
    """Reusing a run dir adopts prior checkpoints into top-k/best state."""
    params = {"w": np.zeros(2, np.float32)}
    m1 = CheckpointManager(tmp_path, monitor="val/loss", mode="min", save_top_k=3)
    for epoch, score in enumerate([0.5, 0.3]):
        m1.step(epoch, score, params, meta={})

    m2 = CheckpointManager(tmp_path, monitor="val/loss", mode="min", save_top_k=3)
    assert m2.best_score == 0.3
    assert len(m2.kept) == 2
    # a worse epoch doesn't displace the adopted best
    m2.step(2, 0.4, params, meta={})
    assert m2.best_score == 0.3
    # top-k eviction counts the adopted entries
    m2.step(3, 0.6, params, meta={})
    assert len(m2.kept) == 3
    assert not any(s == 0.6 for s, _ in m2.kept)


def test_preempt_signal_handler_is_async_safe(tmp_path):
    """The SIGTERM handler must only set flags: logging from signal context
    can hit CPython's reentrant-I/O guard and kill the loop before the
    interrupt checkpoint is written (regression: round-2 review)."""
    from segma_tpu.train import Trainer

    class _ExplodingLogger:
        def log(self, *_a, **_k):
            raise RuntimeError("reentrant call")

    t = Trainer.__new__(Trainer)  # handler touches no other state
    t._preempt_requested = False
    t.logger = _ExplodingLogger()
    t._handle_preempt_signal(15, None)  # must not raise
    assert t._preempt_requested
    assert t._preempt_signum == 15


def test_checkpoint_manager_keep_all_and_zero(tmp_path):
    """save_top_k=-1 keeps every checkpoint (Lightning convention);
    save_top_k=0 is rejected up front (Lightning's 0 means "save none",
    which this manager cannot honor — best.ckpt must point somewhere;
    round-3 advisor finding)."""
    params = {"heads": {"kernel": np.ones((2, 2), np.float32)}}
    mgr = CheckpointManager(
        tmp_path / "all", monitor="val/loss", mode="min", save_top_k=-1
    )
    for epoch, score in enumerate([0.5, 0.3, 0.4]):
        mgr.step(epoch, score, params, meta={})
    assert len(mgr.kept) == 3
    assert all(p.exists() for _, p in mgr.kept)

    with pytest.raises(ValueError, match="save_top_k=0"):
        CheckpointManager(
            tmp_path / "zero", monitor="val/loss", mode="min", save_top_k=0
        )


def test_write_last_ignores_stale_tmp_and_recovers_old(tmp_path):
    """A stale .last.tmp from a crashed write must not leak its old
    opt_state into the next last/; and a crash between the two renames
    leaves .last.old, which last_path adopts (regression: round-2 review)."""
    params = {"heads": {"kernel": np.ones((2, 2), np.float32)}}
    mgr = CheckpointManager(tmp_path, monitor="val/loss", mode="min")
    # simulate a crashed earlier write that left opt_state in the tmp dir
    stale = tmp_path / ".last.tmp"
    stale.mkdir()
    (stale / "opt_state.msgpack").write_bytes(b"STALE")
    mgr._write_last(params, meta={})  # params-only write
    assert not (tmp_path / "last" / "opt_state.msgpack").exists()

    # simulate the crash window: last/ moved aside, replacement never landed
    (tmp_path / "last").rename(tmp_path / ".last.old")
    assert mgr.last_path.exists()  # adopted .last.old
    assert not (tmp_path / ".last.old").exists()


def test_find_resumable_skips_corrupted_checkpoints(tmp_path, capsys):
    """A corrupted last/ must degrade resume to the newest valid epoch
    checkpoint (and corrupted epochs to older ones) instead of crashing —
    under SLURM auto-requeue a crash on resume loops forever."""
    from segma_tpu.checkpoint import find_resumable

    params = {"heads": {"kernel": np.ones((2, 2), np.float32)}}
    mgr = CheckpointManager(tmp_path, monitor="val/loss", mode="min")
    for epoch, score in enumerate([0.5, 0.3, 0.4]):
        mgr.step(epoch, score, params, meta={})

    assert find_resumable(tmp_path) == tmp_path / "last"

    # corrupt last/: fall back to the newest epoch dir (epoch 2)
    (tmp_path / "last" / "params.msgpack").write_bytes(b"\xc1TORN WRITE")
    got = find_resumable(tmp_path)
    assert got is not None and got.name.startswith("epoch=02")
    assert "corrupted" in capsys.readouterr().out

    # corrupt the newest epoch too: fall back one more
    (got / "params.msgpack").write_bytes(b"\xc1")
    got = find_resumable(tmp_path)
    assert got is not None and got.name.startswith("epoch=01")

    # a torn meta.yaml on an epoch dir must not crash the recovery path
    # itself: invalid YAML and non-dict payloads rank last, and the next
    # valid checkpoint still wins
    (got / "meta.yaml").write_bytes(b"\x00{ [torn")
    older = find_resumable(tmp_path)
    assert older is not None and older.name.startswith("epoch=00")
    (got / "meta.yaml").write_text("just-a-string")
    assert find_resumable(tmp_path).name.startswith("epoch=00")

    # nothing valid anywhere -> None (fresh run), never an exception
    for p in tmp_path.glob("*"):
        if (p / "params.msgpack").exists():
            (p / "params.msgpack").write_bytes(b"\xc1")
    assert find_resumable(tmp_path) is None
    assert find_resumable(tmp_path / "never_existed") is None


def test_checkpoint_layout_is_stable(tmp_path):
    """Checkpoint directory layout is a cross-version contract (resume,
    import tooling, best.ckpt symlinks): file names and meta keys must not
    drift casually."""
    params = {"heads": {"kernel": np.ones((2, 2), np.float32)}}
    mgr = CheckpointManager(tmp_path, monitor="val/loss", mode="min")
    mgr.step(
        0, 0.5, params, meta={"config": {}},
        opt_state={"m": np.zeros(2)}, train_state={"scheduler": {}},
    )
    assert sorted(p.name for p in (tmp_path / "last").iterdir()) == [
        "meta.yaml", "opt_state.msgpack", "params.msgpack", "train_state.yaml",
    ]
    kept = next(p for p in tmp_path.glob("epoch=*"))
    assert sorted(q.name for q in kept.iterdir()) == [
        "meta.yaml", "params.msgpack",
    ]
    assert (tmp_path / "best.ckpt").is_symlink()
    import yaml as _yaml

    meta = _yaml.safe_load((kept / "meta.yaml").read_text())
    assert {"config", "epoch", "score"} <= set(meta)


def test_frozen_encoder_reconstructed_for_inference(synthetic_dataset, tmp_path):
    """Checkpoints exclude frozen encoder params, so inference re-derives
    them: the rebuilt frozen tree must be BIT-IDENTICAL to the training-time
    one (regression: fit() drew its init key as split(key(seed))[1] while
    load_model_for_inference used key(seed) — with no pretrained snapshot
    the two random encoders differed and a 0.96-val-F1 head predicted
    nothing at predict time), and a mismatching rebuild must fail loudly
    via the recorded frozen_fingerprint instead of silently mis-predicting."""
    import warnings

    import jax
    import numpy as np

    from segma_tpu.checkpoint import load_model_for_inference
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.models.whisper.encoder import WhisperEncoderConfig
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            f"data.dataset_path={synthetic_dataset}",
            "data.classes=[male,female,key_child,other_child]",
            "data.dataset_multiplier=0.1",
            "model.name=surgical_hydra",
            "model.config.encoder=test_random_encoder",
            "model.config.fast_context=true",
            "model.config.lstm={hidden_size: 8, num_layers: 1, "
            "bidirectional: false, dropout: 0.0}",
            "model.config.classifier=16",
            "audio.chunk_duration_s=1.0",
            "train.batch_size=4",
            "train.max_epochs=1",
            "train.seed=3",
            "train.precision=f32",
            "wandb.offline=true",
        ],
    )

    registry_orig = Models["surgical_hydra"]

    def build(c):
        enc = MultiLabelEncoder(c.data.classes)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # random-encoder warning
            m = registry_orig(enc, c)
        m.module = m.module.clone(
            enc_cfg=WhisperEncoderConfig(
                d_model=16, n_heads=2, n_layers=1, ffn_dim=32
            )
        )
        return m

    model = build(cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(
        ds, model.label_encoder, cfg, model.conv_settings
    )
    run_dir = tmp_path / "run"
    trainer = Trainer(model=model, config=cfg, run_dir=run_dir)
    trainer.fit(dm)

    _, frozen_train = model.split_params(model.params)
    assert frozen_train, "surgical_hydra must have frozen encoder params"

    # load through the real inference entry point (same cfg => same seed).
    # load_model_for_inference builds from the registry, which would use the
    # full-size whisper encoder config; rebuild with the test-sized encoder
    # by monkeypatching the registry entry
    Models["surgical_hydra"] = lambda enc, c: build(c)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            m_inf = load_model_for_inference(cfg, run_dir)
        _, frozen_inf = m_inf.split_params(m_inf.params)
        for a, b in zip(
            jax.tree.leaves(frozen_train), jax.tree.leaves(frozen_inf)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # a different seed rebuilds a different encoder -> loud failure
        cfg.train.seed = 4
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with pytest.raises(ValueError, match="frozen params"):
                load_model_for_inference(cfg, run_dir)
    finally:
        Models["surgical_hydra"] = registry_orig


def test_torn_opt_and_train_state_degrade(tmp_path, capsys):
    """opt_state.msgpack / train_state.yaml are exactness extras: torn
    blobs must degrade resume (fresh moments/counters, warned) instead of
    crashing it — only params/meta corruption makes a dir unresumable."""
    from segma_tpu.checkpoint import load_opt_state, load_train_state

    d = tmp_path / "last"
    d.mkdir()
    (d / "opt_state.msgpack").write_bytes(b"\xc1TORN")
    (d / "train_state.yaml").write_bytes(b"\x00{ [torn")
    assert load_opt_state(d, template={"m": np.zeros(2, np.float32)}) is None
    assert load_train_state(d) == {}
    (d / "train_state.yaml").write_text("just-a-string")
    assert load_train_state(d) == {}
    out = capsys.readouterr().out
    assert "optimizer state not restorable" in out
    assert "train state not restorable" in out


def test_int16_transport_bit_parity(train_cfg, tmp_path):
    """train.transport=int16 ships raw PCM16 crops and normalizes on
    device; for 16-bit PCM sources the train step must be BIT-identical
    to the f32 transport (x * 2^-15 on device == the host division)."""
    import jax
    import jax.numpy as jnp

    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.train import make_optimizer, make_train_step
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = train_cfg
    cfg.train.transport = "int16"
    # transport is a HOST-path concept (what each batch ships); the device
    # cache bypasses per-batch waveform shipping entirely
    cfg.train.data_cache = "host"
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    params0 = model.init_params(jax.random.key(0))
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    batch = next(iter(dm.train_dataloader()))
    assert batch["x"].dtype == np.int16  # PCM16 fixture -> raw crops ship

    opt = make_optimizer(model, 0.01)
    step = make_train_step(model, opt)
    key = jax.random.key(7)
    import copy

    p_i16, _, loss_i16, _ = step(
        jax.tree.map(jnp.copy, params0), opt.init(params0), batch, key
    )
    f32_batch = {
        "x": batch["x"].astype(np.float32) / 32768.0,
        "y": copy.deepcopy(batch["y"]),
    }
    p_f32, _, loss_f32, _ = step(
        jax.tree.map(jnp.copy, params0), opt.init(params0), f32_batch, key
    )
    assert float(loss_i16) == float(loss_f32)
    for a, b in zip(jax.tree.leaves(p_i16), jax.tree.leaves(p_f32)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_rss_watchdog_recycles_and_resumes(train_cfg, tmp_path, monkeypatch):
    """train.host_rss_limit_gb: crossing the limit at an epoch boundary
    stops with interrupted=True (clean requeue) and resume completes the
    run — the self-recycle path for leaky host stacks."""
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = train_cfg
    cfg.train.max_epochs = 3
    cfg.train.host_rss_limit_gb = 0.001  # any real process exceeds this
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)

    run_dir = tmp_path / "run"
    trainer = Trainer(model=model, config=cfg, run_dir=run_dir)
    result = trainer.fit(dm)
    assert result["interrupted"] is True
    assert len(result["history"]) == 1  # recycled after epoch 0
    # the epoch-boundary checkpoint is the exact resume point
    last = run_dir / "checkpoints" / "last"
    assert (last / "opt_state.msgpack").exists()

    cfg.train.host_rss_limit_gb = 0.0  # disabled -> runs to completion
    model2 = Models["conv_vad"](MultiLabelEncoder(cfg.data.classes), cfg)
    t2 = Trainer(model=model2, config=cfg, run_dir=run_dir)
    result2 = t2.fit(dm, resume_from=last)
    assert result2["interrupted"] is False
    epochs = [h["epoch"] for h in result2["history"]]
    assert epochs == [1, 2]  # resumed exactly after the recycle point


def test_val_every_n_epochs(train_cfg, tmp_path):
    """train.val_every_n_epochs=2: validation/scoring runs on epochs 1, 3
    and the final epoch; non-val epochs still refresh last/ (exact
    resume), and best/top-k rank only scored epochs."""
    from segma_tpu.checkpoint import load_meta
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = train_cfg
    cfg.train.max_epochs = 5
    cfg.train.val_every_n_epochs = 2
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    run_dir = tmp_path / "run"
    trainer = Trainer(model=model, config=cfg, run_dir=run_dir)
    result = trainer.fit(dm)

    hist = result["history"]
    assert [h["epoch"] for h in hist] == [0, 1, 2, 3, 4]
    val_epochs = [h["epoch"] for h in hist if "val/loss" in h]
    assert val_epochs == [1, 3, 4]  # every 2nd + the final epoch
    # only scored epochs create top-k dirs
    epoch_dirs = sorted(p.name for p in (run_dir / "checkpoints").glob("epoch=*"))
    assert {int(n.split("=")[1][:2]) for n in epoch_dirs} <= {1, 3, 4}
    # last/ is from the FINAL epoch (refreshed on non-val epochs too)
    assert load_meta(run_dir / "checkpoints" / "last")["epoch"] == 4
    assert result["best_path"] is not None
