"""train.data_cache=device: HBM-resident audio, on-device crop gathers.

The contract: identical rng draws and identical numerics to host sampling
(the ONLY difference is where the waveform bytes live), so the training
trajectory must match bit for bit.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
from segma_tpu.data.device_cache import DeviceAudioCache
from segma_tpu.data.loaders import AudioSegmentationSampler, DataLoaderError
from segma_tpu.models import Models
from segma_tpu.train import Trainer
from segma_tpu.utils.encoders import MultiLabelEncoder
from segma_tpu.utils.io import read_pcm16_mono

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


def _cfg(dataset: Path, **over: str):
    extra = [
        f"data.dataset_path={dataset}",
        "data.classes=[male,female,key_child,other_child]",
        "data.dataset_multiplier=0.3",
        "model.name=conv_vad",
        "model.config={hidden: 32, depth: 1, dtype: f32}",
        "audio.chunk_duration_s=1.0",
        "train.batch_size=4",
        "train.max_epochs=2",
        "train.seed=0",
        "train.lr=0.003",
        "train.dataloader.num_workers=1",  # deterministic batch order
        "wandb.offline=true",
    ] + [f"{k}={v}" for k, v in over.items()]
    return load_config(CONFIG_DIR / "default.yml", extra)


@pytest.fixture(scope="module")
def loaded_ds(synthetic_dataset):
    cfg = _cfg(synthetic_dataset)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    return ds


def test_build_layout(loaded_ds, synthetic_dataset):
    chunk_f = 16_000
    cache = DeviceAudioCache.build(
        loaded_ds.train, synthetic_dataset, chunk_f
    )
    subset = loaded_ds.train
    assert cache.host_flat.dtype == np.int16  # all fixture WAVs are PCM16
    assert cache.bases.dtype == np.int32
    assert np.all(np.diff(cache.bases) >= chunk_f)  # slots >= chunk_f
    # flat buffer holds each file's exact samples at its base
    for i, uri in enumerate(subset.uris):
        raw = read_pcm16_mono(
            (Path(synthetic_dataset) / "wav" / uri).with_suffix(".wav")
        )
        b = int(cache.bases[i])
        np.testing.assert_array_equal(cache.host_flat[b : b + len(raw)], raw)


def test_gather_matches_host_crop(loaded_ds, synthetic_dataset):
    chunk_f = 16_000
    cache = DeviceAudioCache.build(loaded_ds.train, synthetic_dataset, chunk_f)
    cache.place()
    gather = cache.make_gather()
    uri = loaded_ds.train.uris[0]
    raw = read_pcm16_mono(
        (Path(synthetic_dataset) / "wav" / uri).with_suffix(".wav")
    )
    start = 12_345
    offsets = np.asarray([int(cache.bases[0]) + start], np.int32)
    crop = np.asarray(jax.jit(gather)(offsets))[0]
    np.testing.assert_array_equal(crop, raw[start : start + chunk_f])


def test_short_file_reads_trailing_zeros(tmp_path):
    """A file shorter than chunk_f gathers its samples + zero pad — exactly
    the host path's np.pad — never the next file's audio."""
    from segma_tpu.data.file_dataset import DatasetSubset

    import wave

    short = (np.arange(1000) % 77).astype(np.int16)
    nxt = np.full(20_000, 999, np.int16)
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    for name, samples in (("a", short), ("b", nxt)):
        with wave.open(str(wav_dir / f"{name}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16_000)
            w.writeframes(samples.tobytes())
    subset = DatasetSubset(
        uris=["a", "b"],
        durations=np.array(
            [(1000, 1000), (20_000, 20_000)],
            dtype=[("audio_duration_f", "i8"), ("annotated_duration_f", "i8")],
        ),
        indexes=[None, None],
    )
    chunk_f = 16_000
    cache = DeviceAudioCache.build(subset, tmp_path, chunk_f)
    cache.place()
    crop = np.asarray(jax.jit(cache.make_gather())(np.zeros(1, np.int32)))[0]
    np.testing.assert_array_equal(crop[:1000], short)
    assert np.all(crop[1000:] == 0)


def test_truncated_file_reads_zeros_not_next_file(tmp_path):
    """Slots are sized from the METADATA duration the sampler draws crop
    starts from — a truncated file (fewer samples on disk than metadata
    claims) must gather its real samples + zeros, exactly like the host
    path's short-read zero-pad, never the next file's audio. Regression:
    slots used to be sized from the decoded sample count, so a late crop's
    dynamic_slice slid into the next file's slot."""
    import wave

    from segma_tpu.data.file_dataset import DatasetSubset

    real = (np.arange(18_000) % 77).astype(np.int16) + 1  # no zeros
    nxt = np.full(20_000, 999, np.int16)
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    for name, samples in (("a", real), ("b", nxt)):
        with wave.open(str(wav_dir / f"{name}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16_000)
            w.writeframes(samples.tobytes())
    # metadata CLAIMS 20,000 samples for 'a'; the file holds 18,000
    subset = DatasetSubset(
        uris=["a", "b"],
        durations=np.array(
            [(20_000, 20_000), (20_000, 20_000)],
            dtype=[("audio_duration_f", "i8"), ("annotated_duration_f", "i8")],
        ),
        indexes=[None, None],
    )
    chunk_f = 16_000
    cache = DeviceAudioCache.build(subset, tmp_path, chunk_f)
    cache.place()
    # the latest crop the sampler can draw: start = 20_000 - 16_000 = 4_000
    crop = np.asarray(
        jax.jit(cache.make_gather())(np.array([4_000], np.int32))
    )[0]
    np.testing.assert_array_equal(crop[:14_000], real[4_000:18_000])
    assert np.all(crop[14_000:] == 0)  # zeros, not file b's 999s


def test_mixed_dtype_sources_promote_to_f32(tmp_path):
    """One non-PCM16 file promotes the whole buffer to normalized f32; the
    PCM16 files' values stay bit-identical to the host /32768.0 path."""
    import wave

    from segma_tpu.data.file_dataset import DatasetSubset

    pcm = (np.arange(16_000) % 77).astype(np.int16)
    stereo = np.zeros((16_000, 2), np.int16)  # 2ch -> not the int16 path
    stereo[:, 0] = 100
    stereo[:, 1] = 300
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    with wave.open(str(wav_dir / "m.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16_000)
        w.writeframes(pcm.tobytes())
    with wave.open(str(wav_dir / "s.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16_000)
        w.writeframes(stereo.tobytes())
    subset = DatasetSubset(
        uris=["m", "s"],
        durations=np.array(
            [(16_000, 16_000), (16_000, 16_000)],
            dtype=[("audio_duration_f", "i8"), ("annotated_duration_f", "i8")],
        ),
        indexes=[None, None],
    )
    cache = DeviceAudioCache.build(subset, tmp_path, 16_000)
    assert cache.host_flat.dtype == np.float32
    np.testing.assert_array_equal(
        cache.host_flat[:16_000], pcm.astype(np.float32) / 32768.0
    )
    # stereo file downmixed to mono mean
    np.testing.assert_allclose(
        cache.host_flat[16_000 + 5], (100 + 300) / 2 / 32768.0, rtol=1e-6
    )


def test_sampler_offsets_mode(loaded_ds, synthetic_dataset):
    """Device-mode sampler draws the SAME (file, start) sequence as host
    mode and emits (base + start) offsets."""
    cfg = _cfg(synthetic_dataset)
    model = Models["conv_vad"](
        MultiLabelEncoder(cfg.data.classes), cfg
    )
    cache = DeviceAudioCache.build(
        loaded_ds.train, synthetic_dataset, cfg.audio.chunk_duration_f
    )
    kw = dict(
        subset=loaded_ds.train,
        config=cfg,
        conv_settings=model.conv_settings,
        label_encoder=MultiLabelEncoder(cfg.data.classes),
        seed=7,
    )
    host = AudioSegmentationSampler(**kw)
    dev = AudioSegmentationSampler(**kw, device_bases=cache.bases)
    hb = host.sample_batch(4)
    db = dev.sample_batch(4)
    # device batches carry offsets under a DISTINCT key (no "x"): a step
    # built for waveforms must fail the contract check, not a conv shape
    assert "x" not in db
    assert db["offsets"].shape == (4,) and db["offsets"].dtype == np.int32
    np.testing.assert_array_equal(hb["y"], db["y"])  # same rng draws
    # offsets decode back to the host waveforms exactly
    cache.place()
    crops = np.asarray(jax.jit(cache.make_gather())(db["offsets"]))
    np.testing.assert_allclose(
        crops.astype(np.float32) / 32768.0, hb["x"], atol=0
    )


def _fit(cfg, tmp_path, tag):
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    trainer = Trainer(model=model, config=cfg, run_dir=tmp_path / tag)
    return trainer.fit(dm)["history"]


def test_bit_identical_trajectory(synthetic_dataset, tmp_path):
    """The headline contract: host vs device data cache, same seed ->
    bit-identical loss trajectory (train AND val, every epoch)."""
    host = _fit(_cfg(synthetic_dataset), tmp_path, "host")
    dev = _fit(
        _cfg(synthetic_dataset, **{"train.data_cache": "device"}),
        tmp_path,
        "dev",
    )
    assert len(host) == len(dev) == 2
    for h, d in zip(host, dev):
        assert h["train/loss"] == d["train/loss"]
        assert h["val/loss"] == d["val/loss"]
        assert h["val/f1_score"] == d["val/f1_score"]


def test_int16_transport_also_bit_identical(synthetic_dataset, tmp_path):
    """data_cache=device must equal the int16-transport host path too (both
    normalize on device with x * 2^-15)."""
    host = _fit(
        _cfg(synthetic_dataset, **{"train.transport": "int16"}),
        tmp_path,
        "host16",
    )
    dev = _fit(
        _cfg(synthetic_dataset, **{"train.data_cache": "device"}),
        tmp_path,
        "dev16",
    )
    for h, d in zip(host, dev):
        assert h["train/loss"] == d["train/loss"]


def test_epoch_dispatch_trajectory_parity(synthetic_dataset, tmp_path):
    """train.dispatch=epoch (one lax.scan dispatch per epoch) runs the SAME
    math as per-step dispatch — same rng split order, same lr injection,
    same loss/update formulas. XLA may fuse the scan body differently from
    the standalone step program, so parity is ulp-level (observed 2e-7
    relative on the optimizer-update path), not bit-exact: the first epoch
    (identical initial params) must match exactly, later epochs to a tight
    float32 tolerance."""
    step = _fit(
        _cfg(synthetic_dataset, **{"train.data_cache": "device"}),
        tmp_path,
        "step",
    )
    scan = _fit(
        _cfg(
            synthetic_dataset,
            **{"train.data_cache": "device", "train.dispatch": "epoch"},
        ),
        tmp_path,
        "scan",
    )
    assert len(step) == len(scan) == 2
    for s, e in zip(step, scan):
        np.testing.assert_allclose(s["train/loss"], e["train/loss"], rtol=1e-5)
        np.testing.assert_allclose(s["val/loss"], e["val/loss"], rtol=1e-5)
        np.testing.assert_allclose(
            s["val/f1_score"], e["val/f1_score"], rtol=1e-4
        )


def test_epoch_dispatch_preempt_saves_completed_epoch(
    synthetic_dataset, tmp_path
):
    """Under dispatch=epoch a SIGTERM can't interrupt the single scan
    dispatch — the epoch always completes. The preempt branch must then
    checkpoint it as a boundary (losing nothing; resume continues at the
    NEXT epoch) instead of discarding a finished epoch."""
    import signal

    from segma_tpu.checkpoint import load_meta

    cfg = _cfg(
        synthetic_dataset,
        **{"train.data_cache": "device", "train.dispatch": "epoch"},
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    trainer = Trainer(model=model, config=cfg, run_dir=tmp_path / "run")

    # deliver the signal "during" epoch 0's scan: the flag is only read
    # after _train_epoch returns, so setting it right after the scan body
    # is indistinguishable from a signal landing mid-dispatch
    orig_scan = trainer._train_epoch_scan

    def scan_with_signal(params, opt_state, loader, key):
        out = orig_scan(params, opt_state, loader, key)
        trainer._handle_preempt_signal(signal.SIGTERM, None)
        return out

    trainer._train_epoch_scan = scan_with_signal
    result = trainer.fit(dm)
    assert result["interrupted"] is True
    last = tmp_path / "run" / "checkpoints" / "last"
    assert (last / "params.msgpack").exists()
    # epoch 0 completed and was saved as the boundary -> resume at epoch 1
    assert load_meta(last)["epoch"] == 0

    model2 = Models["conv_vad"](enc, cfg)
    dm2 = SegmentationDataLoader(ds, enc, cfg, model2.conv_settings)
    t2 = Trainer(model=model2, config=cfg, run_dir=tmp_path / "run2")
    r2 = t2.fit(dm2, resume_from=last)
    assert r2["history"][0]["epoch"] == 1


def test_step_dispatch_preempt_during_final_step_saves_epoch(
    synthetic_dataset, tmp_path
):
    """Step dispatch: a SIGTERM landing during the FINAL batch of an epoch
    still means every step ran — the epoch must classify as completed and
    be checkpointed as the boundary (the loop's preempt break fires on the
    last iteration too, so a for/else would misclassify it mid-epoch)."""
    import signal

    from segma_tpu.checkpoint import load_meta

    cfg = _cfg(synthetic_dataset)  # defaults: data_cache=auto, dispatch=step
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    n_batches = len(dm.train_dataloader())
    trainer = Trainer(model=model, config=cfg, run_dir=tmp_path / "run")

    calls = {"n": 0}
    orig_put = trainer._put

    def put_with_signal(batch):
        calls["n"] += 1
        if calls["n"] == n_batches:  # the FINAL train step of epoch 0
            trainer._handle_preempt_signal(signal.SIGTERM, None)
        return orig_put(batch)

    trainer._put = put_with_signal
    result = trainer.fit(dm)
    assert result["interrupted"] is True
    last = tmp_path / "run" / "checkpoints" / "last"
    assert (last / "params.msgpack").exists()
    # all steps ran -> completed boundary saved; resume continues at 1
    assert load_meta(last)["epoch"] == 0


def test_epoch_dispatch_cosine_and_step_logs(synthetic_dataset, tmp_path):
    """Cosine LR (set per step INSIDE the scan) and the per-step loss logs
    must match step dispatch: identical step grid, ulp-level loss parity."""
    import json

    over = {
        "train.data_cache": "device",
        "train.scheduler.type": "cosine",
        "train.scheduler.warmup_steps": "2",
        "train.log_every_n_steps": "1",
    }
    step = _fit(_cfg(synthetic_dataset, **over), tmp_path, "cstep")
    scan = _fit(
        _cfg(synthetic_dataset, **{**over, "train.dispatch": "epoch"}),
        tmp_path,
        "cscan",
    )
    for s, e in zip(step, scan):
        np.testing.assert_allclose(s["train/loss"], e["train/loss"], rtol=1e-5)
        assert s["lr"] == e["lr"]  # host-computed cosine grid: exact

    def step_logs(tag):
        lines = (
            (tmp_path / tag / "metrics.jsonl").read_text().strip().splitlines()
        )
        return [
            (m["step"], m["train/loss_step"])
            for m in map(json.loads, lines)
            if "train/loss_step" in m
        ]

    a, b = step_logs("cstep"), step_logs("cscan")
    assert a and [x[0] for x in a] == [x[0] for x in b]
    np.testing.assert_allclose(
        [x[1] for x in a], [x[1] for x in b], rtol=1e-5
    )


def test_epoch_dispatch_val_scores_parity(synthetic_dataset, tmp_path):
    """auroc (need_scores=True) under the val epoch scan: the full per-frame
    score matrices ride the single scan dispatch and the host aggregation
    (rank-based AUROC over the concatenated pass) matches step dispatch."""
    over = {
        "train.validation_metric": "auroc",
        "train.extra_val_metrics": "[loss,f1_score,auroc]",
        "train.data_cache": "device",
    }
    step = _fit(_cfg(synthetic_dataset, **over), tmp_path, "astep")
    scan = _fit(
        _cfg(synthetic_dataset, **{**over, "train.dispatch": "epoch"}),
        tmp_path,
        "ascan",
    )
    for s, e in zip(step, scan):
        for k in ("val/loss", "val/f1_score"):
            np.testing.assert_allclose(s[k], e[k], rtol=1e-5, err_msg=k)
        # AUROC is a RANK statistic: the scan body's different XLA fusion
        # shifts probs at ulp level (same 2e-7 as the train path), which can
        # flip near-tied rank orderings — bounded but not ulp-proportional.
        np.testing.assert_allclose(
            s["val/auroc"], e["val/auroc"], atol=5e-3, err_msg="val/auroc"
        )


def test_epoch_dispatch_powerset_partial_parity(synthetic_dataset, tmp_path):
    """Powerset subset_stats (partial_* metrics) ride the val epoch scan:
    per-step tuples sliced from the stacked scan outputs must aggregate to
    the same partial_loss / partial_f1 / partial_auroc as step dispatch."""
    over = {
        "model.name": "powerset_vad",
        "model.config": "{hidden: 32, depth: 1, dtype: f32, max_set_size: 2}",
        "train.extra_val_metrics": "[loss,f1_score,partial_loss,auroc]",
        "train.data_cache": "device",
    }

    def fit_ps(cfg, tag):
        enc = MultiLabelEncoder(cfg.data.classes)
        model = Models["powerset_vad"](enc, cfg)
        ds = SegmaFileDataset.from_config(cfg)
        ds.load(use_cache=False)
        dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
        trainer = Trainer(model=model, config=cfg, run_dir=tmp_path / tag)
        return trainer.fit(dm)["history"]

    step = fit_ps(_cfg(synthetic_dataset, **over), "pstep")
    scan = fit_ps(
        _cfg(synthetic_dataset, **{**over, "train.dispatch": "epoch"}), "pscan"
    )
    keys = (
        "val/loss",
        "val/partial_loss",
        "val/partial_f1_score",
        "val/partial_auroc",
    )
    for s, e in zip(step, scan):
        for k in keys:
            assert k in s and k in e, k
            # partial_auroc is a RANK statistic over subset probs — ulp-level
            # scan-fusion shifts can flip near-tied orderings (same tolerance
            # rationale as val/auroc above).
            atol = 5e-3 if k == "val/partial_auroc" else 0
            np.testing.assert_allclose(
                s[k], e[k], rtol=1e-5, atol=atol, err_msg=k
            )


def test_epoch_dispatch_requires_device_cache(synthetic_dataset, tmp_path):
    # explicit host (the default is auto, which epoch dispatch accepts at
    # init — it fails at fit() only if the resolution lands on host)
    cfg = _cfg(
        synthetic_dataset,
        **{"train.dispatch": "epoch", "train.data_cache": "host"},
    )
    model = Models["conv_vad"](MultiLabelEncoder(cfg.data.classes), cfg)
    with pytest.raises(ValueError, match="data_cache=device"):
        Trainer(model=model, config=cfg, run_dir=tmp_path / "bad")


def test_bad_dispatch_value_rejected(synthetic_dataset, tmp_path):
    cfg = _cfg(synthetic_dataset, **{"train.dispatch": "batch"})
    model = Models["conv_vad"](MultiLabelEncoder(cfg.data.classes), cfg)
    with pytest.raises(ValueError, match="dispatch"):
        Trainer(model=model, config=cfg, run_dir=tmp_path / "bad2")


def test_multihost_explicit_device_builds_local_shard(
    synthetic_dataset, monkeypatch
):
    """Explicit data_cache=device under multiple controllers builds THIS
    process's shard with the cross-process row contract (no more
    build-time rejection; the real two-process run is exercised by
    tests/test_multihost.py)."""
    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "device"})
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    loader = dm.train_dataloader()
    cache = loader.device_cache
    assert cache is not None
    assert len(cache.bases) == len(ds.train.uris[0::2])
    assert cache.pad_to >= len(cache.host_flat)


def _fake_mesh(devices: np.ndarray, axis_names: tuple):
    """Duck-typed mesh exposing exactly what place()'s ownership check
    reads (shape by name, axis_names, devices) — real distributed meshes
    need multiple OS processes."""

    class _Dev:
        def __init__(self, process_index):
            self.process_index = process_index

    class _Mesh:
        pass

    m = _Mesh()
    m.devices = np.vectorize(_Dev)(devices)
    m.axis_names = axis_names
    m.shape = dict(zip(axis_names, devices.shape))
    return m


def test_place_row_ownership_groups_by_named_data_axis(
    synthetic_dataset, monkeypatch
):
    """The multi-host ownership check must group devices by the NAMED
    'data' axis, not whatever axis is leading. A ('seq','data') mesh whose
    data coordinates each belong to one process is valid even though the
    LEADING axis mixes processes; the transposed layout (a data row
    spanning both processes) must be rejected — silently accepting it
    would hand chips another process's audio rows."""
    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "device"})
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    cache = DeviceAudioCache.build(
        ds.train, cfg.data.dataset_path, cfg.audio.chunk_duration_f
    )
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)

    # seq=2 x data=2: data coordinate j owned entirely by process j
    ok = _fake_mesh(np.array([[0, 1], [0, 1]]), ("seq", "data"))
    # the same grid read with data LEADING: each data row spans both
    bad = _fake_mesh(np.array([[0, 1], [0, 1]]), ("data", "seq"))

    with pytest.raises(ValueError, match="ONE process"):
        cache.place(bad)
    # valid grouping passes the ownership check and proceeds to the
    # device_put fan-out, which our duck-typed devices cannot satisfy —
    # any error must NOT be the ownership rejection
    try:
        cache.place(ok)
    except ValueError as e:  # pragma: no cover - depends on jax internals
        assert "ONE process" not in str(e)
    except Exception:
        pass


def test_bad_data_cache_value_rejected(synthetic_dataset):
    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "hbm"})
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    with pytest.raises(DataLoaderError, match="data_cache"):
        dm.train_dataloader()


def test_host_hook_incompatible(loaded_ds, synthetic_dataset):
    cfg = _cfg(synthetic_dataset)
    model = Models["conv_vad"](MultiLabelEncoder(cfg.data.classes), cfg)
    cache = DeviceAudioCache.build(
        loaded_ds.train, synthetic_dataset, cfg.audio.chunk_duration_f
    )
    with pytest.raises(DataLoaderError, match="host-side audio hooks"):
        AudioSegmentationSampler(
            subset=loaded_ds.train,
            config=cfg,
            conv_settings=model.conv_settings,
            label_encoder=MultiLabelEncoder(cfg.data.classes),
            seed=0,
            host_hook=lambda x: x,
            device_bases=cache.bases,
        )


# -- train.data_cache=auto: budget-resolved device/host pick ------------------


def test_plan_nbytes_matches_build(loaded_ds, synthetic_dataset):
    chunk_f = 16_000
    planned = DeviceAudioCache.plan_nbytes(
        loaded_ds.train, synthetic_dataset, chunk_f
    )
    built = DeviceAudioCache.build(loaded_ds.train, synthetic_dataset, chunk_f)
    assert planned == built.nbytes


def _dm(cfg):
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    return SegmentationDataLoader(ds, enc, cfg, model.conv_settings)


def test_auto_within_budget_resolves_device(synthetic_dataset):
    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "auto"})
    loader = _dm(cfg).train_dataloader()
    assert loader.device_cache is not None
    assert "auto -> device" in loader.data_cache_decision


def test_default_data_cache_is_auto(synthetic_dataset):
    # the DEFAULT ships the device-cache win: an unconfigured run resolves
    # per subset (device here — the fixture fits the budget) and logs it
    cfg = _cfg(synthetic_dataset)
    assert cfg.train.data_cache == "auto"
    loader = _dm(cfg).train_dataloader()
    assert loader.device_cache is not None
    assert "auto -> device" in loader.data_cache_decision


def test_auto_over_budget_falls_back_to_host(synthetic_dataset):
    cfg = _cfg(
        synthetic_dataset,
        **{
            "train.data_cache": "auto",
            # fixture audio is a few hundred KB; 1e-6 GB = 1 KB budget
            "train.device_cache_budget_gb": "0.000001",
        },
    )
    loader = _dm(cfg).train_dataloader()
    assert loader.device_cache is None
    assert "auto -> host" in loader.data_cache_decision
    assert "device_cache_budget_gb" in loader.data_cache_decision


def test_auto_host_hook_falls_back_to_host(synthetic_dataset):
    # a host-side audio hook forces host waveforms; auto must resolve to
    # host (explicit "device" + hook is a hard error, auto never errors)
    cfg = _cfg(synthetic_dataset)  # default: auto
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(
        ds, enc, cfg, model.conv_settings, host_hook=lambda x: x
    )
    loader = dm.train_dataloader()
    assert loader.device_cache is None
    assert "auto -> host (host_hook" in loader.data_cache_decision


def test_auto_host_hook_resolves_without_header_probes(
    synthetic_dataset, monkeypatch
):
    """The host_hook short-circuit decides BEFORE planning: plan() probes
    every file's header, pure waste when the outcome is already forced."""
    cfg = _cfg(synthetic_dataset)  # default: auto
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(
        ds, enc, cfg, model.conv_settings, host_hook=lambda x: x
    )
    monkeypatch.setattr(
        DeviceAudioCache,
        "plan",
        classmethod(
            lambda cls, *a, **k: (_ for _ in ()).throw(
                AssertionError("plan() probed headers despite host_hook")
            )
        ),
    )
    loader = dm.train_dataloader()
    assert loader.device_cache is None
    assert "auto -> host (host_hook" in loader.data_cache_decision


def test_auto_multihost_resolves_device_with_local_shard(
    synthetic_dataset, monkeypatch
):
    """Multi-host composes (round-4 VERDICT item 3): auto resolves to
    device per-process rows when every shard's plan fits, and the built
    cache covers exactly THIS controller's file shard, padded to the
    cross-process maximum so the global row shapes agree. The decision
    uses only cross-process-deterministic inputs (never MemAvailable)."""
    import segma_tpu.data.loaders as loaders_mod

    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "auto"})
    dm = _dm(cfg)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # a divergent-across-hosts input must not be consulted under multihost
    monkeypatch.setattr(
        loaders_mod,
        "_mem_available_bytes",
        lambda: (_ for _ in ()).throw(AssertionError("consulted MemAvailable")),
    )
    loader = dm.train_dataloader()
    assert loader.device_cache is not None
    assert "per-process rows over 2 controllers" in loader.data_cache_decision
    cache = loader.device_cache
    # local shard only (pid 0 -> uris[0::2]), padded row contract
    full = _dm(cfg).dataset.train
    assert len(cache.bases) == len(full.uris[0::2])
    assert cache.pad_to >= len(cache.host_flat)


def test_auto_int32_overflow_falls_back_to_host(synthetic_dataset, monkeypatch):
    """>= 2^31 planned samples exceed the int32 gather-offset range:
    explicit 'device' errors at build, so auto must resolve to host —
    2^31 int16 samples is ~4.3 GB, far under the default 12 GB budget, so
    the byte check alone would have crashed a previously-working
    unconfigured run (r4 advisor finding, high)."""
    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "auto"})
    dm = _dm(cfg)
    real_plan = DeviceAudioCache.plan.__func__

    def fake_plan(cls, subset, dataset_path, chunk_f):
        any_f32, paths, bases, slots, _ = real_plan(
            cls, subset, dataset_path, chunk_f
        )
        return any_f32, paths, bases, slots, 2**31

    monkeypatch.setattr(
        DeviceAudioCache, "plan", classmethod(fake_plan)
    )
    loader = dm.train_dataloader()
    assert loader.device_cache is None
    assert "int32 offset range" in loader.data_cache_decision


def test_explicit_device_int32_overflow_is_deterministic(
    synthetic_dataset, monkeypatch
):
    """Explicit data_cache=device with an over-2^31 GLOBAL plan raises the
    hard error in the loader on EVERY controller (computed from the global
    file list), not just inside the oversized shard's build() — a
    single-process crash would strand the other controllers at their first
    collective."""
    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "device"})
    dm = _dm(cfg)
    real_plan = DeviceAudioCache.plan.__func__

    def fake_plan(cls, subset, dataset_path, chunk_f):
        any_f32, paths, bases, slots, _ = real_plan(
            cls, subset, dataset_path, chunk_f
        )
        return any_f32, paths, bases, slots, 2**31

    monkeypatch.setattr(DeviceAudioCache, "plan", classmethod(fake_plan))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(DataLoaderError, match="int32 offset range"):
        dm.train_dataloader()


def test_auto_budget_is_joint_over_subsets(synthetic_dataset):
    """device_cache_budget_gb bounds the SUM of subsets: when train's
    buffer consumes most of it, val must resolve to host instead of
    jointly exceeding HBM (r4 advisor finding, low)."""
    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "auto"})
    dm = _dm(cfg)
    train_planned = DeviceAudioCache.plan_nbytes(
        dm.dataset.train, cfg.data.dataset_path, cfg.audio.chunk_duration_f
    )
    val_planned = DeviceAudioCache.plan_nbytes(
        dm.dataset.val, cfg.data.dataset_path, cfg.audio.chunk_duration_f
    )
    assert val_planned > 0
    cfg.train.device_cache_budget_gb = (
        train_planned + val_planned / 2
    ) / 1e9
    t_loader = dm.train_dataloader()
    v_loader = dm.val_dataloader()
    assert t_loader.device_cache is not None
    assert v_loader.device_cache is None
    assert "remaining" in v_loader.data_cache_decision


def test_auto_low_host_ram_falls_back_to_host(synthetic_dataset, monkeypatch):
    """Building the cache decodes ~1x the buffer into host RAM first; when
    MemAvailable can't take it, auto resolves to host instead of OOMing
    at loader construction (r4 advisor finding, low)."""
    import segma_tpu.data.loaders as loaders_mod

    cfg = _cfg(synthetic_dataset, **{"train.data_cache": "auto"})
    dm = _dm(cfg)
    monkeypatch.setattr(loaders_mod, "_mem_available_bytes", lambda: 1024)
    loader = dm.train_dataloader()
    assert loader.device_cache is None
    assert "host RAM" in loader.data_cache_decision


def test_epoch_dispatch_auto_over_budget_errors_with_resolution(
    synthetic_dataset, tmp_path
):
    # dispatch=epoch passes the Trainer's init check under "auto", but an
    # over-budget resolution to host must fail loudly at fit() with the
    # resolution in the message — never silently degrade to step dispatch
    cfg = _cfg(
        synthetic_dataset,
        **{
            "train.data_cache": "auto",
            "train.device_cache_budget_gb": "0.000001",
            "train.dispatch": "epoch",
            "train.max_epochs": "1",
        },
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    trainer = Trainer(model=model, config=cfg, run_dir=tmp_path / "auto_ep")
    with pytest.raises(ValueError, match="auto -> host"):
        trainer.fit(dm)


def test_auto_trajectory_identical_to_explicit_device(
    synthetic_dataset, tmp_path
):
    # auto-within-budget must be the SAME path as explicit device — pin it
    # with the loss trajectory
    losses_dev = _fit(
        _cfg(synthetic_dataset, **{"train.data_cache": "device"}),
        tmp_path,
        "expl",
    )
    losses_auto = _fit(
        _cfg(synthetic_dataset, **{"train.data_cache": "auto"}),
        tmp_path,
        "auto",
    )
    assert len(losses_dev) == len(losses_auto) == 2
    for d, a in zip(losses_dev, losses_auto):
        assert d["train/loss"] == a["train/loss"]
        assert d["val/loss"] == a["val/loss"]
        assert d["val/f1_score"] == a["val/f1_score"]
