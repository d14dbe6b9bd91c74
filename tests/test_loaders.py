"""Sampler / loader tests on the synthetic dataset."""

import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
from segma_tpu.data.loaders import AudioSegmentationSampler
from segma_tpu.models.geometry import ConvolutionSettings
from segma_tpu.utils.encoders import MultiLabelEncoder

from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"
CLASSES = ["male", "female", "key_child", "other_child"]
CS = ConvolutionSettings((400, 3, 3), (160, 1, 2), (200, 1, 1))


@pytest.fixture
def cfg(synthetic_dataset):
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            f"data.dataset_path={synthetic_dataset}",
            "data.classes=[male,female,key_child,other_child]",
            "train.batch_size=4",
            "train.seed=0",
        ],
    )
    return cfg


@pytest.fixture
def loaded_ds(cfg):
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    return ds


def test_sampler_shapes(cfg, loaded_ds):
    enc = MultiLabelEncoder(CLASSES)
    sampler = AudioSegmentationSampler(loaded_ds.train, cfg, CS, enc, seed=0)
    x, y = sampler.sample()
    assert x.shape == (64_000,)
    assert x.dtype == np.float32
    assert y.shape == (199, 4)
    batch = sampler.sample_batch(4)
    assert batch["x"].shape == (4, 64_000)
    assert batch["y"].shape == (4, 199, 4)


def test_sampler_determinism(cfg, loaded_ds):
    enc = MultiLabelEncoder(CLASSES)
    s1 = AudioSegmentationSampler(loaded_ds.train, cfg, CS, enc, seed=42)
    s2 = AudioSegmentationSampler(loaded_ds.train, cfg, CS, enc, seed=42)
    b1, b2 = s1.sample_batch(2), s2.sample_batch(2)
    np.testing.assert_array_equal(b1["x"], b2["x"])
    np.testing.assert_array_equal(b1["y"], b2["y"])


def test_targets_correspond_to_audio(cfg, loaded_ds):
    """Windows labeled positive must carry sine energy; silence must not."""
    enc = MultiLabelEncoder(CLASSES)
    sampler = AudioSegmentationSampler(loaded_ds.train, cfg, CS, enc, seed=3)
    checked_pos = checked_neg = 0
    for _ in range(20):
        x, y = sampler.sample()
        active = y.sum(axis=1) > 0
        for w in range(0, 199, 10):
            seg = x[w * 320 : w * 320 + 320]
            rms = float(np.sqrt((seg**2).mean()))
            # interior windows only (boundary windows partially overlap)
            if w > 0 and active[w] and (w == 0 or active[w - 1]) and active[min(w + 1, 198)]:
                if rms > 0.05:
                    checked_pos += 1
            if not active[max(0, w - 1)] and not active[w] and not active[min(w + 1, 198)]:
                assert rms < 0.05
                checked_neg += 1
    assert checked_neg > 0


def test_virtual_epoch_size(cfg, loaded_ds):
    enc = MultiLabelEncoder(CLASSES)
    sampler = AudioSegmentationSampler(loaded_ds.train, cfg, CS, enc, seed=0)
    # 5 files x 20 s / 4 s = 25 samples, multiplier 1.0, batch 4 -> max(25,4)=25
    assert sampler.samples_per_epoch() == 25


def test_dataloader_iteration(cfg, loaded_ds):
    """Host-path batch contract: waveforms under "x"."""
    enc = MultiLabelEncoder(CLASSES)
    cfg.train.data_cache = "host"
    dm = SegmentationDataLoader(loaded_ds, enc, cfg, CS)
    loader = dm.train_dataloader()
    assert loader.device_cache is None
    assert len(loader) == 25 // 4
    n = 0
    for batch in loader:
        assert batch["x"].shape == (4, 64_000)
        assert batch["y"].shape == (4, 199, 4)
        n += 1
        if n >= 3:
            break


def test_dataloader_auto_device_contract(cfg, loaded_ds):
    """data_cache=auto resolves to device for the (in-budget) fixture and
    batches then carry flat-buffer OFFSETS under a distinct key — never
    "x" (regression: the r4 auto default silently changed batch["x"]'s
    meaning and consumers crashed inside their first conv)."""
    assert cfg.train.data_cache == "auto"  # the shipped default
    enc = MultiLabelEncoder(CLASSES)
    dm = SegmentationDataLoader(loaded_ds, enc, cfg, CS)
    loader = dm.train_dataloader()
    assert loader.device_cache is not None
    assert "auto -> device" in loader.data_cache_decision
    for batch in loader:
        assert "x" not in batch
        assert batch["offsets"].shape == (4,)
        assert batch["offsets"].dtype == np.int32
        assert batch["y"].shape == (4, 199, 4)
        break


def test_batch_contract_mismatch_raises_typed_error(cfg, loaded_ds):
    """Wiring a device-cache batch into a waveform step (or vice versa)
    raises BatchContractError at trace time, not an IndexError inside the
    model (regression: tests/test_sincnet.py died in SincConv)."""
    import jax

    from segma_tpu.data.loaders import BatchContractError
    from segma_tpu.models import Models
    from segma_tpu.train import make_optimizer, make_train_step

    enc = MultiLabelEncoder(CLASSES)
    model = Models["conv_vad"](enc, cfg)
    params = model.init_params(jax.random.key(0))
    opt = make_optimizer(model, 1e-3)
    opt_state = opt.init(params)

    dm = SegmentationDataLoader(loaded_ds, enc, cfg, model.conv_settings)
    loader = dm.train_dataloader()  # auto -> device for the tiny fixture
    batch = next(iter(loader))
    step_no_cache = make_train_step(model, opt)
    with pytest.raises(BatchContractError, match="device-cache offsets"):
        step_no_cache(params, opt_state, batch, jax.random.key(1))

    loader.device_cache.place()
    step_cached = make_train_step(model, opt, cache=loader.device_cache)
    host_batch = {
        "x": np.zeros((4, 64_000), np.float32),
        "y": np.asarray(batch["y"]),
    }
    with pytest.raises(BatchContractError, match="host\\s+waveforms"):
        step_cached(params, opt_state, host_batch, jax.random.key(1))


def test_audio_cache_matches_uncached(cfg, loaded_ds):
    """RAM-cached crops must equal direct ranged reads."""
    enc = MultiLabelEncoder(CLASSES)
    cached = AudioSegmentationSampler(
        loaded_ds.train, cfg, CS, enc, seed=11, cache_audio_gb=8.0
    )
    uncached = AudioSegmentationSampler(
        loaded_ds.train, cfg, CS, enc, seed=11, cache_audio_gb=0.0
    )
    assert cached._audio_cache is not None
    assert uncached._audio_cache is None
    for _ in range(5):
        xc, yc = cached.sample()
        xu, yu = uncached.sample()
        np.testing.assert_allclose(xc, xu, atol=1e-7)
        np.testing.assert_array_equal(yc, yu)


def test_multi_worker_loader(cfg, loaded_ds):
    """num_workers > 1 still yields exactly n_batches well-formed batches."""
    enc = MultiLabelEncoder(CLASSES)
    cfg.train.data_cache = "host"
    cfg.train.dataloader.num_workers = 3
    dm = SegmentationDataLoader(loaded_ds, enc, cfg, CS)
    loader = dm.train_dataloader()
    assert len(loader.extra_samplers) == 2
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        assert b["x"].shape == (4, 64_000)
        assert b["y"].shape == (4, 199, 4)


def test_worker_failure_raises_not_truncates(cfg, loaded_ds):
    """A dying producer thread must fail the epoch loudly, not silently
    shrink it (regression: round-2 review)."""
    from segma_tpu.data.loaders import PrefetchingLoader

    class _BadSampler:
        def sample_batch(self, batch_size):
            raise OSError("disk gone")

    loader = PrefetchingLoader(_BadSampler(), batch_size=2, n_batches=4)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)


def test_workers_share_one_audio_cache(cfg, loaded_ds):
    """num_workers samplers over one subset share a single decoded-audio
    cache (per-worker copies would multiply host RAM by num_workers)."""
    from segma_tpu.data.loaders import SegmentationDataLoader
    from segma_tpu.models.base import ConvolutionSettings
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg.train.data_cache = "host"  # the decoded-audio RAM cache is host-path
    cfg.train.dataloader.num_workers = 3
    enc = MultiLabelEncoder(cfg.data.classes)
    cs = ConvolutionSettings((320,), (320,), (0,))
    dl = SegmentationDataLoader(loaded_ds, enc, cfg, cs)
    loader = dl.train_dataloader()
    caches = [id(s._audio_cache) for s in [loader.sampler] + loader.extra_samplers]
    assert len(loader.extra_samplers) >= 1
    assert len(set(caches)) == 1
    next(iter(loader))  # populates the shared cache through any worker
    assert len(loader.sampler._audio_cache) > 0


def test_audio_cache_budget_and_threads():
    """AudioCache enforces its byte budget and survives concurrent
    put/len (regression: round-2 review — the bare shared dict raced)."""
    import threading

    from segma_tpu.data.loaders import AudioCache

    cache = AudioCache(budget_bytes=100)
    a = np.zeros(30, np.uint8)  # 30 bytes
    cache.put(0, a)
    cache.put(1, a)
    cache.put(2, a)
    cache.put(3, a)  # 120 > 100: rejected
    assert len(cache) == 3 and cache.get(3) is None

    big = AudioCache(budget_bytes=10**9)
    errs = []

    def hammer(base):
        try:
            for i in range(500):
                big.put(base + i, np.zeros(64, np.uint8))
                big.get(base + i)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=hammer, args=(k * 500,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs and len(big) == 2000


def test_int16_transport_sampler_and_mixed_promotion(cfg, loaded_ds):
    """transport=int16: PCM16 sources yield raw int16 crops, value-equal
    to the f32 path after normalization; a mixed-source batch (some files
    not PCM16) promotes everything to normalized f32 — np.stack's own
    promotion would mix raw PCM magnitudes with [-1, 1] floats."""
    cfg.train.transport = "int16"
    s16 = AudioSegmentationSampler(
        loaded_ds.train, cfg, CS, MultiLabelEncoder(CLASSES), seed=3
    )
    cfg.train.transport = "f32"
    s32 = AudioSegmentationSampler(
        loaded_ds.train, cfg, CS, MultiLabelEncoder(CLASSES), seed=3
    )
    x16, y16 = s16.sample()
    x32, y32 = s32.sample()
    assert x16.dtype == np.int16 and x32.dtype == np.float32
    np.testing.assert_array_equal(x16.astype(np.float32) / 32768.0, x32)
    np.testing.assert_array_equal(y16, y32)

    # homogeneous batch keeps int16
    assert s16.sample_batch(4)["x"].dtype == np.int16

    # mixed dtypes (simulating a non-PCM16 file in the pool) promote
    seq = iter(
        [
            (np.full(16_000, 100, np.int16), y16),
            (np.full(16_000, 100 / 32768.0, np.float32), y16),
        ]
    )
    s16.sample = lambda: next(seq)
    batch = s16.sample_batch(2)
    assert batch["x"].dtype == np.float32
    np.testing.assert_allclose(batch["x"][0], batch["x"][1], atol=1e-7)


def test_bad_transport_rejected(cfg, loaded_ds):
    cfg.train.transport = "uint4"
    from segma_tpu.data.loaders import DataLoaderError

    with pytest.raises(DataLoaderError, match="transport"):
        AudioSegmentationSampler(
            loaded_ds.train, cfg, CS, MultiLabelEncoder(CLASSES), seed=0
        )
