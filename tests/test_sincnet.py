"""sincnet_hydra: learnable band-pass frontend (the reference's dead
SincNetConfig implemented for real)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.models import Models
from segma_tpu.models.sincnet import SincConv
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


@pytest.fixture(scope="module")
def model():
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=sincnet_hydra",
            "model.config={stride: 10, filters: 16, kernel_size: 101, "
            "hidden: 32, dtype: f32, "
            "lstm: {hidden_size: 16, num_layers: 1, bidirectional: true, "
            "dropout: 0.0}}",
            "audio.chunk_duration_s=1.0",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    m = Models["sincnet_hydra"](enc, cfg)
    m.init_params(jax.random.key(0))
    return m


def test_geometry_matches_frame_grid(model):
    assert model.conv_settings.rf_step == 320  # 32 * stride(10)
    assert model.n_windows == 49  # 1 s chunk on the 20 ms grid


def test_forward_shape_and_grad(model):
    wav = np.random.default_rng(0).standard_normal((2, 16_000)).astype(np.float32)
    logits = model.apply(model.params, wav)
    assert logits.shape == (2, 49, 4)
    assert np.isfinite(np.asarray(logits)).all()
    # all params trainable (no frozen encoder)
    assert model.frozen_prefixes == ()


def test_sinc_filters_are_bandpass():
    """Each filter's frequency response must peak inside its own (f1, f2)
    band and be small outside it."""
    conv = SincConv(filters=8, kernel_size=251, stride=1, dtype=jnp.float32)
    params = conv.init(jax.random.key(0), np.zeros((1, 1000), np.float32))
    low = np.abs(np.asarray(params["params"]["low_hz"])) + 50.0
    band = np.abs(np.asarray(params["params"]["band_hz"])) + 50.0
    f1, f2 = low, np.minimum(low + band, 8000.0)

    # impulse response of each filter = response to a unit impulse
    impulse = np.zeros((1, 1001), np.float32)
    impulse[0, 500] = 1.0
    ir = np.asarray(conv.apply(params, impulse))[0]  # (T, F)
    freqs = np.fft.rfftfreq(ir.shape[0], d=1 / 16_000)
    mag = np.abs(np.fft.rfft(ir, axis=0))  # (freq, F)
    for i in range(8):
        peak = freqs[np.argmax(mag[:, i])]
        assert f1[i] - 100 <= peak <= f2[i] + 100, (i, peak, f1[i], f2[i])
        # stop-band (well above the band edge) is attenuated — only
        # checkable for filters whose band ends well below Nyquist
        if f2[i] + 1000 < 7000:
            stop = mag[freqs > f2[i] + 1000, i]
            assert stop.max() < 0.2 * mag[:, i].max()


def test_sincnet_pipeline_end_to_end(model):
    from segma_tpu.inference import InferencePipeline

    audio = (
        np.random.default_rng(3).standard_normal(40_000) * 0.2
    ).astype(np.float32)
    pipe = InferencePipeline(model, model.params, batch_size=4)
    logits = pipe.logits_for_audio(audio)
    assert logits.shape == (pipe.chunkyfier.total_frames(40_000), 4)


def test_sincnet_learns(model, synthetic_dataset):
    """A few steps on the sine dataset reduce the loss (the band-pass
    frontend can separate per-class sine frequencies by design)."""
    from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
    from segma_tpu.train import make_optimizer, make_train_step

    cfg = model.config
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=sincnet_hydra",
            "model.config={stride: 10, filters: 16, kernel_size: 101, "
            "hidden: 32, dtype: f32, "
            "lstm: {hidden_size: 16, num_layers: 1, bidirectional: true, "
            "dropout: 0.0}}",
            "audio.chunk_duration_s=1.0",
            f"data.dataset_path={synthetic_dataset}",
            "data.classes=[male,female,key_child,other_child]",
            "train.batch_size=4",
            "train.lr=0.005",
            "train.seed=0",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    m = Models["sincnet_hydra"](enc, cfg)
    params = m.init_params(jax.random.key(0))
    opt = make_optimizer(m, cfg.train.lr)
    opt_state = opt.init(params)

    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, m.conv_settings)
    loader = dm.train_dataloader()
    # data_cache=auto resolved to device for this tiny set: a direct
    # consumer builds its step FROM the loader's cache (the Trainer does
    # the same wiring in fit())
    cache = loader.device_cache
    if cache is not None:
        cache.place()
    step = make_train_step(m, opt, cache=cache)
    losses = []
    key = jax.random.key(1)
    for i, batch in enumerate(loader):
        if i >= 12:
            break
        key, sub = jax.random.split(key)
        params, opt_state, loss, _ = step(
            params, opt_state, jax.tree.map(jnp.asarray, batch), sub
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_rf_alignment_matches_declared_geometry(model):
    """The declared ConvolutionSettings must describe the module's ACTUAL
    receptive field: output frame f may depend exactly on samples in
    [rf_start(f), rf_end(f)] (regression: round-2 review — SAME padding
    shifted the real grid ~290 samples off the declared one).

    Oracle: finite-difference dependence. A large perturbation at the rf
    boundary sample must change frame f; one sample outside must not.
    (LSTM excluded — it mixes all frames by design.)
    """
    from segma_tpu.models.sincnet import SincNetModule

    cs = model.conv_settings
    module = SincNetModule(
        n_labels=2, n_windows=49, filters=16, kernel_size=101, stride=10,
        hidden=32, lstm=None, dtype=jnp.float32,
    )
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(16_000).astype(np.float32) * 0.1
    params = module.init(jax.random.key(0), jnp.asarray(wav[None]))

    @jax.jit
    def frame(w, f):
        return module.apply(params, w[None])[0, f]

    f = 25
    lo, hi = cs.rf_start_i(f), cs.rf_end_i(f)
    assert 0 < lo and hi < wav.shape[0]
    base = np.asarray(frame(jnp.asarray(wav), f))

    def changes(t: int) -> bool:
        w2 = wav.copy()
        w2[t] += 1e3
        return not np.allclose(np.asarray(frame(jnp.asarray(w2), f)), base)

    assert changes(lo), "frame must depend on its first declared rf sample"
    assert changes(hi), "frame must depend on its last declared rf sample"
    assert not changes(lo - 1), "dependence before declared rf start"
    assert not changes(hi + 1), "dependence after declared rf end"
