"""Whisper encoder parity and model-variant tests.

The converter test builds a REAL (randomly-initialized, tiny) HF
WhisperEncoder with transformers, snapshots it to disk, converts the weights
to the flax encoder, and asserts numerical agreement of the forward pass —
the same guarantee a converted whisper_tiny/base snapshot gets, no network
needed.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.models import Models
from segma_tpu.models.whisper.encoder import (
    WhisperEncoder,
    WhisperEncoderConfig,
    sinusoidal_positions,
)
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"

TINY = dict(d_model=64, n_heads=2, n_layers=2, ffn_dim=128)


@pytest.fixture(scope="module")
def hf_snapshot(tmp_path_factory):
    """Tiny random HF WhisperEncoder saved to disk."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder as HFEnc

    cfg = WhisperConfig(
        d_model=TINY["d_model"],
        encoder_attention_heads=TINY["n_heads"],
        encoder_layers=TINY["n_layers"],
        encoder_ffn_dim=TINY["ffn_dim"],
        decoder_attention_heads=TINY["n_heads"],
        decoder_layers=1,
        decoder_ffn_dim=TINY["ffn_dim"],
        num_mel_bins=80,
        max_source_positions=1500,
    )
    torch.manual_seed(0)
    enc = HFEnc(cfg).eval()
    out_dir = tmp_path_factory.mktemp("whisper") / "tiny_encoder"
    enc.save_pretrained(out_dir)
    return out_dir, enc


def test_sinusoids_match_hf(hf_snapshot):
    _, hf_enc = hf_snapshot
    theirs = hf_enc.embed_positions.weight.detach().numpy()
    ours = sinusoidal_positions(1500, TINY["d_model"])
    # HF computes the table in f32, ours in f64 -> agree to f32 rounding
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_encoder_forward_parity(hf_snapshot):
    """Converted flax encoder must match torch HF outputs closely (f32)."""
    import torch

    snapshot, hf_enc = hf_snapshot
    from segma_tpu.models.whisper.convert import (
        convert_encoder_params,
        read_encoder_config,
    )

    enc_cfg, params = convert_encoder_params(snapshot)
    assert enc_cfg == WhisperEncoderConfig(**TINY)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)

    with torch.no_grad():
        ref = hf_enc(torch.from_numpy(mel), output_hidden_states=True)
    ref_last = ref.last_hidden_state.numpy()
    ref_hidden = [h.numpy() for h in ref.hidden_states]

    flax_enc = WhisperEncoder(enc_cfg, dtype=jnp.float32)
    got_last, got_hidden = flax_enc.apply(
        {"params": params}, jnp.asarray(mel), output_hidden_states=True
    )
    np.testing.assert_allclose(np.asarray(got_last), ref_last, atol=2e-4)
    assert len(got_hidden) == len(ref_hidden) == TINY["n_layers"] + 1
    for ours, theirs in zip(got_hidden, ref_hidden):
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_read_encoder_config(hf_snapshot):
    from segma_tpu.models.whisper.convert import read_encoder_config

    cfg = read_encoder_config(hf_snapshot[0])
    assert cfg.d_model == 64 and cfg.n_layers == 2


# ---------------------------------------------------------------------------
# Model variants: shapes, geometry, loss types, frozen partitioning
# ---------------------------------------------------------------------------

ALL_VARIANTS = [
    "whisperidou",
    "whisperimax",
    "surgical_whisper",
    "hydra_whisper",
    "surgical_hydra",
]


def _tiny_cfg(name: str, extra: list[str] | None = None):
    """1 s chunks + tiny random encoder (fast CPU compile)."""
    return load_config(
        CONFIG_DIR / "default.yml",
        [
            f"model.name={name}",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
            "model.config.encoder=whisper_test_tiny_nonexistent",
        ]
        + (extra or []),
    )


@pytest.fixture(scope="module")
def tiny_variants():
    """Build each variant once (module-scoped: compiles are expensive)."""
    built = {}
    for name in ALL_VARIANTS:
        cfg = _tiny_cfg(name)
        # shrink the random encoder for test speed
        import segma_tpu.models.whisper.builders as B

        enc = MultiLabelEncoder(cfg.data.classes)
        with pytest.warns(UserWarning, match="snapshot"):
            model = Models[name](enc, cfg)
        # swap in a truly tiny encoder config before init
        model.module = model.module.clone(
            enc_cfg=B.WhisperEncoderConfig(**TINY)
        )
        model.init_params(jax.random.key(0))
        built[name] = model
    return built


@pytest.mark.parametrize("name", ALL_VARIANTS)
def test_variant_forward_shapes(tiny_variants, name):
    model = tiny_variants[name]
    wav = np.zeros((2, 16_000), np.float32)
    logits = model.apply(model.params, wav, train=False)
    # 1 s chunk -> 49 windows on the whisper grid
    assert logits.shape == (2, 49, 4)
    assert model.n_windows == 49
    assert logits.dtype == np.float32


@pytest.mark.parametrize("name", ALL_VARIANTS)
def test_variant_frozen_partition(tiny_variants, name):
    model = tiny_variants[name]
    trainable, frozen = model.split_params()
    assert "encoder" in frozen and "encoder" not in trainable
    assert len(trainable) > 0


def test_loss_types(tiny_variants):
    assert tiny_variants["whisperidou"].loss_type == "multiclass"
    assert tiny_variants["surgical_whisper"].loss_type == "multiclass"
    assert tiny_variants["hydra_whisper"].loss_type == "hydra"
    assert tiny_variants["surgical_hydra"].loss_type == "hydra"


def test_surgical_layer_picks():
    """encoder_layers: [1] must tap exactly one hidden state (1-indexed)."""
    cfg = _tiny_cfg("surgical_hydra", ["model.config.encoder_layers=[1]"])
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models["surgical_hydra"](enc, cfg)
    import segma_tpu.models.whisper.builders as B

    model.module = model.module.clone(enc_cfg=B.WhisperEncoderConfig(**TINY))
    params = model.init_params(jax.random.key(0))
    assert params["layer_mix"]["layer_weights"].shape == (1,)


def test_gradients_do_not_touch_encoder(tiny_variants):
    """stop_gradient + objective: encoder grads must be exactly zero."""
    model = tiny_variants["surgical_hydra"]
    wav = np.random.default_rng(0).standard_normal((2, 16_000)).astype(np.float32)
    y = np.zeros((2, 49, 4), np.float32)

    def loss_fn(p):
        logits = model.apply(p, wav, train=False)
        return model.loss(logits, y)[0]

    grads = jax.grad(loss_fn)(model.params)
    enc_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["encoder"])
    )
    head_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["heads"])
    )
    assert enc_norm == 0.0
    assert head_norm > 0.0


def test_fast_context_shapes_and_correlation():
    """fast_context runs the encoder on the chunk only; logits stay close to
    the padded path (same weights, shorter attention context)."""
    cfg = _tiny_cfg("surgical_hydra", ["model.config.fast_context=true"])
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        fast = Models["surgical_hydra"](enc, cfg)
    import segma_tpu.models.whisper.builders as B

    fast.module = fast.module.clone(enc_cfg=B.WhisperEncoderConfig(**TINY))
    assert fast.module.fast_context
    fast.init_params(jax.random.key(0))
    wav = np.random.default_rng(0).standard_normal((2, 16_000)).astype(np.float32)
    logits = fast.apply(fast.params, wav)
    assert logits.shape == (2, 49, 4)
