"""Reference-checkpoint import: a torch replica of the reference's
surgical_hydra (HF WhisperEncoder + nn.LSTM + per-label heads, reference
``src/segma/models/whisper/surgical_hydra.py``) is built, its state_dict
saved with reference key naming, imported into the flax model — logits must
match the torch forward on identical features."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.models import Models
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"
TINY = dict(d_model=64, n_heads=2, n_layers=2, ffn_dim=128)
LABELS = ["KCHI", "OCH", "MAL", "FEM"]
LSTM_H = 16


@pytest.fixture(scope="module")
def torch_reference():
    """torch modules wired exactly like the reference surgical_hydra."""
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
    torch.manual_seed(7)
    encoder = HFEnc(cfg).eval()
    lstm = torch.nn.LSTM(
        input_size=TINY["d_model"],
        hidden_size=LSTM_H,
        num_layers=2,
        bidirectional=True,
        batch_first=True,
    ).eval()
    heads = torch.nn.ModuleDict(
        {f"linear_head_{label}": torch.nn.Linear(2 * LSTM_H, 1) for label in LABELS}
    ).eval()
    layer_weights = torch.nn.Parameter(torch.randn(TINY["n_layers"]))
    return encoder, lstm, heads, layer_weights


def _reference_state_dict(torch_reference):
    """state_dict with the reference's key naming."""
    encoder, lstm, heads, layer_weights = torch_reference
    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"w_encoder.{k}"] = v
    for k, v in lstm.state_dict().items():
        sd[f"lstm_shared.{k}"] = v
    for name, mod in heads.items():
        for k, v in mod.state_dict().items():
            sd[f"task_heads.{name}.{k}"] = v
    sd["layer_weights"] = layer_weights.detach()
    return sd


def _torch_forward(torch_reference, mel: np.ndarray, n_windows: int) -> np.ndarray:
    """Reference surgical_hydra forward (surgical_hydra.py:80-109)."""
    import torch

    encoder, lstm, heads, layer_weights = torch_reference
    with torch.no_grad():
        enc = encoder(torch.from_numpy(mel), output_hidden_states=True)
        hs = torch.stack(list(enc.hidden_states[1:]), dim=0)
        w = torch.softmax(layer_weights, dim=0)
        weighted = torch.einsum("l,l...->...", w, hs)
        lstm_out, _ = lstm(weighted)
        lstm_out = lstm_out[:, :n_windows, :]
        logits = torch.stack(
            [head(lstm_out) for head in heads.values()], dim=-1
        )  # (B, T, 1, L)
    return logits.squeeze(2).numpy()


def test_reference_checkpoint_import_forward_parity(torch_reference, tmp_path):
    import torch

    from segma_tpu.convert_reference import import_reference_checkpoint
    from segma_tpu.models.whisper.encoder import WhisperEncoderConfig
    from segma_tpu.ops.melspec import whisper_input_features

    ckpt = tmp_path / "best.ckpt"
    torch.save({"state_dict": _reference_state_dict(torch_reference)}, ckpt)

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_hydra",
            "model.config.encoder=reference_import_random",
            f"model.config.lstm={{hidden_size: {LSTM_H}, num_layers: 2, "
            "bidirectional: true, dropout: 0.0}",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
            "data.classes=[KCHI,OCH,MAL,FEM]",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models["surgical_hydra"](enc, cfg)
    model.module = model.module.clone(enc_cfg=WhisperEncoderConfig(**TINY))
    model.init_params(jax.random.key(0))

    params = import_reference_checkpoint(ckpt, model)

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 16_000)) * 0.1).astype(np.float32)
    got = np.asarray(model.apply(params, wav))  # (2, 49, 4)

    # torch replica on the SAME mel features (computed by our frontend)
    mel = np.asarray(whisper_input_features(jnp.asarray(wav)))
    ref = _torch_forward(torch_reference, mel, n_windows=49)

    assert got.shape == ref.shape == (2, 49, 4)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_import_rejects_unsupported_models():
    from segma_tpu.convert_reference import import_reference_checkpoint

    cfg = load_config(
        CONFIG_DIR / "default.yml", ["model.name=conv_vad"]
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    with pytest.raises(ValueError, match="surgical_hydra"):
        import_reference_checkpoint("whatever.ckpt", model)


def test_import_hydra_whisper_variant(torch_reference, tmp_path):
    """hydra_whisper (last-layer tap, truncate-before-LSTM) imports too."""
    import torch

    from segma_tpu.convert_reference import import_reference_checkpoint
    from segma_tpu.models.whisper.encoder import WhisperEncoderConfig

    sd = _reference_state_dict(torch_reference)
    del sd["layer_weights"]  # hydra_whisper has no surgical weights
    ckpt = tmp_path / "hydra.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=hydra_whisper",
            "model.config.encoder=reference_import_random",
            f"model.config.lstm={{hidden_size: {LSTM_H}, num_layers: 2, "
            "bidirectional: true, dropout: 0.0}",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
            "data.classes=[KCHI,OCH,MAL,FEM]",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models["hydra_whisper"](enc, cfg)
    model.module = model.module.clone(enc_cfg=WhisperEncoderConfig(**TINY))
    model.init_params(jax.random.key(0))
    params = import_reference_checkpoint(ckpt, model)
    assert "layer_mix" not in params
    wav = np.zeros((1, 16_000), np.float32)
    logits = model.apply(params, wav)
    assert logits.shape == (1, 49, 4)
    assert np.isfinite(np.asarray(logits)).all()
