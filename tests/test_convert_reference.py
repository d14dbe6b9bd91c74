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


def _flax_whisper_model(name: str, extra: list[str]):
    """Tiny-encoder flax model for import tests (random encoder warning ok)."""
    from segma_tpu.models.whisper.encoder import WhisperEncoderConfig

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            f"model.name={name}",
            "model.config.encoder=reference_import_random",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
            "data.classes=[KCHI,OCH,MAL,FEM]",
            *extra,
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models[name](enc, cfg)
    model.module = model.module.clone(enc_cfg=WhisperEncoderConfig(**TINY))
    model.init_params(jax.random.key(0))
    return model


def _mel_for(wav: np.ndarray) -> np.ndarray:
    from segma_tpu.ops.melspec import whisper_input_features

    return np.asarray(whisper_input_features(jnp.asarray(wav)))


def test_import_whisperidou_parity(torch_reference, tmp_path):
    """whisperidou: encoder -> Sequential(Linear, ReLU, Linear) classifier,
    truncation after the head (reference whisperidou.py:24-43)."""
    import torch

    from segma_tpu.convert_reference import import_reference_checkpoint

    encoder = torch_reference[0]
    torch.manual_seed(11)
    classifier = torch.nn.Sequential(
        torch.nn.Linear(TINY["d_model"], 256),
        torch.nn.ReLU(),
        torch.nn.Linear(256, len(LABELS)),
    ).eval()

    sd = {f"w_encoder.{k}": v for k, v in encoder.state_dict().items()}
    for k, v in classifier.state_dict().items():
        sd[f"classifier.{k}"] = v
    ckpt = tmp_path / "idou.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    model = _flax_whisper_model("whisperidou", [])
    params = import_reference_checkpoint(ckpt, model)

    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((2, 16_000)) * 0.1).astype(np.float32)
    got = np.asarray(model.apply(params, wav))

    with torch.no_grad():
        enc_out = encoder(torch.from_numpy(_mel_for(wav))).last_hidden_state
        ref = classifier(enc_out)[:, :49, :].numpy()
    assert got.shape == ref.shape == (2, 49, 4)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_import_whisperimax_parity(torch_reference, tmp_path):
    """whisperimax: encoder -> truncate -> LSTM -> 2x(Linear+LeakyReLU) ->
    classifier (reference whisperimax.py:24-57)."""
    import torch

    from segma_tpu.convert_reference import import_reference_checkpoint

    encoder = torch_reference[0]
    torch.manual_seed(13)
    lstm = torch.nn.LSTM(
        input_size=TINY["d_model"],
        hidden_size=LSTM_H,
        num_layers=1,
        bidirectional=True,
        batch_first=True,
    ).eval()
    linear = torch.nn.Sequential(
        torch.nn.Linear(2 * LSTM_H, 128),
        torch.nn.LeakyReLU(),
        torch.nn.Linear(128, 128),
        torch.nn.LeakyReLU(),
    ).eval()
    classifier = torch.nn.Linear(128, len(LABELS)).eval()

    sd = {f"w_encoder.{k}": v for k, v in encoder.state_dict().items()}
    for k, v in lstm.state_dict().items():
        sd[f"lstm.{k}"] = v
    for k, v in linear.state_dict().items():
        sd[f"linear.{k}"] = v
    for k, v in classifier.state_dict().items():
        sd[f"classifier.{k}"] = v
    ckpt = tmp_path / "imax.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    model = _flax_whisper_model(
        "whisperimax",
        [
            f"model.config.lstm={{hidden_size: {LSTM_H}, num_layers: 1, "
            "bidirectional: true, dropout: 0.0}",
        ],
    )
    params = import_reference_checkpoint(ckpt, model)

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((2, 16_000)) * 0.1).astype(np.float32)
    got = np.asarray(model.apply(params, wav))

    with torch.no_grad():
        enc_out = encoder(torch.from_numpy(_mel_for(wav))).last_hidden_state
        lstm_out, _ = lstm(enc_out[:, :49, :])
        ref = classifier(linear(lstm_out)).numpy()
    assert got.shape == ref.shape == (2, 49, 4)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_import_surgical_whisper_parity(torch_reference, tmp_path):
    """surgical_whisper: weighted hidden-layer sum -> MLP classifier
    (reference surgical.py:36-96)."""
    import torch

    from segma_tpu.convert_reference import import_reference_checkpoint

    encoder = torch_reference[0]
    layer_weights = torch_reference[3]
    torch.manual_seed(17)
    classifier = torch.nn.Sequential(
        torch.nn.Linear(TINY["d_model"], 256),
        torch.nn.ReLU(),
        torch.nn.Linear(256, len(LABELS)),
    ).eval()

    sd = {f"w_encoder.{k}": v for k, v in encoder.state_dict().items()}
    for k, v in classifier.state_dict().items():
        sd[f"classifier.{k}"] = v
    sd["layer_weights"] = layer_weights.detach()
    ckpt = tmp_path / "surgical.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    model = _flax_whisper_model(
        "surgical_whisper",
        ["model.config.encoder_layers=[]", "model.config.reduction=weighted"],
    )
    params = import_reference_checkpoint(ckpt, model)
    assert "layer_mix" in params

    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((2, 16_000)) * 0.1).astype(np.float32)
    got = np.asarray(model.apply(params, wav))

    with torch.no_grad():
        enc_out = encoder(torch.from_numpy(_mel_for(wav)), output_hidden_states=True)
        hs = torch.stack(list(enc_out.hidden_states[1:]), dim=0)
        w = torch.softmax(layer_weights, dim=0)
        weighted = torch.einsum("l,l...->...", w, hs)
        ref = classifier(weighted)[:, :49, :].numpy()
    assert got.shape == ref.shape == (2, 49, 4)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_import_surgical_whisper_average_keeps_no_layer_param(
    torch_reference, tmp_path
):
    """reduction=average stores a buffer in the reference sd; the flax
    average reduction is parameter-free, so the import skips it."""
    import torch

    from segma_tpu.convert_reference import import_reference_checkpoint

    encoder = torch_reference[0]
    torch.manual_seed(19)
    classifier = torch.nn.Sequential(
        torch.nn.Linear(TINY["d_model"], 256),
        torch.nn.ReLU(),
        torch.nn.Linear(256, len(LABELS)),
    )
    sd = {f"w_encoder.{k}": v for k, v in encoder.state_dict().items()}
    for k, v in classifier.state_dict().items():
        sd[f"classifier.{k}"] = v
    sd["layer_weights"] = torch.ones(TINY["n_layers"]) / TINY["n_layers"]
    ckpt = tmp_path / "surgical_avg.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    model = _flax_whisper_model(
        "surgical_whisper",
        ["model.config.encoder_layers=[]", "model.config.reduction=average"],
    )
    params = import_reference_checkpoint(ckpt, model)
    assert "layer_mix" not in params
    logits = model.apply(params, np.zeros((1, 16_000), np.float32))
    assert np.isfinite(np.asarray(logits)).all()


TINY_HUBERT = dict(
    hidden_size=64,
    n_layers=2,
    n_heads=2,
    ffn_dim=128,
    conv_dim=(32,) * 7,
    pos_conv_kernel=16,
    pos_conv_groups=4,
)


def _torchaudio_style_lightning_sd(hf_model, heads, layer_weights):
    """HF HubertModel state_dict -> the torchaudio-style key naming a
    reference Lightning checkpoint carries (``wav2vec2.`` prefix,
    ``encoder.transformer.`` paths, ``weight_g``/``weight_v`` pos-conv)."""
    sd = {}
    for k, v in hf_model.state_dict().items():
        if k == "masked_spec_embed":
            continue
        if k.startswith("feature_extractor."):
            sd[f"wav2vec2.{k}"] = v
        elif k.startswith("feature_projection."):
            sd[f"wav2vec2.encoder.{k}"] = v
        elif k.startswith("encoder."):
            k2 = "encoder.transformer." + k[len("encoder."):]
            k2 = k2.replace(
                "pos_conv_embed.conv.parametrizations.weight.original0",
                "pos_conv_embed.conv.weight_g",
            )
            k2 = k2.replace(
                "pos_conv_embed.conv.parametrizations.weight.original1",
                "pos_conv_embed.conv.weight_v",
            )
            sd[f"wav2vec2.{k2}"] = v
        else:
            sd[f"wav2vec2.{k}"] = v
    for name, mod in heads.items():
        for k, v in mod.state_dict().items():
            sd[f"task_heads.{name}.{k}"] = v
    sd["layer_weights"] = layer_weights
    return sd


def test_import_surgical_hubert_hydra_parity(tmp_path):
    """hubert checkpoint import: full wav2vec2 tree + hydra heads; the flax
    model configured for the reference's ACTUAL behaviour (last hidden layer
    only, hubert/surgical_hydra.py:99-102) reproduces the torch logits."""
    torch = pytest.importorskip("torch")
    from transformers import HubertConfig, HubertModel

    from segma_tpu.convert_reference import import_reference_checkpoint
    from segma_tpu.models.hubert.encoder import HubertEncoderConfig

    hf_cfg = HubertConfig(
        hidden_size=TINY_HUBERT["hidden_size"],
        num_hidden_layers=TINY_HUBERT["n_layers"],
        num_attention_heads=TINY_HUBERT["n_heads"],
        intermediate_size=TINY_HUBERT["ffn_dim"],
        conv_dim=list(TINY_HUBERT["conv_dim"]),
        num_conv_pos_embeddings=TINY_HUBERT["pos_conv_kernel"],
        num_conv_pos_embedding_groups=TINY_HUBERT["pos_conv_groups"],
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(23)
    hf = HubertModel(hf_cfg).eval()
    heads = torch.nn.ModuleDict(
        {
            f"linear_head_{label}": torch.nn.Linear(
                TINY_HUBERT["hidden_size"], 1
            )
            for label in LABELS
        }
    ).eval()
    lw = torch.randn(TINY_HUBERT["n_layers"])
    ckpt = tmp_path / "hubert.ckpt"
    torch.save(
        {"state_dict": _torchaudio_style_lightning_sd(hf, heads, lw)}, ckpt
    )

    # last-layer-only + average = the reference's actual forward
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_hubert_hydra",
            "model.config.wav_encoder=reference_import_random",
            f"model.config.encoder_layers=[{TINY_HUBERT['n_layers']}]",
            "model.config.reduction=average",
            "model.config.freeze_encoder=true",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
            "data.classes=[KCHI,OCH,MAL,FEM]",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models["surgical_hubert_hydra"](enc, cfg)
    model.module = model.module.clone(
        enc_cfg=HubertEncoderConfig(**TINY_HUBERT)
    )
    model.init_params(jax.random.key(0))
    params = import_reference_checkpoint(ckpt, model)
    assert "layer_mix" not in params  # average reduction is parameter-free

    rng = np.random.default_rng(5)
    wav = (rng.standard_normal((2, 16_000)) * 0.1).astype(np.float32)
    got = np.asarray(model.apply(params, wav))

    with torch.no_grad():
        last = hf(torch.from_numpy(wav)).last_hidden_state
        ref = torch.stack(
            [head(last) for head in heads.values()], dim=-1
        ).squeeze(2).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3)


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
