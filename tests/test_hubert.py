"""HuBERT encoder parity (vs HF HubertModel) and model tests."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.models import Models
from segma_tpu.models.hubert.encoder import (
    FeatureExtractor,
    HubertEncoderConfig,
    HubertTransformer,
)
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"

TINY = HubertEncoderConfig(
    hidden_size=64,
    n_layers=2,
    n_heads=2,
    ffn_dim=128,
    conv_dim=(32,) * 7,
    pos_conv_kernel=16,
    pos_conv_groups=4,
)


@pytest.fixture(scope="module")
def hf_hubert(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig(
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.n_layers,
        num_attention_heads=TINY.n_heads,
        intermediate_size=TINY.ffn_dim,
        conv_dim=list(TINY.conv_dim),
        conv_kernel=list(TINY.conv_kernels),
        conv_stride=list(TINY.conv_strides),
        num_conv_pos_embeddings=TINY.pos_conv_kernel,
        num_conv_pos_embedding_groups=TINY.pos_conv_groups,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = HubertModel(cfg).eval()
    out_dir = tmp_path_factory.mktemp("hubert") / "tiny_hubert"
    model.save_pretrained(out_dir)
    return out_dir, model


def test_hubert_forward_parity(hf_hubert):
    """Converted flax HuBERT must match torch HF outputs (f32)."""
    import torch

    snapshot, hf_model = hf_hubert
    from segma_tpu.models.hubert.convert import convert_hubert_params

    cfg, fe_params, tr_params = convert_hubert_params(snapshot)
    assert cfg == TINY

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 16_000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(wav), output_hidden_states=True)
    ref_last = ref.last_hidden_state.numpy()
    ref_hidden = [h.numpy() for h in ref.hidden_states]

    fe = FeatureExtractor(cfg, dtype=jnp.float32)
    feats = fe.apply({"params": fe_params}, jnp.asarray(wav))
    tr = HubertTransformer(cfg, dtype=jnp.float32)
    got_last, got_hidden = tr.apply(
        {"params": tr_params}, feats, output_hidden_states=True
    )
    np.testing.assert_allclose(np.asarray(got_last), ref_last, atol=3e-4)
    assert len(got_hidden) == len(ref_hidden) == TINY.n_layers + 1
    for ours, theirs in zip(got_hidden, ref_hidden):
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-4)


def test_torchaudio_key_normalization():
    """torchaudio-style keys map onto the HF naming."""
    from segma_tpu.models.hubert.convert import _normalize_keys

    sd = {
        "model.wav2vec2.feature_extractor.conv_layers.0.conv.weight": np.zeros(1),
        "model.wav2vec2.encoder.feature_projection.projection.weight": np.zeros(1),
        "model.wav2vec2.encoder.transformer.pos_conv_embed.conv.weight_g": np.zeros(1),
        "model.wav2vec2.encoder.transformer.layers.0.attention.q_proj.weight": np.zeros(1),
    }
    out = _normalize_keys(sd)
    assert "feature_extractor.conv_layers.0.conv.weight" in out
    assert "feature_projection.projection.weight" in out
    assert "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in out
    assert "encoder.layers.0.attention.q_proj.weight" in out


# ---------------------------------------------------------------------------
# Model build
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hubert_model():
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_hubert_hydra",
            "model.config.wav_encoder=missing_hubert_snapshot",
            "audio.chunk_duration_s=1.0",
            "audio.strict_frames=true",
            "train.precision=f32",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning, match="snapshot"):
        model = Models["surgical_hubert_hydra"](enc, cfg)
    model.module = model.module.clone(enc_cfg=TINY)
    model.init_params(jax.random.key(0))
    return model


def test_hubert_geometry():
    from segma_tpu.models.hubert.builders import HUBERT_CONV_SETTINGS as CS

    assert CS.rf_step == 320
    assert CS.rf_size == 400
    # conv cascade on 16000 samples -> 49 frames (strict count matches)
    assert CS.n_windows(16_000, strict=True) == 49
    assert CS.n_windows(64_000, strict=True) == 199


def test_hubert_forward_shape(hubert_model):
    wav = np.zeros((2, 16_000), np.float32)
    logits = hubert_model.apply(hubert_model.params, wav)
    assert logits.shape == (2, 49, 4)


def test_hubert_frozen_partition(hubert_model):
    trainable, frozen = hubert_model.split_params()
    # freeze_encoder defaults False -> transformer trains, CNN frontend not
    assert "feature_extractor" in frozen
    assert "encoder" in trainable
    assert "heads" in trainable


def test_hubert_freeze_encoder_flag():
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_hubert_hydra",
            "model.config.wav_encoder=missing_hubert_snapshot",
            "model.config.freeze_encoder=true",
            "audio.chunk_duration_s=1.0",
            "audio.strict_frames=true",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models["surgical_hubert_hydra"](enc, cfg)
    assert model.frozen_prefixes == ("feature_extractor", "encoder")


def test_remat_gradients_match():
    """remat must not change values or gradients (only memory)."""
    import jax.numpy as jnp

    from segma_tpu.models.hubert.encoder import HubertTransformer

    feats = np.random.default_rng(0).standard_normal((1, 49, 32)).astype(np.float32)
    tr = HubertTransformer(TINY, dtype=jnp.float32, remat=False)
    params = tr.init(jax.random.key(0), jnp.asarray(feats))["params"]
    tr_r = HubertTransformer(TINY, dtype=jnp.float32, remat=True)

    def loss(p, mod):
        out, _ = mod.apply({"params": p}, jnp.asarray(feats))
        return jnp.sum(out**2)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, tr))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, tr_r))(params)
    assert float(v0) == float(v1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
