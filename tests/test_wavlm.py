"""WavLM encoder parity (vs HF WavLMModel) and model tests."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.models import Models
from segma_tpu.models.wavlm.encoder import (
    FeatureExtractor,
    WavLMEncoderConfig,
    WavLMTransformer,
    relative_position_buckets,
)
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"

TINY = WavLMEncoderConfig(
    hidden_size=64,
    n_layers=2,
    n_heads=2,
    ffn_dim=128,
    conv_dim=(32,) * 7,
    pos_conv_kernel=16,
    pos_conv_groups=4,
    num_buckets=32,
    max_distance=80,
)


@pytest.fixture(scope="module")
def hf_wavlm(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import WavLMConfig, WavLMModel

    cfg = WavLMConfig(
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.n_layers,
        num_attention_heads=TINY.n_heads,
        intermediate_size=TINY.ffn_dim,
        conv_dim=list(TINY.conv_dim),
        conv_kernel=list(TINY.conv_kernels),
        conv_stride=list(TINY.conv_strides),
        num_conv_pos_embeddings=TINY.pos_conv_kernel,
        num_conv_pos_embedding_groups=TINY.pos_conv_groups,
        num_buckets=TINY.num_buckets,
        max_bucket_distance=TINY.max_distance,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = WavLMModel(cfg).eval()
    out_dir = tmp_path_factory.mktemp("wavlm") / "tiny_wavlm"
    model.save_pretrained(out_dir)
    return out_dir, model


def test_bucket_function_matches_hf(hf_wavlm):
    import torch

    _, model = hf_wavlm
    attn = model.encoder.layers[0].attention
    t = 49
    ctx = torch.arange(t)[:, None]
    mem = torch.arange(t)[None, :]
    theirs = attn._relative_positions_bucket(mem - ctx).numpy()
    ours = relative_position_buckets(t, TINY.num_buckets, TINY.max_distance)
    np.testing.assert_array_equal(ours, theirs)


def test_wavlm_forward_parity(hf_wavlm):
    import torch

    snapshot, hf_model = hf_wavlm
    from segma_tpu.models.wavlm.convert import convert_wavlm_params

    cfg, fe_params, tr_params = convert_wavlm_params(snapshot)
    assert cfg == TINY

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 16_000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(wav), output_hidden_states=True)
    ref_last = ref.last_hidden_state.numpy()
    ref_hidden = [h.numpy() for h in ref.hidden_states]

    fe = FeatureExtractor(cfg, dtype=jnp.float32)
    feats = fe.apply({"params": fe_params}, jnp.asarray(wav))
    tr = WavLMTransformer(cfg, dtype=jnp.float32)
    got_last, got_hidden = tr.apply(
        {"params": tr_params}, feats, output_hidden_states=True
    )
    np.testing.assert_allclose(np.asarray(got_last), ref_last, atol=3e-4)
    assert len(got_hidden) == len(ref_hidden) == TINY.n_layers + 1
    for ours, theirs in zip(got_hidden, ref_hidden):
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-4)


def test_wavlm_model_build_and_forward():
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_wavlm_hydra",
            "model.config.wav_encoder=missing_wavlm_snapshot",
            "audio.chunk_duration_s=1.0",
            "audio.strict_frames=true",
            "train.precision=f32",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning, match="snapshot"):
        model = Models["surgical_wavlm_hydra"](enc, cfg)
    model.module = model.module.clone(enc_cfg=TINY)
    model.init_params(jax.random.key(0))
    wav = np.zeros((2, 16_000), np.float32)
    logits = model.apply(model.params, wav)
    assert logits.shape == (2, 49, 4)
    trainable, frozen = model.split_params()
    assert "feature_extractor" in frozen
    assert "encoder" in trainable
