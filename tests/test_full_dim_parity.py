"""Converter parity at PRODUCTION dimensions.

The regular encoder tests run at tiny dims (64d/2L), which cannot catch
dimension-dependent converter bugs: head-split reshapes that only misalign
when n_heads > 2, the grouped positional-conv weight layout at the real
kernel=128/groups=16 geometry, weight-norm resolution at full width, or
attention bias packing. Zero-egress blocks real pretrained snapshots, but
nothing blocks building full-size *random-weight* HF models in-test and
asserting forward parity at exactly the production shapes:

- whisper-base: d_model 512, 8 heads, 6 layers, ffn 2048, 1500 positions
- hubert-base:  hidden 768, 12 heads, 12 layers, ffn 3072, conv_dim 512x7,
  pos-conv kernel 128 / groups 16 (HF ``HubertConfig()`` defaults == base)
- wavlm-base:   as hubert + gated relative position bias (320 buckets,
  max distance 800; HF ``WavLMConfig()`` defaults == base)

Plus the torchaudio-style ``model.``-prefixed Lightning checkpoint
round-trip at full size (reference ``src/segma/models/hubert/utils.py:23-38``
strips that prefix from a real 768-d/12-layer checkpoint).

One batch each keeps runtime sane; tolerances are wider than the tiny tests
because f32 error accumulates over 12 layers at 768 width.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

WHISPER_BASE = dict(d_model=512, n_heads=8, n_layers=6, ffn_dim=2048)


def _assert_close(got: np.ndarray, ref: np.ndarray, atol: float) -> None:
    """Elementwise closeness plus a correlation sanity check (a converter
    that permutes heads can pass loose atol on near-zero activations)."""
    np.testing.assert_allclose(got, ref, atol=atol)
    flat_g, flat_r = got.ravel(), ref.ravel()
    corr = float(np.corrcoef(flat_g, flat_r)[0, 1])
    assert corr > 0.999999, f"correlation {corr}"


def test_whisper_base_dims_parity(tmp_path):
    """whisper-base widths: 8-head split at d_model 512 over 6 layers."""
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import (
        WhisperEncoder as HFEnc,
    )

    from segma_tpu.models.whisper.convert import convert_encoder_params
    from segma_tpu.models.whisper.encoder import (
        WhisperEncoder,
        WhisperEncoderConfig,
    )

    cfg = WhisperConfig(
        d_model=WHISPER_BASE["d_model"],
        encoder_attention_heads=WHISPER_BASE["n_heads"],
        encoder_layers=WHISPER_BASE["n_layers"],
        encoder_ffn_dim=WHISPER_BASE["ffn_dim"],
        decoder_attention_heads=WHISPER_BASE["n_heads"],
        decoder_layers=1,
        decoder_ffn_dim=WHISPER_BASE["ffn_dim"],
        num_mel_bins=80,
        max_source_positions=1500,
    )
    torch.manual_seed(100)
    hf = HFEnc(cfg).eval()
    snap = tmp_path / "whisper_base_encoder"
    hf.save_pretrained(snap)

    enc_cfg, params = convert_encoder_params(snap)
    assert enc_cfg == WhisperEncoderConfig(**WHISPER_BASE)

    rng = np.random.default_rng(100)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(mel)).last_hidden_state.numpy()

    flax_enc = WhisperEncoder(enc_cfg, dtype=jnp.float32)
    got = np.asarray(flax_enc.apply({"params": params}, jnp.asarray(mel))[0])
    assert got.shape == ref.shape == (1, 1500, 512)
    _assert_close(got, ref, atol=2e-3)


@pytest.fixture(scope="module")
def hf_hubert_base(tmp_path_factory):
    """Full hubert-base (HF defaults) with random weights, snapshotted."""
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig(
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    assert (cfg.hidden_size, cfg.num_hidden_layers, cfg.num_attention_heads) == (
        768,
        12,
        12,
    )
    assert (cfg.num_conv_pos_embeddings, cfg.num_conv_pos_embedding_groups) == (
        128,
        16,
    )
    torch.manual_seed(200)
    model = HubertModel(cfg).eval()
    snap = tmp_path_factory.mktemp("fulldim") / "hubert_base"
    model.save_pretrained(snap)
    return snap, model


def _hubert_ref_forward(model, wav: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        return model(torch.from_numpy(wav)).last_hidden_state.numpy()


def _hubert_flax_forward(cfg, fe_params, tr_params, wav: np.ndarray) -> np.ndarray:
    from segma_tpu.models.hubert.encoder import (
        FeatureExtractor,
        HubertTransformer,
    )

    feats = FeatureExtractor(cfg, dtype=jnp.float32).apply(
        {"params": fe_params}, jnp.asarray(wav)
    )
    return np.asarray(
        HubertTransformer(cfg, dtype=jnp.float32).apply(
            {"params": tr_params}, feats
        )[0]
    )


def test_hubert_base_dims_parity(hf_hubert_base):
    """hubert-base widths incl. the grouped pos-conv at kernel 128/groups 16
    — the weight layout the tiny test (k=16/g=4) cannot stress."""
    from segma_tpu.models.hubert.convert import convert_hubert_params

    snap, hf = hf_hubert_base
    cfg, fe_params, tr_params = convert_hubert_params(snap)
    assert (cfg.hidden_size, cfg.n_layers, cfg.n_heads) == (768, 12, 12)
    assert (cfg.pos_conv_kernel, cfg.pos_conv_groups) == (128, 16)

    rng = np.random.default_rng(200)
    wav = (rng.standard_normal((1, 16_000)) * 0.1).astype(np.float32)
    ref = _hubert_ref_forward(hf, wav)
    got = _hubert_flax_forward(cfg, fe_params, tr_params, wav)
    assert got.shape == ref.shape == (1, 49, 768)
    _assert_close(got, ref, atol=2e-3)


def test_hubert_model_prefixed_checkpoint_roundtrip(hf_hubert_base):
    """A torchaudio-naming, ``model.``-prefixed state dict at FULL size
    (the layout of a real finetuned checkpoint on disk, reference
    ``hubert/utils.py:23-38``) must normalize + convert to the same params
    as the HF snapshot path — asserted by identical forward output."""
    from segma_tpu.models.hubert.convert import (
        _normalize_keys,
        convert_hubert_params,
        convert_hubert_state_dict,
    )

    snap, hf = hf_hubert_base
    # rebuild the on-disk naming of a torchaudio/Lightning checkpoint
    sd = {}
    for k, v in hf.state_dict().items():
        if k == "masked_spec_embed":
            continue
        if k.startswith("feature_extractor."):
            k2 = k
        elif k.startswith("feature_projection."):
            k2 = f"encoder.{k}"
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
        else:
            k2 = k
        sd[f"model.wav2vec2.{k2}"] = v.numpy()

    cfg, fe_ref, tr_ref = convert_hubert_params(snap)
    fe_got, tr_got = convert_hubert_state_dict(_normalize_keys(sd), cfg)

    rng = np.random.default_rng(201)
    wav = (rng.standard_normal((1, 16_000)) * 0.1).astype(np.float32)
    ref = _hubert_flax_forward(cfg, fe_ref, tr_ref, wav)
    got = _hubert_flax_forward(cfg, fe_got, tr_got, wav)
    np.testing.assert_array_equal(got, ref)


def test_wavlm_base_dims_parity(tmp_path):
    """wavlm-base widths: gated relative position bias at 320 buckets /
    max distance 800 plus the 128/16 grouped pos-conv."""
    from transformers import WavLMConfig, WavLMModel

    from segma_tpu.models.wavlm.convert import convert_wavlm_params
    from segma_tpu.models.wavlm.encoder import (
        FeatureExtractor,
        WavLMTransformer,
    )

    cfg = WavLMConfig(
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    assert (cfg.hidden_size, cfg.num_hidden_layers, cfg.num_attention_heads) == (
        768,
        12,
        12,
    )
    assert (cfg.num_buckets, cfg.max_bucket_distance) == (320, 800)
    torch.manual_seed(300)
    hf = WavLMModel(cfg).eval()
    snap = tmp_path / "wavlm_base"
    hf.save_pretrained(snap)

    fcfg, fe_params, tr_params = convert_wavlm_params(snap)
    assert (fcfg.hidden_size, fcfg.n_layers, fcfg.n_heads) == (768, 12, 12)
    assert (fcfg.num_buckets, fcfg.max_distance) == (320, 800)

    rng = np.random.default_rng(300)
    wav = (rng.standard_normal((1, 16_000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()

    feats = FeatureExtractor(fcfg, dtype=jnp.float32).apply(
        {"params": fe_params}, jnp.asarray(wav)
    )
    got = np.asarray(
        WavLMTransformer(fcfg, dtype=jnp.float32).apply(
            {"params": tr_params}, feats
        )[0]
    )
    assert got.shape == ref.shape == (1, 49, 768)
    _assert_close(got, ref, atol=2e-3)
