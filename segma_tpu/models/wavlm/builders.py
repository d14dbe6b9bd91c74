"""surgical_wavlm_hydra: WavLM encoder + layer-weighted reduction + hydra
heads on raw waveforms.

A segma_tpu extension: the reference snapshots WavLM but ships no model
class for it (``scripts/save_load_wavlm.py``; ``tests/test_models.py:56-71``
gates on names never registered). Same head structure and frame geometry as
the HuBERT variant (conv stack rf_step 320).
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from segma_tpu.config import Config
from segma_tpu.models.base import SegmentationModel
from segma_tpu.models.hubert.builders import HUBERT_CONV_SETTINGS
from segma_tpu.models.layers import HydraHeads, LayerWeightedSum
from segma_tpu.models.wavlm.convert import convert_wavlm_params, read_wavlm_config
from segma_tpu.models.wavlm.encoder import (
    FeatureExtractor,
    WavLMEncoderConfig,
    WavLMTransformer,
)
from segma_tpu.utils.encoders import LabelEncoder

WAVLM_CONV_SETTINGS = HUBERT_CONV_SETTINGS  # same conv frontend geometry


class WavLMSegModule(nn.Module):
    """(B, T) waveform -> (B, frames, n_labels) logits."""

    enc_cfg: WavLMEncoderConfig
    n_labels: int
    reduction: str = "weighted"
    encoder_layers: tuple[int, ...] = ()
    freeze_encoder: bool = False
    dropout: float = 0.5
    remat: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = FeatureExtractor(self.enc_cfg, self.dtype, name="feature_extractor")(
            wav
        )
        feats = jax.lax.stop_gradient(feats)
        _, hidden = WavLMTransformer(
            self.enc_cfg, self.dtype, remat=self.remat, name="encoder"
        )(
            feats, output_hidden_states=True
        )
        layer_outputs = hidden[1:]
        picks = (
            sorted(i - 1 for i in self.encoder_layers)
            if self.encoder_layers
            else list(range(self.enc_cfg.n_layers))
        )
        stacked = jnp.stack([layer_outputs[i] for i in picks], axis=0)
        if self.freeze_encoder:
            stacked = jax.lax.stop_gradient(stacked)
        x = LayerWeightedSum(
            n_layers=len(picks), reduction=self.reduction, name="layer_mix"
        )(stacked)
        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return HydraHeads(self.n_labels, name="heads")(x).astype(jnp.float32)


def build_wavlm_model(
    name: str, label_encoder: LabelEncoder, config: Config
) -> SegmentationModel:
    assert name == "surgical_wavlm_hydra"
    mc = config.model.config
    enc_path = Path(mc.wav_encoder)
    has_snapshot = enc_path.exists()
    enc_cfg = read_wavlm_config(enc_path) if has_snapshot else WavLMEncoderConfig.base()

    dtype = jnp.float32 if config.train.precision == "f32" else jnp.bfloat16
    module = WavLMSegModule(
        enc_cfg=enc_cfg,
        n_labels=len(label_encoder.base_labels),
        reduction=mc.reduction,
        encoder_layers=tuple(mc.encoder_layers or ()),
        freeze_encoder=mc.freeze_encoder,
        remat=config.train.remat,
        dtype=dtype,
    )

    pretrained_loader = None
    if has_snapshot:

        def pretrained_loader(params: Any) -> Any:
            _, fe, tr = convert_wavlm_params(enc_path)
            return {**params, "feature_extractor": fe, "encoder": tr}

    else:
        warnings.warn(
            f"wavlm snapshot {str(enc_path)!r} not found — encoder randomly "
            "initialized (fine for tests, wrong for real training)",
            stacklevel=2,
        )

    frozen = ("feature_extractor",) + (("encoder",) if mc.freeze_encoder else ())
    return SegmentationModel(
        name=name,
        module=module,
        conv_settings=WAVLM_CONV_SETTINGS,
        label_encoder=label_encoder,
        config=config,
        loss_type="hydra",
        class_weights=config.train.class_weights,
        frozen_prefixes=frozen,
        pretrained_loader=pretrained_loader,
    )
