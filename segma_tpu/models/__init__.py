"""Model registry (role of reference ``src/segma/models/__init__.py:8-15``).

The six reference model names map onto composable pieces — encoder
(whisper | hubert) x layer reduction (last | weighted/average) x temporal
head (none | bi-LSTM) x head type (softmax multiclass | per-label hydra) —
plus segma_tpu additions: ``surgical_wavlm_hydra`` (WavLM), the TPU-first
``conv_vad``, ``powerset_vad`` (subset-softmax head) and ``sincnet_hydra``
(learnable band-pass frontend).
"""

from __future__ import annotations

from typing import Callable

from segma_tpu.config import Config
from segma_tpu.models.base import ConvolutionSettings, SegmentationModel
from segma_tpu.models.vad import build_conv_vad, build_powerset_vad
from segma_tpu.utils.encoders import LabelEncoder

ModelBuilder = Callable[[LabelEncoder, Config], SegmentationModel]


def _lazy_whisper(name: str) -> ModelBuilder:
    def build(label_encoder: LabelEncoder, config: Config) -> SegmentationModel:
        from segma_tpu.models.whisper import build_whisper_model

        return build_whisper_model(name, label_encoder, config)

    return build


def _lazy_hubert(name: str) -> ModelBuilder:
    def build(label_encoder: LabelEncoder, config: Config) -> SegmentationModel:
        from segma_tpu.models.hubert import build_hubert_model

        return build_hubert_model(name, label_encoder, config)

    return build


def _lazy_wavlm(name: str) -> ModelBuilder:
    def build(label_encoder: LabelEncoder, config: Config) -> SegmentationModel:
        from segma_tpu.models.wavlm import build_wavlm_model

        return build_wavlm_model(name, label_encoder, config)

    return build


def _build_sincnet(label_encoder: LabelEncoder, config: Config) -> SegmentationModel:
    from segma_tpu.models.sincnet import build_sincnet_hydra

    return build_sincnet_hydra(label_encoder, config)


class _Registry(dict):
    """Model registry with a helpful unknown-name error."""

    def __missing__(self, name: str):
        raise KeyError(
            f"unknown model {name!r}; registered models: "
            + ", ".join(sorted(self))
        )


Models: dict[str, ModelBuilder] = _Registry({
    "whisperidou": _lazy_whisper("whisperidou"),
    "whisperimax": _lazy_whisper("whisperimax"),
    "surgical_whisper": _lazy_whisper("surgical_whisper"),
    "hydra_whisper": _lazy_whisper("hydra_whisper"),
    "surgical_hydra": _lazy_whisper("surgical_hydra"),
    "surgical_hubert_hydra": _lazy_hubert("surgical_hubert_hydra"),
    "surgical_wavlm_hydra": _lazy_wavlm("surgical_wavlm_hydra"),
    "conv_vad": build_conv_vad,
    "powerset_vad": build_powerset_vad,
    "sincnet_hydra": _build_sincnet,
})

__all__ = ["ConvolutionSettings", "Models", "SegmentationModel"]
