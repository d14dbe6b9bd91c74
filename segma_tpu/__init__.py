"""segma_tpu — a TPU-native audio-segmentation framework.

Re-imagining of the capabilities of arxaqapi/segma (frame-level multi-label
voice-type classification over 16 kHz audio) built on JAX/XLA/Pallas/pjit:

- frozen pretrained speech encoders (Whisper / HuBERT / WavLM) ported to
  flax with offline weight converters,
- small trainable heads (scan-LSTM + per-label "hydra" linear heads, or a
  powerset-softmax head),
- device-resident sliding-window inference over arbitrarily long WAV files
  with exact receptive-field bookkeeping, on-device thresholding and
  frame->interval run-length decode (plus a streaming/online variant),
- RTTM/.aa interchange, threshold tuning, macro-average F-measure
  evaluation,
- SPMD scaling through ``jax.sharding.Mesh`` (see ``segma_tpu.parallel``).

Reference behaviour citations point into the upstream repo layout
(``src/segma/...``) so parity can be audited file by file (PARITY.md).

Public API shortcuts::

    from segma_tpu import Models, load_config, InferencePipeline, Trainer
"""

__version__ = "0.1.0"

from segma_tpu.annotation import AudioAnnotation

__all__ = [
    "AudioAnnotation",
    "InferencePipeline",
    "Models",
    "SegmaFileDataset",
    "SegmentationService",
    "StreamingSegmenter",
    "Trainer",
    "__version__",
    "load_config",
]


def __getattr__(name):  # lazy: keep bare `import segma_tpu` lightweight
    if name == "Models":
        from segma_tpu.models import Models

        return Models
    if name == "load_config":
        from segma_tpu.config import load_config

        return load_config
    if name == "InferencePipeline":
        from segma_tpu.inference import InferencePipeline

        return InferencePipeline
    if name == "StreamingSegmenter":
        from segma_tpu.streaming import StreamingSegmenter

        return StreamingSegmenter
    if name == "Trainer":
        from segma_tpu.train import Trainer

        return Trainer
    if name == "SegmaFileDataset":
        from segma_tpu.data import SegmaFileDataset

        return SegmaFileDataset
    if name == "SegmentationService":
        from segma_tpu.serve import SegmentationService

        return SegmentationService
    raise AttributeError(f"module 'segma_tpu' has no attribute {name!r}")
