"""segma_tpu — a TPU-native audio-segmentation framework.

Re-imagining of the capabilities of arxaqapi/segma (frame-level multi-label
voice-type classification over 16 kHz audio) built on JAX/XLA/Pallas/pjit:

- frozen pretrained speech encoders (Whisper / HuBERT) ported to flax with
  offline weight converters,
- small trainable heads (scan-LSTM + per-label "hydra" linear heads),
- device-resident sliding-window inference over arbitrarily long WAV files
  with exact receptive-field bookkeeping, on-device thresholding and
  frame->interval run-length decode,
- RTTM/.aa interchange, threshold tuning, macro-average F-measure evaluation,
- SPMD scaling through ``jax.sharding.Mesh`` (see ``segma_tpu.parallel``).

Reference behaviour citations point into the upstream repo layout
(``src/segma/...``) so parity can be audited file by file.
"""

__version__ = "0.1.0"

from segma_tpu.annotation import AudioAnnotation

__all__ = ["AudioAnnotation", "__version__"]
