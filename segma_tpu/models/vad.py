"""ConvVAD: TPU-first conv-frontend voice/segmentation model.

A segma_tpu addition (no reference equivalent): a purely convolutional model
on the Whisper frame grid — log-mel frontend computed in-graph, a small
residual conv stack, fused hydra heads. Declares the same receptive-field
geometry as the Whisper path (``(400,3,3)/(160,1,2)/(200,1,1)``, rf_step
320 = 20 ms) so it drops into identical chunk/label/decode bookkeeping.
This is the speed-of-light model behind the >500x real-time inference
target (BASELINE.md): every op is a strided conv or matmul on bf16, no
recurrence, no attention, no host feature extraction.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from segma_tpu.config import Config, ConvVADConfig
from segma_tpu.models.base import ConvolutionSettings, SegmentationModel
from segma_tpu.models.layers import HydraHeads
from segma_tpu.ops.melspec import log_mel_spectrogram
from segma_tpu.utils.encoders import LabelEncoder

CONV_SETTINGS = ConvolutionSettings(
    kernels=(400, 3, 3), strides=(160, 1, 2), paddings=(200, 1, 1)
)


class ConvVADModule(nn.Module):
    """(B, T) waveform -> (B, n_windows, n_labels) logits."""

    n_labels: int
    n_windows: int
    hidden: int = 256
    depth: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # frontend: k400 s160 p200 on the raw waveform (geometry layer 0)
        mel = log_mel_spectrogram(wav).astype(self.dtype)  # (B, T/160, 80)
        # geometry layers 1-2: k3 s1 p1, k3 s2 p1 -> one frame per 320 samples
        x = nn.gelu(nn.Conv(self.hidden, (3,), padding="SAME", dtype=self.dtype)(mel))
        x = nn.gelu(
            nn.Conv(
                self.hidden, (3,), strides=(2,), padding="SAME", dtype=self.dtype
            )(x)
        )
        # residual context blocks with growing dilation (stride-1 -> geometry
        # step unchanged; receptive field grows for context)
        for i in range(self.depth):
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.gelu(
                nn.Conv(
                    self.hidden,
                    (3,),
                    kernel_dilation=(2**i,),
                    padding="SAME",
                    dtype=self.dtype,
                )(h)
            )
            h = nn.Conv(self.hidden, (1,), dtype=self.dtype)(h)
            x = x + h
        x = nn.LayerNorm(dtype=self.dtype)(x)
        logits = HydraHeads(self.n_labels)(x)
        return logits[:, : self.n_windows, :].astype(jnp.float32)


def build_powerset_vad(
    label_encoder: LabelEncoder, config: Config
) -> SegmentationModel:
    """ConvVAD trunk with a powerset-softmax head (pyannote-3-style):
    every subset of <= max_set_size simultaneous labels is one class; the
    training objective is plain softmax CE over subsets; inference
    marginalizes back to per-label probabilities so the entire decode
    pipeline is unchanged."""
    from segma_tpu.utils.encoders import PowersetEncoder

    mc = config.model.config
    if not isinstance(mc, ConvVADConfig):
        mc = ConvVADConfig()
    pset = PowersetEncoder(
        list(label_encoder.base_labels), max_set_size=mc.max_set_size
    )
    n_windows = CONV_SETTINGS.n_windows(
        config.audio.chunk_duration_f, strict=config.audio.strict_frames
    )
    module = ConvVADModule(
        n_labels=len(pset),  # one output per subset class
        n_windows=n_windows,
        hidden=mc.hidden,
        depth=mc.depth,
        dtype=jnp.float32 if mc.dtype == "f32" else jnp.bfloat16,
    )
    return SegmentationModel(
        name="powerset_vad",
        module=module,
        conv_settings=CONV_SETTINGS,
        label_encoder=label_encoder,
        config=config,
        loss_type="powerset",
        powerset=pset,
    )


def build_conv_vad(
    label_encoder: LabelEncoder, config: Config
) -> SegmentationModel:
    mc = config.model.config
    if not isinstance(mc, ConvVADConfig):
        mc = ConvVADConfig()
    n_windows = CONV_SETTINGS.n_windows(
        config.audio.chunk_duration_f, strict=config.audio.strict_frames
    )
    module = ConvVADModule(
        n_labels=len(label_encoder.base_labels),
        n_windows=n_windows,
        hidden=mc.hidden,
        depth=mc.depth,
        dtype=jnp.float32 if mc.dtype == "f32" else jnp.bfloat16,
    )
    return SegmentationModel(
        name="conv_vad",
        module=module,
        conv_settings=CONV_SETTINGS,
        label_encoder=label_encoder,
        config=config,
        loss_type="hydra",
        class_weights=config.train.class_weights,
    )
