"""The five Whisper-based segmentation models as one composable module.

Re-design of the reference's five classes (``src/segma/models/whisper/``)
around orthogonal axes — layer tap (last | weighted/average "surgical"),
temporal mixer (none | scan-BiLSTM), head (softmax MLP | per-label hydra):

| name             | tap       | mixer  | head   | truncation point  |
|------------------|-----------|--------|--------|-------------------|
| whisperidou      | last      | —      | mlp    | after head        |
| whisperimax      | last      | BiLSTM | mlp    | before LSTM       |
| surgical_whisper | weighted  | —      | mlp    | after head        |
| hydra_whisper    | last      | BiLSTM | hydra  | before LSTM       |
| surgical_hydra   | weighted  | BiLSTM | hydra  | after LSTM        |

Truncation points replicate the reference orderings (they are observable
through the bidirectional LSTM: ``whisper/hydra.py:75-81`` truncates before
the LSTM, ``whisper/surgical_hydra.py:101-106`` after). The log-mel
frontend and the 30 s padding both run in-graph on device
(``ops/melspec.whisper_input_features``), replacing the reference's
CPU-side feature extraction hook. Encoders are frozen: outputs pass through
``stop_gradient`` (no wasted backward) and the optimizer masks the
``encoder`` subtree; checkpoints exclude it.
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from segma_tpu.config import Config, LSTMConfig
from segma_tpu.models.base import ConvolutionSettings, SegmentationModel
from segma_tpu.models.layers import BiLSTM, HydraHeads, LayerWeightedSum, MLPHead
from segma_tpu.models.whisper.convert import (
    convert_encoder_params,
    read_encoder_config,
)
from segma_tpu.models.whisper.encoder import WhisperEncoder, WhisperEncoderConfig
from segma_tpu.ops.melspec import whisper_input_features
from segma_tpu.utils.encoders import LabelEncoder

WHISPER_CONV_SETTINGS = ConvolutionSettings(
    kernels=(400, 3, 3), strides=(160, 1, 2), paddings=(200, 1, 1)
)

VARIANTS = {
    # name: (tap, mixer, head, truncation)
    "whisperidou": ("last", None, "mlp", "after_head"),
    "whisperimax": ("last", "lstm", "mlp_stack", "before_lstm"),
    "surgical_whisper": ("weighted", None, "mlp", "after_head"),
    "hydra_whisper": ("last", "lstm", "hydra", "before_lstm"),
    "surgical_hydra": ("weighted", "lstm", "hydra", "after_lstm"),
}


class WhisperSegModule(nn.Module):
    """(B, T) waveform -> (B, n_windows, n_labels) logits."""

    enc_cfg: WhisperEncoderConfig
    n_labels: int
    n_windows: int
    variant: str
    reduction: str = "weighted"
    encoder_layers: tuple[int, ...] = ()  # 1-indexed layer picks; () = all
    lstm: LSTMConfig | None = None
    classifier_hidden: int = 256
    # fast_context: skip Whisper's fixed 30 s padding and run the encoder on
    # just the chunk's frames — ~(1500/ceil(chunk_f/320))x less attention
    # and MLP work; numerics differ slightly from the padded reference
    fast_context: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    # device mesh for sequence parallelism (config mesh.seq > 1): the
    # encoder shards its time axis per layer; the sequence is gathered
    # back ahead of the (sequential-scan) LSTM and the heads
    mesh: Any = None

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        tap, mixer, head, trunc = VARIANTS[self.variant]

        if self.fast_context:
            from segma_tpu.ops.melspec import log_mel_spectrogram

            mel = log_mel_spectrogram(wav)  # (B, T/160, 80)
            feats = jnp.swapaxes(mel, 1, 2)
        else:
            feats = whisper_input_features(wav)  # (B, n_mels, 3000)
        last, hidden = WhisperEncoder(
            self.enc_cfg, self.dtype, mesh=self.mesh, name="encoder"
        )(feats, output_hidden_states=(tap == "weighted"))

        if tap == "weighted":
            layer_outputs = hidden[1:]  # per-layer outputs, HF indexing
            picks = (
                sorted(i - 1 for i in self.encoder_layers)
                if self.encoder_layers
                else list(range(self.enc_cfg.n_layers))
            )
            stacked = jnp.stack([layer_outputs[i] for i in picks], axis=0)
            x = LayerWeightedSum(
                n_layers=len(picks), reduction=self.reduction, name="layer_mix"
            )(jax.lax.stop_gradient(stacked))
        else:
            x = jax.lax.stop_gradient(last)

        # sequence-parallel runs gather the time axis here: everything
        # downstream (scan-LSTM, tiny heads) wants the whole sequence local
        from segma_tpu.models.whisper.encoder import shard_time_axis

        x = shard_time_axis(x, self.mesh, spec=("data", None, None))

        if trunc == "before_lstm":
            x = x[:, : self.n_windows, :]

        if mixer == "lstm":
            assert self.lstm is not None
            # after_lstm variants only consume the first n_windows rows, so
            # the LAST layer's forward direction skips the padded tail —
            # bit-identical outputs (see BiLSTM.keep), ~1/4 less LSTM work
            # at whisper's padded 1500 frames
            x = BiLSTM(self.lstm, dtype=self.dtype, name="lstm_shared")(
                x,
                train=train,
                keep=self.n_windows if trunc == "after_lstm" else None,
            )

        if trunc == "after_lstm":
            x = x[:, : self.n_windows, :]

        if head == "mlp":
            logits = MLPHead(
                hidden=(self.classifier_hidden,),
                n_out=self.n_labels,
                dtype=self.dtype,
                name="classifier",
            )(x)
        elif head == "mlp_stack":
            # whisperimax: Linear(128) + LeakyReLU x2 -> classifier
            h = x
            for i in range(2):
                h = nn.leaky_relu(
                    nn.Dense(128, dtype=self.dtype, name=f"linear_{i}")(h)
                )
            logits = nn.Dense(self.n_labels, dtype=jnp.float32, name="classifier")(h)
        else:  # hydra
            logits = HydraHeads(self.n_labels, name="heads")(x)

        if trunc == "after_head":
            logits = logits[:, : self.n_windows, :]
        return logits.astype(jnp.float32)


def _encoder_cfg_for(encoder_path: str) -> WhisperEncoderConfig:
    """Snapshot config when present; name-based fallback otherwise."""
    snapshot = Path(encoder_path)
    if (snapshot / "config.json").exists():
        return read_encoder_config(snapshot)
    if "tiny" in encoder_path:
        return WhisperEncoderConfig.tiny()
    return WhisperEncoderConfig.base()


def build_whisper_model(
    name: str, label_encoder: LabelEncoder, config: Config
) -> SegmentationModel:
    mc = config.model.config
    enc_path = mc.encoder
    enc_cfg = _encoder_cfg_for(enc_path)

    n_windows = WHISPER_CONV_SETTINGS.n_windows(
        config.audio.chunk_duration_f, strict=config.audio.strict_frames
    )
    dtype = jnp.float32 if config.train.precision == "f32" else jnp.bfloat16
    mesh = None
    if config.mesh.seq > 1:
        import jax

        from segma_tpu.parallel.mesh import make_mesh

        # A seq-trained config must still build on fewer devices (e.g.
        # single-chip inference/serving with --mesh off): only bake the
        # seq constraints in when the visible devices actually fit the
        # configured layout — without a mesh the constraints are identity
        # and the math is unchanged.
        needed = config.mesh.seq * config.mesh.model
        if len(jax.devices()) % needed == 0:
            mesh = make_mesh(config)
    module = WhisperSegModule(
        enc_cfg=enc_cfg,
        n_labels=len(label_encoder.base_labels),
        n_windows=n_windows,
        variant=name,
        reduction=getattr(mc, "reduction", "weighted"),
        encoder_layers=tuple(getattr(mc, "encoder_layers", ()) or ()),
        lstm=getattr(mc, "lstm", None),
        classifier_hidden=getattr(mc, "classifier", 256),
        fast_context=getattr(mc, "fast_context", False),
        dtype=dtype,
        mesh=mesh,
    )

    pretrained_loader = None
    if (Path(enc_path) / "config.json").exists():

        def pretrained_loader(params: Any) -> Any:
            _, enc_params = convert_encoder_params(Path(enc_path))
            return {**params, "encoder": enc_params}

    else:
        warnings.warn(
            f"whisper snapshot {enc_path!r} not found — encoder randomly "
            "initialized (fine for tests, wrong for real training)",
            stacklevel=2,
        )

    _, _, head, _ = VARIANTS[name]
    return SegmentationModel(
        name=name,
        module=module,
        conv_settings=WHISPER_CONV_SETTINGS,
        label_encoder=label_encoder,
        config=config,
        loss_type="hydra" if head == "hydra" else "multiclass",
        class_weights=config.train.class_weights,
        frozen_prefixes=("encoder",),
        pretrained_loader=pretrained_loader,
    )
