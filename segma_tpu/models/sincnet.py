"""sincnet_hydra: learnable band-pass (SincNet) frontend + BiLSTM + hydra.

The reference declares a ``SincNetConfig`` dataclass but ships no SincNet
model (``src/segma/config/base.py:83-85`` — dead code, like the powerset
encoder). segma_tpu implements the capability for real, TPU-first: the
sinc filterbank is materialized in-graph from two (filters,) parameter
vectors every forward (a trivially small vectorized op), so the whole
model remains one jitted program of convs/matmuls — no host feature
extraction, no gather.

Design (pyannote-PyanNet-flavoured, re-gridded): sinc conv (kernel 251,
stride 10 by default) -> log-compression -> maxpool 4 -> two strided convs
(4, 2) => one frame per ``stride * 32`` samples (320 = the framework's
20 ms grid at the default stride), then a BiLSTM and fused hydra heads.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from segma_tpu.config import Config, LSTMConfig, SincNetHydraConfig
from segma_tpu.models.base import ConvolutionSettings, SegmentationModel
from segma_tpu.models.layers import BiLSTM, HydraHeads
from segma_tpu.utils.encoders import LabelEncoder


def _mel_spaced_edges(n_filters: int, sr: int) -> tuple[np.ndarray, np.ndarray]:
    """Initial (low_hz, band_hz) on a mel-spaced grid over [30, sr/2 - 100]."""
    lo_mel = 2595.0 * np.log10(1.0 + 30.0 / 700.0)
    hi_mel = 2595.0 * np.log10(1.0 + (sr / 2 - 100.0) / 700.0)
    mel = np.linspace(lo_mel, hi_mel, n_filters + 1)
    hz = 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    return hz[:-1].astype(np.float32), np.diff(hz).astype(np.float32)


class SincConv(nn.Module):
    """Parametrized sinc band-pass filterbank conv (SincNet, Ravanelli &
    Bengio 2018): each filter is defined by two scalars (low cut, band
    width); the (filters, kernel) impulse-response bank is rebuilt from
    them in-graph, Hamming-windowed, and applied as one strided conv."""

    filters: int = 80
    kernel_size: int = 251
    stride: int = 10
    sample_rate: int = 16_000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:  # (B, T) -> (B, T', F)
        sr = self.sample_rate
        low0, band0 = _mel_spaced_edges(self.filters, sr)
        low_hz = self.param("low_hz", lambda _k: jnp.asarray(low0))
        band_hz = self.param("band_hz", lambda _k: jnp.asarray(band0))

        f1 = self.min_low_hz + jnp.abs(low_hz)
        f2 = jnp.clip(
            f1 + self.min_band_hz + jnp.abs(band_hz), None, sr / 2.0
        )
        half = (self.kernel_size - 1) // 2
        t = jnp.arange(-half, half + 1, dtype=jnp.float32) / sr  # (K,)

        def low_pass(f):  # ideal LP impulse response, cutoff f: (F, K)
            return 2.0 * f[:, None] * jnp.sinc(2.0 * f[:, None] * t[None, :])

        window = 0.54 - 0.46 * jnp.cos(
            2.0 * jnp.pi * jnp.arange(self.kernel_size) / (self.kernel_size - 1)
        )
        bank = (low_pass(f2) - low_pass(f1)) * window[None, :]
        # unit peak response per filter (SincNet normalizes by the band)
        bank = bank / (2.0 * (f2 - f1))[:, None]

        kernel = bank.T[:, None, :].astype(self.dtype)  # (K, in=1, F)
        # EXPLICIT symmetric padding (not SAME): SAME's left pad depends on
        # the input length, which would silently shift the receptive-field
        # grid the decode timestamps are computed from. half = the padding
        # declared in build_sincnet_hydra's ConvolutionSettings.
        out = jax.lax.conv_general_dilated(
            wav[:, :, None].astype(self.dtype),
            kernel,
            window_strides=(self.stride,),
            padding=[(half, half)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out


class SincNetModule(nn.Module):
    """(B, T) waveform -> (B, n_windows, n_labels) logits."""

    n_labels: int
    n_windows: int
    filters: int = 80
    kernel_size: int = 251
    stride: int = 10
    hidden: int = 128
    lstm: LSTMConfig | None = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = SincConv(
            filters=self.filters,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dtype=self.dtype,
            name="sinc",
        )(wav)
        # log-compress rectified filter energies (stable dynamic range)
        x = jnp.log1p(jnp.abs(x.astype(jnp.float32))).astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        # explicit paddings throughout — each layer's (low, high) pad is
        # exactly the value declared in build_sincnet_hydra's
        # ConvolutionSettings (SAME would make the left pad input-length-
        # dependent and desync the rf grid from the decode math)
        x = nn.max_pool(x, (4,), strides=(4,), padding="VALID")
        x = nn.gelu(
            nn.Conv(self.hidden, (5,), strides=(4,), padding=((2, 2),),
                    dtype=self.dtype, name="conv1")(x)
        )
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.gelu(
            nn.Conv(self.hidden, (5,), strides=(2,), padding=((2, 2),),
                    dtype=self.dtype, name="conv2")(x)
        )
        x = nn.LayerNorm(dtype=self.dtype)(x)
        if self.lstm is not None:
            # only the first n_windows rows survive the final slice and the
            # heads are positionwise, so the last LSTM layer's forward
            # direction can skip the tail (bit-identical; see BiLSTM.keep)
            x = BiLSTM(self.lstm, dtype=self.dtype, name="lstm_shared")(
                x, train=train, keep=self.n_windows
            )
        logits = HydraHeads(self.n_labels, name="heads")(x)
        return logits[:, : self.n_windows, :].astype(jnp.float32)


def build_sincnet_hydra(
    label_encoder: LabelEncoder, config: Config
) -> SegmentationModel:
    mc = config.model.config
    if not isinstance(mc, SincNetHydraConfig):
        mc = SincNetHydraConfig()
    lstm = mc.lstm or LSTMConfig(
        hidden_size=128, num_layers=2, bidirectional=True, dropout=0.0
    )
    if mc.kernel_size % 2 == 0:
        raise ValueError(
            f"sincnet_hydra kernel_size must be odd, got {mc.kernel_size}"
        )
    # stack: sinc (k, s) -> pool (4, 4, VALID) -> conv (5, 4) -> conv (5, 2)
    # => rf_step = 32 * stride (= 320 at the default stride 10). The
    # paddings here are the LITERAL left pads the module applies (explicit
    # padding in SincNetModule) — the decode timestamps depend on them.
    conv_settings = ConvolutionSettings(
        kernels=(mc.kernel_size, 4, 5, 5),
        strides=(mc.stride, 4, 4, 2),
        paddings=(mc.kernel_size // 2, 0, 2, 2),
    )
    n_windows = conv_settings.n_windows(
        config.audio.chunk_duration_f, strict=config.audio.strict_frames
    )
    module = SincNetModule(
        n_labels=len(label_encoder.base_labels),
        n_windows=n_windows,
        filters=mc.filters,
        kernel_size=mc.kernel_size,
        stride=mc.stride,
        hidden=mc.hidden,
        lstm=lstm,
        dtype=jnp.float32 if mc.dtype == "f32" else jnp.bfloat16,
    )
    return SegmentationModel(
        name="sincnet_hydra",
        module=module,
        conv_settings=conv_settings,
        label_encoder=label_encoder,
        config=config,
        loss_type="hydra",
        class_weights=config.train.class_weights,
    )
