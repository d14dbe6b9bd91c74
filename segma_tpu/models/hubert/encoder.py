"""HuBERT (wav2vec2-style) encoder in flax, TPU-native.

Architecture parity with the HuBERT-base encoder the reference loads via
torchaudio (``src/segma/models/hubert/utils.py:9-20``), matching the HF
``HubertModel`` semantics (``do_stable_layer_norm=False``,
``feat_extract_norm='group'``):

- feature extractor: 7 bias-free strided convs (k/s: 10/5, 3/2 x4, 2/2 x2),
  GroupNorm(512 groups) on the first layer only, exact GELU — rf_step 320
  samples (20 ms), same frame grid as the Whisper path;
- feature projection: LayerNorm(512) -> Dense(768);
- positional conv embedding: grouped conv (k=128, groups=16, pad 64) with
  the trailing element dropped (even-kernel SamePad), GELU;
- post-norm transformer layers; hidden_states collected as the INPUT of
  each layer plus the final output (HF indexing, n_layers+1 entries).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class HubertEncoderConfig:
    hidden_size: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    conv_dim: tuple[int, ...] = (512,) * 7
    conv_kernels: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16

    @classmethod
    def base(cls) -> "HubertEncoderConfig":
        return cls()


class FeatureExtractor(nn.Module):
    """Raw waveform (B, T) -> (B, frames, conv_dim[-1]) conv features."""

    cfg: HubertEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[:, :, None].astype(self.dtype)  # NWC
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernels, self.cfg.conv_strides)
        ):
            x = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if i == 0:
                # GroupNorm with one group per channel == per-channel
                # instance norm over time (HF GroupNormConvLayer)
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=1e-5, dtype=self.dtype,
                    name="group_norm",
                )(x)
            x = nn.gelu(x, approximate=False)
        return x


class HubertTransformerLayer(nn.Module):
    """Post-norm block: x+attn -> LN -> x+ff -> LN."""

    cfg: HubertEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from segma_tpu.models.whisper.encoder import MultiHeadAttention

        x = x + MultiHeadAttention(
            self.cfg.hidden_size, self.cfg.n_heads, self.dtype,
            k_bias=True, name="attention",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        h = nn.Dense(self.cfg.ffn_dim, dtype=self.dtype, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="output_dense")(h)
        x = x + h
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)


class HubertTransformer(nn.Module):
    """Projected features -> hidden states (HF HubertEncoder semantics).

    ``remat=True`` rematerializes each transformer layer in the backward
    pass (``jax.checkpoint``) — trades FLOPs for activation memory when the
    encoder is trained (``freeze_encoder: false``).
    """

    cfg: HubertEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(
        self, feats: jnp.ndarray, output_hidden_states: bool = False
    ) -> tuple[jnp.ndarray, tuple[jnp.ndarray, ...]]:
        cfg = self.cfg
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="feature_layer_norm")(feats)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="feature_projection")(x)

        pos = nn.Conv(
            cfg.hidden_size,
            (cfg.pos_conv_kernel,),
            padding=cfg.pos_conv_kernel // 2,
            feature_group_count=cfg.pos_conv_groups,
            dtype=self.dtype,
            name="pos_conv",
        )(x)
        if cfg.pos_conv_kernel % 2 == 0:  # SamePad: drop the extra frame
            pos = pos[:, :-1, :]
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)

        layer_cls = (
            nn.remat(HubertTransformerLayer) if self.remat else HubertTransformerLayer
        )
        hidden_states: list[jnp.ndarray] = []
        for i in range(cfg.n_layers):
            hidden_states.append(x)
            x = layer_cls(cfg, self.dtype, name=f"layers_{i}")(x)
        hidden_states.append(x)
        if output_hidden_states:
            return x, tuple(hidden_states)
        return x, ()
