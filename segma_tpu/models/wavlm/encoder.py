"""WavLM encoder in flax, TPU-native.

WavLM (the backbone the reference snapshots but never wired into a model —
``scripts/save_load_wavlm.py``; SURVEY.md §2.8 calls it out as vestigial) is
the wav2vec2/HuBERT skeleton plus *gated relative position bias* attention,
matching HF ``WavLMModel`` (``do_stable_layer_norm=False``,
``feat_extract_norm='group'``):

- T5-style bucketed relative positions (num_buckets=320, max_distance=800)
  embedded to per-head biases; computed once in layer 0 and shared;
- every layer derives a per-head, per-query gate from its own hidden
  states: ``gate = a * (b * c - 1) + 2`` with (a, b) sigmoid halves of an
  8-wide projection and ``c`` a learned per-head constant; the gated bias
  adds to the pre-softmax scores.

The conv feature extractor and the post-norm layer structure are shared
with the HuBERT implementation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from segma_tpu.models.hubert.encoder import FeatureExtractor as _FE  # re-export
from segma_tpu.models.hubert.encoder import HubertEncoderConfig

FeatureExtractor = _FE


@dataclass(frozen=True)
class WavLMEncoderConfig(HubertEncoderConfig):
    num_buckets: int = 320
    max_distance: int = 800

    @classmethod
    def base(cls) -> "WavLMEncoderConfig":
        return cls()


@lru_cache(maxsize=8)
def relative_position_buckets(
    length: int, num_buckets: int = 320, max_distance: int = 800
) -> np.ndarray:
    """(length, length) int32 T5-style bucket ids (static per shape)."""
    half = num_buckets // 2
    ctx = np.arange(length)[:, None]
    mem = np.arange(length)[None, :]
    rel = mem - ctx
    buckets = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    is_small = rel < max_exact
    with np.errstate(divide="ignore"):
        large = (
            max_exact
            + (
                np.log(np.maximum(rel, 1) / max_exact)
                / math.log(max_distance / max_exact)
                * (half - max_exact)
            ).astype(np.int64)
        )
    large = np.minimum(large, half - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


class WavLMAttention(nn.Module):
    """MHA with gated relative position bias added to the scores."""

    d_model: int
    n_heads: int
    num_buckets: int = 320
    max_distance: int = 800
    has_relative_position_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, position_bias: jnp.ndarray | None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        b, t, _ = x.shape
        n_heads = self.n_heads
        head_dim = self.d_model // n_heads

        if position_bias is None:
            assert self.has_relative_position_bias, (
                "first layer must own the relative position embedding"
            )
            rel_embed = self.param(
                "rel_attn_embed",
                nn.initializers.normal(0.02),
                (self.num_buckets, n_heads),
            )
            buckets = jnp.asarray(
                relative_position_buckets(t, self.num_buckets, self.max_distance)
            )
            # (T, T, H) -> (H, T, T)
            position_bias = jnp.transpose(rel_embed[buckets], (2, 0, 1))

        # per-layer gate from this layer's hidden states
        heads_view = x.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        proj = nn.Dense(8, dtype=self.dtype, name="gru_rel_pos_linear")(heads_view)
        proj = proj.reshape(b, n_heads, t, 2, 4).sum(-1)  # (B, H, T, 2)
        gates = jax.nn.sigmoid(proj.astype(jnp.float32))
        gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # (B, H, T, 1)
        const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (1, n_heads, 1, 1)
        )
        gate_out = gate_a * (gate_b * const - 1.0) + 2.0  # (B, H, T, 1)
        gated_bias = gate_out * position_bias[None]  # (B, H, T, T)

        q = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(x)

        def split(tns):
            return tns.reshape(b, t, n_heads, head_dim)

        q = split(q) * (head_dim**-0.5)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, split(k), preferred_element_type=jnp.float32
        )
        scores = scores + gated_bias
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v))
        out = out.reshape(b, t, self.d_model)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)
        return out, position_bias


class WavLMTransformerLayer(nn.Module):
    """Post-norm block (HuBERT structure) with WavLM attention."""

    cfg: WavLMEncoderConfig
    has_relative_position_bias: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, position_bias: jnp.ndarray | None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        attn_out, position_bias = WavLMAttention(
            self.cfg.hidden_size,
            self.cfg.n_heads,
            self.cfg.num_buckets,
            self.cfg.max_distance,
            has_relative_position_bias=self.has_relative_position_bias,
            dtype=self.dtype,
            name="attention",
        )(x, position_bias)
        x = x + attn_out
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        h = nn.Dense(self.cfg.ffn_dim, dtype=self.dtype, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="output_dense")(h)
        x = x + h
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        return x, position_bias


class WavLMTransformer(nn.Module):
    """Projected conv features -> hidden states (HF WavLMEncoder semantics:
    hidden_states = input of each layer + final output)."""

    cfg: WavLMEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(
        self, feats: jnp.ndarray, output_hidden_states: bool = False
    ) -> tuple[jnp.ndarray, tuple[jnp.ndarray, ...]]:
        cfg = self.cfg
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="feature_layer_norm")(
            feats
        )
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="feature_projection")(x)

        pos = nn.Conv(
            cfg.hidden_size,
            (cfg.pos_conv_kernel,),
            padding=cfg.pos_conv_kernel // 2,
            feature_group_count=cfg.pos_conv_groups,
            dtype=self.dtype,
            name="pos_conv",
        )(x)
        if cfg.pos_conv_kernel % 2 == 0:
            pos = pos[:, :-1, :]
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)

        layer_cls = (
            nn.remat(WavLMTransformerLayer) if self.remat else WavLMTransformerLayer
        )
        hidden_states: list[jnp.ndarray] = []
        position_bias = None
        for i in range(cfg.n_layers):
            hidden_states.append(x)
            x, position_bias = layer_cls(
                cfg,
                has_relative_position_bias=(i == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, position_bias)
        hidden_states.append(x)
        if output_hidden_states:
            return x, tuple(hidden_states)
        return x, ()
