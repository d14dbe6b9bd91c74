"""Whisper audio encoder in flax, TPU-native.

Architecture parity with the HF ``WhisperEncoder`` the reference loads
frozen (``src/segma/models/whisper/utils.py:7-12``): two convs (k3/s1,
k3/s2) with GELU, sinusoidal position table, pre-LN transformer layers
(MHA with q/v/out bias and bias-free k), final LayerNorm. Hidden-state
collection follows HF semantics so the reference's "surgical" layer taps
(``surgical_hydra.py:81-85``) index identically:

    hidden_states[0]   = conv + positions output
    hidden_states[i]   = output of layer i           (1 <= i < n_layers)
    hidden_states[n]   = LayerNorm(output of layer n)

Everything is expressed as batched matmuls/convs in a configurable compute
dtype (bf16 by default) with f32 accumulation; attention is einsum-based so
XLA tiles it straight onto the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import warnings

import jax
import jax.numpy as jnp
import numpy as np

_seq_degrade_warned: set = set()


def shard_time_axis(
    x: jnp.ndarray, mesh: Any, spec: tuple = ("data", "seq", None)
) -> jnp.ndarray:
    """Sequence-parallel constraint on (B, T, D) activations.

    When the mesh carries a non-trivial ``seq`` axis, pins the time axis to
    it (default ``P("data", "seq", None)``) — LayerNorm/MLP compute is
    pointwise over time so it splits for free, and XLA inserts the
    all-gathers around attention. Pass ``("data", None, None)`` to gather
    the time axis back (e.g. ahead of a scan-LSTM, which must see the whole
    sequence locally). Identity when there is no seq axis, so single-device
    programs are untouched.
    """
    if (
        mesh is None
        or "seq" not in mesh.axis_names
        or mesh.shape["seq"] == 1
    ):
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    # drop axes the (static) shape cannot honor — e.g. the batch-1 dummy
    # that flax init traces, or a time axis not divisible by seq
    axes = [
        a if a is None or x.shape[d] % mesh.shape[a] == 0 else None
        for d, a in enumerate(spec)
    ]
    if "seq" in spec and "seq" not in axes:
        # the user configured sequence parallelism but this shape cannot
        # shard (e.g. whisper's padded T=1500 with seq=8): compute is
        # silently replicated seq-fold without a warning — say so once
        key = (x.shape, mesh.shape["seq"])
        if key not in _seq_degrade_warned:
            _seq_degrade_warned.add(key)
            warnings.warn(
                f"sequence parallelism disabled for activation shape "
                f"{x.shape}: time axis {x.shape[spec.index('seq')]} is not "
                f"divisible by mesh seq={mesh.shape['seq']} — compute will "
                "be replicated across the seq axis (pick a seq size that "
                "divides the encoder time length)",
                stacklevel=2,
            )
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*axes))
    )


@dataclass(frozen=True)
class WhisperEncoderConfig:
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 6
    ffn_dim: int = 2048
    n_mels: int = 80
    max_positions: int = 1500

    @classmethod
    def tiny(cls) -> "WhisperEncoderConfig":
        return cls(d_model=384, n_heads=6, n_layers=4, ffn_dim=1536)

    @classmethod
    def base(cls) -> "WhisperEncoderConfig":
        return cls(d_model=512, n_heads=8, n_layers=6, ffn_dim=2048)


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoid table: [sin | cos] halves, log-spaced timescales."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(
        -log_timescale_increment * np.arange(channels // 2, dtype=np.float64)
    )
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


class MultiHeadAttention(nn.Module):
    """Transformer MHA: q scaled by head_dim**-0.5. Whisper's k_proj is
    bias-free (``k_bias=False``); HuBERT's carries a bias.

    The softmax(qkᵀ)·v core goes through ``ops.attention.attention_core``:
    the Pallas flash kernel on TPU (VMEM-resident online softmax — at the
    padded 30 s context the einsum path's (B,8,1500,1500) f32 scores are
    ~2.3 GB of HBM traffic per layer), einsum elsewhere.
    """

    d_model: int
    n_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    k_bias: bool = False
    mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from segma_tpu.ops.attention import attention_core

        head_dim = self.d_model // self.n_heads
        q = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(
            self.d_model, use_bias=self.k_bias, dtype=self.dtype, name="k_proj"
        )(x)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.n_heads, head_dim)

        out = attention_core(
            split(q),
            split(k),
            split(v),
            sm_scale=head_dim**-0.5,
            mesh=self.mesh,
            dtype=self.dtype,
        )
        out = out.reshape(x.shape[0], x.shape[1], self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Pre-LN transformer block (self-attn + GELU MLP)."""

    cfg: WhisperEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16
    mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")(x)
        x = x + MultiHeadAttention(
            self.cfg.d_model, self.cfg.n_heads, self.dtype,
            mesh=self.mesh, name="self_attn",
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        h = nn.Dense(self.cfg.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.d_model, dtype=self.dtype, name="fc2")(h)
        return x + h


class WhisperEncoder(nn.Module):
    """(B, n_mels, frames) log-mel -> per-layer hidden states.

    Returns (last_hidden_state, tuple of n_layers+1 hidden states) with HF
    indexing semantics (see module docstring).
    """

    cfg: WhisperEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16
    # device mesh for sequence parallelism (mesh.seq > 1): encoder
    # activations carry a time-axis sharding constraint per layer
    mesh: Any = None

    @nn.compact
    def __call__(
        self, mel: jnp.ndarray, output_hidden_states: bool = False
    ) -> tuple[jnp.ndarray, tuple[jnp.ndarray, ...]]:
        cfg = self.cfg
        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)  # (B, frames, n_mels)
        # Anchor the conv frontend as NOT seq-sharded. Without this, the
        # per-layer seq constraint below propagates backward through
        # conv1/conv2 and the log-mel framing convs, and XLA shards their
        # time axis spatially — inserting halo-exchange collective-permutes
        # for a frontend that is a rounding error of encoder compute (and
        # whose CPU-backend rendezvous is flaky under virtual-device
        # oversubscription). Anchored, the reshard after conv2 is a local
        # slice: no communication at all.
        x = shard_time_axis(x, self.mesh, spec=("data", None, None))
        x = nn.gelu(
            nn.Conv(cfg.d_model, (3,), padding=1, dtype=self.dtype, name="conv1")(x),
            approximate=False,
        )
        x = shard_time_axis(x, self.mesh, spec=("data", None, None))
        x = nn.gelu(
            nn.Conv(
                cfg.d_model, (3,), strides=(2,), padding=1, dtype=self.dtype,
                name="conv2",
            )(x),
            approximate=False,
        )
        x = shard_time_axis(x, self.mesh, spec=("data", None, None))
        # fixed sinusoidal positions, stored as a (frozen) parameter so HF
        # snapshots (which persist the table) restore bit-identically
        pos = self.param(
            "embed_positions",
            lambda _key: sinusoidal_positions(cfg.max_positions, cfg.d_model),
        )
        x = x + pos[None, : x.shape[1], :].astype(self.dtype)
        x = shard_time_axis(x, self.mesh)

        hidden_states: list[jnp.ndarray] = [x]
        for i in range(cfg.n_layers):
            x = EncoderLayer(cfg, self.dtype, mesh=self.mesh, name=f"layers_{i}")(x)
            x = shard_time_axis(x, self.mesh)
            hidden_states.append(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        hidden_states[-1] = x  # HF: final entry carries the last LayerNorm
        if output_hidden_states:
            return x, tuple(hidden_states)
        return x, ()
