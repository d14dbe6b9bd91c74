"""Shared flax building blocks for segmentation models.

TPU-first re-design of the reference's torch modules:

- the per-label "hydra" ``nn.Linear(h, 1)`` heads
  (``src/segma/models/whisper/surgical_hydra.py:68-74``) collapse into one
  fused ``Dense(h, n_labels)`` — mathematically identical, one MXU matmul
  instead of L tiny ones;
- the bi-LSTM becomes a ``lax.scan``-based flax RNN (sequential by nature,
  but scan keeps the graph compact and XLA pipelines the per-step matmuls);
- the "surgical" layer-weighted hidden-state reduction
  (``surgical_hydra.py:29-55``) keeps learnable-softmax vs fixed-average
  semantics.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from segma_tpu.config import LSTMConfig


class MLPHead(nn.Module):
    """Linear stack with ReLU between layers, final linear classifier.

    Mirrors the reference classifier ``Linear(d, 256) -> ReLU -> Linear(256,
    n_labels)`` (``whisperidou.py:24-28``) generalized over hidden sizes.
    """

    hidden: Sequence[int]
    n_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Dense(self.n_out, dtype=jnp.float32)(x)


class HydraHeads(nn.Module):
    """Per-label binary heads, fused into a single Dense(n_labels).

    Output (B, T, n_labels) raw logits — one column per label head.
    """

    n_labels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.n_labels, dtype=jnp.float32, name="heads")(x)


class BiLSTM(nn.Module):
    """Multi-layer (optionally bidirectional) scan-LSTM.

    Matches torch ``nn.LSTM(input_size, hidden_size, num_layers,
    bidirectional, dropout)`` semantics: dropout applies between layers
    (not after the last), and bidirectional layers concatenate forward and
    backward features.
    """

    cfg: LSTMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, keep: int | None = None
    ) -> jnp.ndarray:
        """``keep``: when the caller will only consume ``out[:, :keep]``
        (the surgical models truncate AFTER the LSTM — reference
        ``surgical_hydra.py:103-106`` runs the LSTM over whisper's full
        padded 1500 frames and slices to 199), the LAST layer's forward
        direction runs on ``x[:, :keep]`` only and the backward direction's
        output is sliced. Bit-identical to running full-length then
        slicing: a forward-scan state at t < keep never depends on inputs
        at t >= keep, while the backward direction still scans the whole
        tail (its kept outputs DO depend on it). Earlier layers must stay
        full-length — the next layer's backward direction consumes their
        outputs beyond ``keep``. Returns length ``keep`` when given.
        """
        # Cells are constructed in this scope, so their parameters bind as
        # OptimizedLSTMCell_{k} with k following construction order:
        # layer0-fwd, layer0-bwd, layer1-fwd, ... The reference-checkpoint
        # importer (convert_reference._convert_lstm) relies on this order.
        unroll = max(1, getattr(self.cfg, "unroll", 1))
        for layer in range(self.cfg.num_layers):
            last_layer = layer == self.cfg.num_layers - 1
            k = keep if (keep is not None and last_layer) else None
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(self.cfg.hidden_size, dtype=self.dtype),
                name=f"lstm_fwd_{layer}",
                unroll=unroll,
            )
            fwd_in = x[:, :k, :] if k is not None else x
            if self.cfg.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.cfg.hidden_size, dtype=self.dtype),
                    name=f"lstm_bwd_{layer}",
                    reverse=True,
                    keep_order=True,
                    unroll=unroll,
                )
                bwd_out = bwd(x)
                if k is not None:
                    bwd_out = bwd_out[:, :k, :]
                x = jnp.concatenate([fwd(fwd_in), bwd_out], axis=-1)
            else:
                x = fwd(fwd_in)
            if train and self.cfg.dropout > 0 and layer < self.cfg.num_layers - 1:
                x = nn.Dropout(self.cfg.dropout, deterministic=False)(x)
        return x

    @property
    def out_features(self) -> int:
        return self.cfg.hidden_size * (2 if self.cfg.bidirectional else 1)


class LayerWeightedSum(nn.Module):
    """Weighted reduction over a stack of encoder hidden states.

    ``reduction='weighted'``: learnable weights passed through softmax.
    ``reduction='average'``: fixed uniform average (non-learnable).
    Input (L, B, T, D) -> output (B, T, D).
    """

    n_layers: int
    reduction: str = "weighted"

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        if self.reduction == "weighted":
            w = self.param(
                "layer_weights",
                lambda _key: jnp.ones((self.n_layers,)) / self.n_layers,
            )
            w = nn.softmax(w, axis=0)
        elif self.reduction == "average":
            w = jnp.ones((self.n_layers,)) / self.n_layers
        else:
            raise ValueError(
                f"reduction must be 'average' or 'weighted', got {self.reduction!r}"
            )
        return jnp.einsum("l,lbtd->btd", w.astype(hidden_states.dtype), hidden_states)
