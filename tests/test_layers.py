"""Shared-layer unit tests (segma_tpu/models/layers.py).

The BiLSTM unroll knob must be a pure scheduling hint: any
``lstm.unroll`` value runs the same per-step math in the same order, so
outputs match unroll=1 to float tolerance (unrolling only changes how
XLA fuses consecutive steps). Reference LSTM semantics:
``src/segma/models/whisper/surgical_hydra.py`` (torch ``nn.LSTM``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segma_tpu.config import LSTMConfig
from segma_tpu.models.layers import BiLSTM


def _cfg(unroll: int) -> LSTMConfig:
    return LSTMConfig(
        hidden_size=32,
        num_layers=2,
        bidirectional=True,
        dropout=0.0,
        unroll=unroll,
    )


@pytest.mark.parametrize("unroll", [4, 8, 16])
def test_bilstm_unroll_matches_unroll1(unroll: int) -> None:
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 13, 24))

    base = BiLSTM(_cfg(1))
    params = base.init(jax.random.PRNGKey(1), x)
    ref = base.apply(params, x)

    # Same params, different unroll: identical math, different fusion.
    out = BiLSTM(_cfg(unroll)).apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bilstm_unroll_param_tree_unchanged(unroll: int = 8) -> None:
    """Unroll must not change parameter names/shapes — the reference
    checkpoint importer relies on the OptimizedLSTMCell_{k} layout."""
    x = jnp.zeros((1, 7, 16))
    p1 = BiLSTM(_cfg(1)).init(jax.random.PRNGKey(0), x)
    p8 = BiLSTM(_cfg(unroll)).init(jax.random.PRNGKey(0), x)
    t1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p1)
    t8 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p8)
    assert t1 == t8
