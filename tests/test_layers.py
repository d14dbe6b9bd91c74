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


def test_bilstm_keep_matches_full_then_slice() -> None:
    """keep=K must be BIT-identical to running the full length and slicing
    to [:, :K] — the forward scan's state at t < K never sees t >= K, the
    backward direction still consumes the whole tail, and intermediate
    layers stay full-length for the next layer's backward direction."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 37, 24))
    model = BiLSTM(_cfg(1))
    params = model.init(jax.random.PRNGKey(4), x)

    full = model.apply(params, x)[:, :11, :]
    kept = model.apply(params, x, keep=11)
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(full))

    # keep >= T degenerates to the full run
    same = model.apply(params, x, keep=37)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(model.apply(params, x)))

    # train mode with inter-layer dropout: the mask is drawn on the
    # full-length tensor in BOTH variants, so exactness holds there too
    cfg_d = LSTMConfig(
        hidden_size=32, num_layers=2, bidirectional=True, dropout=0.5
    )
    model_d = BiLSTM(cfg_d)
    params_d = model_d.init(jax.random.PRNGKey(5), x)
    rng = {"dropout": jax.random.PRNGKey(6)}
    full_d = model_d.apply(params_d, x, train=True, rngs=rng)[:, :11, :]
    kept_d = model_d.apply(params_d, x, train=True, keep=11, rngs=rng)
    np.testing.assert_array_equal(np.asarray(kept_d), np.asarray(full_d))

    # unidirectional variant
    cfg_u = LSTMConfig(
        hidden_size=16, num_layers=2, bidirectional=False, dropout=0.0
    )
    model_u = BiLSTM(cfg_u)
    params_u = model_u.init(jax.random.PRNGKey(7), x)
    full_u = model_u.apply(params_u, x)[:, :11, :]
    kept_u = model_u.apply(params_u, x, keep=11)
    np.testing.assert_array_equal(np.asarray(kept_u), np.asarray(full_u))


def test_bilstm_unroll_param_tree_unchanged(unroll: int = 8) -> None:
    """Unroll must not change parameter names/shapes — the reference
    checkpoint importer relies on the OptimizedLSTMCell_{k} layout."""
    x = jnp.zeros((1, 7, 16))
    p1 = BiLSTM(_cfg(1)).init(jax.random.PRNGKey(0), x)
    p8 = BiLSTM(_cfg(unroll)).init(jax.random.PRNGKey(0), x)
    t1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p1)
    t8 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p8)
    assert t1 == t8
