"""Parameter sharding rules: tensor parallelism for the encoder stacks.

The scaling recipe (SURVEY.md §2.6/§5.8): annotate parameter shardings over
the ``(data, model)`` mesh and let XLA insert the collectives.

Tensor-parallel layout for transformer encoders (Whisper / HuBERT):
- attention q/k/v projections: output features sharded over ``model``
  (head-parallel attention);
- attention out_proj: input features sharded over ``model`` (XLA closes the
  block with a psum);
- MLP fc1/intermediate: output features over ``model``; fc2/output: input
  features over ``model``;
- everything else (convs, norms, biases of row-sharded layers, LSTM, heads)
  replicated — they are tiny next to the encoder matmuls.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec for the kernel). First match wins.
TP_RULES: list[tuple[str, P]] = [
    # attention: column-parallel qkv, row-parallel out
    (r"(self_attn|attention)/(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"(self_attn|attention)/out_proj/kernel$", P("model", None)),
    # column-sharded layers also shard their bias
    (r"(self_attn|attention)/(q_proj|k_proj|v_proj)/bias$", P("model")),
    # MLP: column-parallel up, row-parallel down
    (r"(fc1|intermediate_dense)/kernel$", P(None, "model")),
    (r"(fc1|intermediate_dense)/bias$", P("model")),
    (r"(fc2|output_dense)/kernel$", P("model", None)),
]


def _path_str(path: Any) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def spec_for_path(path: Any, leaf: Any = None) -> P:
    s = _path_str(path)
    for pattern, spec in TP_RULES:
        if re.search(pattern, s):
            return spec
    return P()  # replicate


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching ``params`` via the TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for_path(path, leaf)), params
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree according to the TP rules."""
    return jax.device_put(params, param_shardings(params, mesh))
