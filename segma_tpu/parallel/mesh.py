"""Device mesh construction and sharding helpers.

The reference is strictly single-device (``scripts/train.py:163-166``
hardcodes ``devices=1``; SURVEY.md §2.6/§2.7). segma_tpu scales through one
explicit mesh owned here so every jitted entry point shards consistently:

- axis ``"data"``: batch / window parallelism (training batches and the
  embarrassingly-parallel inference window axis) — collectives are gradient
  psums riding ICI;
- axis ``"model"``: tensor parallelism for large encoder variants (attention
  heads / MLP features sharded; activations all-gathered by XLA as needed).

All communication is implicit: parameters and batches carry
``NamedSharding``s and XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segma_tpu.config import Config


def make_mesh(
    config: Config | None = None,
    devices: list | None = None,
    data: int | None = None,
    model: int | None = None,
    seq: int | None = None,
) -> Mesh:
    """Build the (data, seq, model) mesh.

    ``data = -1`` (default) uses all devices not claimed by ``seq*model``.
    ``seq`` (sequence parallelism over the encoder time axis) defaults
    to 1, in which case the axis is a harmless singleton.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model_sz = model if model is not None else (
        config.mesh.model if config is not None else 1
    )
    seq_sz = seq if seq is not None else (
        config.mesh.seq if config is not None else 1
    )
    data_sz = data if data is not None else (
        config.mesh.data if config is not None else -1
    )
    if data_sz == -1:
        if n % (model_sz * seq_sz):
            raise ValueError(
                f"{n} devices not divisible by seq={seq_sz} * model={model_sz}"
            )
        data_sz = n // (model_sz * seq_sz)
    if data_sz * seq_sz * model_sz != n:
        raise ValueError(
            f"mesh {data_sz}x{seq_sz}x{model_sz} does not match {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data_sz, seq_sz, model_sz)
    return Mesh(dev_array, axis_names=("data", "seq", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (batches, window stacks)."""
    return NamedSharding(mesh, P("data"))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh (small model params)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch with its leading axis split over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
