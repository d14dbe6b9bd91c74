"""Persistent XLA compilation cache setup.

First compiles through the remote-compile tunnel are slow (~20-40 s);
enabling JAX's persistent cache makes every later process reuse them.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | Path | None = None) -> None:
    import jax

    cache_dir = Path(
        cache_dir
        or os.environ.get("SEGMA_TPU_CACHE", Path.home() / ".cache" / "segma_tpu_xla")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
