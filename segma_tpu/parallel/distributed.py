"""Multi-host initialization for TPU pods.

The reference's only multi-job facility is SLURM auto-requeue of a
single-GPU process (SURVEY.md §2.6). For TPU pods, segma_tpu uses JAX's
standard multi-controller model: every host runs the same program,
``jax.distributed.initialize()`` wires the controllers together, and the
mesh in ``parallel.mesh`` spans all chips of the slice; data loading
shards by process.

Call ``maybe_init_distributed()`` at entry-point start. It is a no-op on a
single host (including this repo's 1-chip dev environment) and resolves
coordinator/rank from the standard env vars on pods (``COORDINATOR_ADDRESS``
etc. are auto-detected by JAX on Cloud TPU).
"""

from __future__ import annotations

import os


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    Returns True when distributed mode was initialized.
    Detection: explicit ``SEGMA_TPU_MULTIHOST=1``, or a Cloud-TPU pod
    environment (``TPU_WORKER_HOSTNAMES`` listing several workers), or an
    explicit ``COORDINATOR_ADDRESS``.
    """
    explicit = os.environ.get("SEGMA_TPU_MULTIHOST") == "1"
    coordinator = os.environ.get("COORDINATOR_ADDRESS")
    workers = [
        w
        for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
        if w.strip()
    ]
    if not (explicit or coordinator or len(workers) > 1):
        return False

    import jax

    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
        if "PROCESS_COUNT" in os.environ:
            kwargs["num_processes"] = int(os.environ["PROCESS_COUNT"])
        if "PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def process_shard(items: list, process_index: int | None = None) -> list:
    """Split a work list across hosts (each host loads its own files)."""
    import jax

    idx = process_index if process_index is not None else jax.process_index()
    n = jax.process_count()
    return items[idx::n]
