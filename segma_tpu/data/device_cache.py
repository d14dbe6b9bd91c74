"""Device-resident training-data cache: a subset's entire audio in HBM.

Training through a slow host<->device link re-uploads the same audio every
epoch — the reference's sampler decodes and ships every crop from the host
(``src/segma/data/loaders.py:126-217``), and this build's host cache still
re-ships each batch. With ``train.data_cache=device`` every file is
uploaded ONCE (int16 whenever every source is 16-bit PCM — half the
bytes), and per batch only ``(crop offsets, labels)`` cross the link: the
jitted train/eval steps gather the waveform crops from HBM with a vmapped
``dynamic_slice``. The loss trajectory is bit-identical to host sampling
(same rng draws, same ``x * 2^-15`` on-device normalization; pinned by
``tests/test_device_cache.py``).

Layout: files are concatenated into one flat 1-D buffer; each file's slot
is sized ``max(metadata duration, chunk_f)`` — the same duration the
sampler draws crop starts from — so crops of short OR truncated files read
trailing zeros (exactly the host path's zero-padding) instead of the next
file's samples. Crop starts are drawn in ``[0, duration - chunk_f)`` so a
crop never crosses a file boundary.

Under a single-controller mesh the buffer is replicated (audio datasets at
these scales are a few hundred MB; each chip gathers its own batch shard
locally with no collectives — asserted by ``tests/test_parallel.py``).

Multi-host: controllers hold disjoint file shards, so no single replicated
buffer exists. Instead each process builds a cache from ITS shard and
``place()`` assembles ONE global ``(data_axis, L_pad)`` array whose row
``d`` is a copy of the owning process's local buffer (rows padded to the
deterministic cross-process maximum so shapes agree). ``make_gather()``
then runs the crop ``dynamic_slice`` inside ``shard_map`` over the
``data`` axis — each chip slices its OWN row, so gathers stay local and
the program is collective-free, exactly like the replicated single-host
path. Offsets are LOCAL to the process's buffer (the loader's sampler
draws them against local ``bases``), and each process's batch rows land on
its own devices via ``make_array_from_process_local_data`` — so row
content and offsets always agree. The cross-process contract (row pad
length, one buffer dtype) is computed by every process from the SAME
global file list (``loaders.py`` passes ``pad_to``/``force_f32``), keeping
every controller's decisions bit-deterministic.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from segma_tpu.data.file_dataset import DatasetSubset
from segma_tpu.utils.io import (
    get_samples_in_range,
    probe_pcm16_mono,
    read_pcm16_mono,
)


class DeviceAudioCache:
    """Host-built flat audio buffer + per-file base offsets.

    ``build()`` on the host, ``place()`` once onto the device/mesh; the
    jitted steps close over ``buf`` so it stays HBM-resident across calls.
    """

    def __init__(
        self,
        host_flat: np.ndarray,
        bases: np.ndarray,
        chunk_f: int,
        pad_to: int | None = None,
    ) -> None:
        self.host_flat = host_flat  # int16 (all-PCM16 sources) or float32
        self.bases = bases  # (n_files,) int32 slot starts
        self.chunk_f = chunk_f
        # multi-host row length: the max planned sample count over ALL
        # processes' shards (every controller computes it from the same
        # global file list) so per-process buffers pad to one global shape
        self.pad_to = pad_to
        self.buf: Any = None  # jax.Array after place()
        self._row_mesh: Any = None  # mesh when placed as per-process rows

    @classmethod
    def plan(
        cls, subset: DatasetSubset, dataset_path: str | Path, chunk_f: int
    ) -> tuple[bool, list[Path], list[int], list[int], int]:
        """Pass 1 — header probes only, nothing decoded: buffer dtype +
        per-file slot layout + total samples. ``train.data_cache=auto``
        uses ``plan_nbytes`` (this pass alone) to decide device vs host
        BEFORE allocating anything."""
        wav_dir = Path(dataset_path) / "wav"
        paths = [(wav_dir / uri).with_suffix(".wav") for uri in subset.uris]

        # The buffer dtype is decided before anything is decoded, and every
        # slot is sized from the SAME metadata duration the sampler draws
        # crop starts from (``loaders.py sample()``), NOT from the decoded
        # sample count: a truncated/corrupt file (fewer samples on disk
        # than the metadata claims) must read trailing zeros — exactly the
        # host path's zero-pad — never the next file's audio.
        any_f32 = not all(probe_pcm16_mono(p) for p in paths)
        bases: list[int] = []
        slots: list[int] = []
        pos = 0
        for dur in subset.durations["audio_duration_f"]:
            bases.append(pos)
            slot = max(int(dur), chunk_f)  # short files: zero-padded slot
            slots.append(slot)
            pos += slot
        return any_f32, paths, bases, slots, pos

    @classmethod
    def plan_nbytes(
        cls, subset: DatasetSubset, dataset_path: str | Path, chunk_f: int
    ) -> int:
        """Projected buffer bytes from header probes alone (no decode)."""
        any_f32, _, _, _, pos = cls.plan(subset, dataset_path, chunk_f)
        return pos * (4 if any_f32 else 2)

    @classmethod
    def build(
        cls,
        subset: DatasetSubset,
        dataset_path: str | Path,
        chunk_f: int,
        force_f32: bool = False,
        pad_to: int | None = None,
        plan: tuple | None = None,
    ) -> "DeviceAudioCache":
        """``force_f32``/``pad_to``: the cross-process buffer contract —
        multi-host rows must share one dtype and one padded length even
        when THIS process's shard is all-PCM16 or shorter (the loader
        computes both from the global file list). ``plan``: a precomputed
        :meth:`plan` result for this subset, so a caller that already
        planned (the loader's auto resolution probes every header) does
        not pay the file-header I/O twice."""
        any_f32, paths, bases, slots, pos = plan if plan is not None else (
            cls.plan(subset, dataset_path, chunk_f)
        )
        any_f32 = any_f32 or force_f32
        if pos >= 2**31:
            raise ValueError(
                f"device cache would hold {pos} samples (>= 2^31): offsets "
                "are int32 (TPU x64 is off) — use train.data_cache=host for "
                "datasets this large"
            )

        # Pass 2 — decode each file straight into its slot and drop it, so
        # peak host RAM is ~1x the buffer (not decoded-copies + buffer).
        flat = np.zeros(pos, np.float32 if any_f32 else np.int16)
        for path, base, slot in zip(paths, bases, slots):
            if any_f32:
                # one buffer, one dtype: full decode normalizes PCM16 by
                # /32768.0 — bit-identical to the host sampler's division
                full = get_samples_in_range(path, 0, -1)
                a = (
                    full.mean(axis=0) if full.shape[0] > 1 else full[0]
                ).astype(np.float32)
            else:
                a = read_pcm16_mono(path)
            # crops never start past (metadata duration - chunk_f), so
            # samples beyond the slot are unreachable — clamp the write
            # rather than spill into the next file's slot
            n = min(len(a), slot)
            flat[base : base + n] = a[:n]
        return cls(flat, np.asarray(bases, np.int32), chunk_f, pad_to=pad_to)

    @property
    def nbytes(self) -> int:
        return int(self.host_flat.nbytes)

    def place(self, mesh: Any = None) -> Any:
        """Upload the buffer; idempotent — the epoch loop may call it freely.

        Single-controller: replicated over the mesh (or the one device).
        Multi-host: no single replicated buffer exists (controllers hold
        disjoint file shards), so assemble ONE global ``(data, L_pad)``
        array whose row ``d`` is a copy of the owning process's LOCAL
        buffer — each chip then slices crops from its own row inside
        ``shard_map`` (see :meth:`make_gather`), keeping every gather
        local and the program collective-free."""
        if self.buf is not None:
            return self.buf
        import jax

        if jax.process_count() > 1:
            if mesh is None:
                raise RuntimeError(
                    "multi-host device cache needs a mesh: pass the run's "
                    "Mesh to place() so per-process rows can shard over "
                    "the data axis"
                )
            from jax.sharding import NamedSharding, PartitionSpec

            data_sz = mesh.shape["data"]
            # rows must be well defined: every device at one data-axis
            # coordinate (across seq/model) holds a copy of the SAME row,
            # so all of them must belong to one process. Group by the
            # NAMED axis — "data" need not be the leading mesh axis
            data_dim = mesh.axis_names.index("data")
            dev_rows = np.moveaxis(mesh.devices, data_dim, 0).reshape(
                data_sz, -1
            )
            for i in range(data_sz):
                owners = {d.process_index for d in dev_rows[i]}
                if len(owners) != 1:
                    raise ValueError(
                        "multi-host device cache requires each data-axis "
                        f"coordinate to be owned by ONE process (coordinate "
                        f"{i} spans processes {sorted(owners)}) — reshape "
                        "the mesh or use train.data_cache=host"
                    )
            pad = self.pad_to or len(self.host_flat)
            row = self.host_flat
            if len(row) < pad:
                padded = np.zeros(pad, row.dtype)
                padded[: len(row)] = row
                row = padded
            sharding = NamedSharding(mesh, PartitionSpec("data", None))
            pidx = jax.process_index()
            local = [
                d for d in mesh.devices.flat if d.process_index == pidx
            ]
            # one host->device upload, then device-to-device replication:
            # the host link is the slow path (tunnel/DCN); fan-out between
            # local chips rides ICI
            first = jax.device_put(row[None, :], local[0])
            shards = [first] + [jax.device_put(first, d) for d in local[1:]]
            self.buf = jax.make_array_from_single_device_arrays(
                (data_sz, pad), sharding, shards
            )
            self._row_mesh = mesh
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.buf = jax.device_put(
                self.host_flat, NamedSharding(mesh, PartitionSpec())
            )
        else:
            self.buf = jax.device_put(self.host_flat)
        return self.buf

    def gather_fn(self) -> Any:
        """(buf, offsets (B,) int32) -> (B, chunk_f) crops, for use inside
        jit with the placed buffer passed as an ARGUMENT.

        The buffer must be an argument rather than a closure capture
        because a multi-host global array spans non-addressable devices —
        JAX rejects closing over one inside jit (``train._bind_cache_buf``
        forwards ``self.buf`` at every call). XLA compiles the vmapped
        ``dynamic_slice`` into a local gather (no collectives under a
        mesh — the buffer is replicated).

        Multi-host (per-process row placement): the slice runs inside
        ``shard_map`` over the ``data`` axis, so each chip reads its OWN
        row with offsets LOCAL to its process's buffer — locality is by
        construction, not compiler inference, and the program stays
        collective-free exactly like the replicated path."""
        if self.buf is None:
            raise RuntimeError("place() the cache before building gathers")
        import jax

        chunk_f = self.chunk_f

        if self._row_mesh is not None:
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            def local_slice(buf_block: Any, offs_block: Any) -> Any:
                # buf_block (1, L_pad): this chip's copy of its process's
                # buffer; offs_block: its shard of the batch offsets
                return jax.vmap(
                    lambda o: jax.lax.dynamic_slice(
                        buf_block[0], (o,), (chunk_f,)
                    )
                )(offs_block)

            smapped = shard_map(
                local_slice,
                mesh=self._row_mesh,
                in_specs=(P("data", None), P("data")),
                out_specs=P("data"),
            )

            def gather_rows(buf: Any, offsets: Any) -> Any:
                return smapped(buf, offsets)

            return gather_rows

        def gather(buf: Any, offsets: Any) -> Any:
            return jax.vmap(
                lambda o: jax.lax.dynamic_slice(buf, (o,), (chunk_f,))
            )(offsets)

        return gather

    def make_gather(self) -> Any:
        """(offsets (B,) int32) -> (B, chunk_f) crops: :meth:`gather_fn`
        with the placed ``buf`` closed over — the single-controller
        convenience form used by tests and ad-hoc probes (closure capture
        of a fully-addressable array is fine under jit)."""
        g = self.gather_fn()
        buf = self.buf

        def gather(offsets: Any) -> Any:
            return g(buf, offsets)

        return gather
