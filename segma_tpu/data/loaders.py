"""Training data pipeline: random-crop sampler producing device-ready batches.

TPU-first re-design of ``src/segma/data/loaders.py:25-313``:

- the per-window InterLap label query (a ~199-iteration python loop per
  sample) becomes one vectorized ``IntervalIndex.query_windows`` broadcast;
- batches are assembled as pinned numpy arrays ``x: (B, chunk_f) float32``,
  ``y: (B, n_windows, n_labels) float32`` and handed to jit as-is — feature
  extraction (log-mel) runs *inside* the jitted model on device instead of in
  CPU dataloader workers;
- a background prefetch thread keeps the host->HBM feed double-buffered.

Virtual-epoch semantics match the reference: ``samples_per_epoch =
dataset_multiplier * max(total_audio_s / chunk_s, batch_size)``
(``loaders.py:219-249``), with drop-last batching.
"""

from __future__ import annotations

import queue
import threading
from math import ceil
from pathlib import Path
from typing import Any, Callable, Iterator

import numpy as np

from segma_tpu.config import Config
from segma_tpu.data.file_dataset import DatasetSubset, SegmaFileDataset
from segma_tpu.data.intervals import IntervalIndex
from segma_tpu.models.geometry import ConvolutionSettings
from segma_tpu.utils.conversions import frames_to_seconds, seconds_to_frames
from segma_tpu.utils.encoders import LabelEncoder
from segma_tpu.utils.io import get_samples_in_range


class DataLoaderError(Exception): ...


class BatchContractError(DataLoaderError):
    """A batch was wired into a step built for the OTHER data_cache mode.

    Host batches carry waveforms under ``"x"``; device-cache batches carry
    flat-buffer offsets under ``"offsets"`` (never ``"x"``) — the distinct
    keys turn a mode mismatch into this typed error at trace time instead
    of an ``IndexError`` deep inside a model's first conv."""


def generate_frames(
    conv_settings: ConvolutionSettings,
    sample_rate: int,
    chunk_duration_s: float = 2.0,
    strict: bool = True,
) -> np.ndarray:
    """(n_windows, 2) [rf_start, rf_end] per model output frame, clipped to
    the chunk (parity: ``loaders.py:259-294``)."""
    chunk_duration_f = int(seconds_to_frames(chunk_duration_s, sample_rate))
    n_windows = conv_settings.n_windows(chunk_duration_f, strict=strict)
    return conv_settings.rf_bounds(n_windows).clip(0, chunk_duration_f)


def windows_to_targets(windows: np.ndarray, index: IntervalIndex) -> np.ndarray:
    """Multi-hot targets for (offset) windows — one vectorized query."""
    return index.query_windows(windows)


DEFAULT_CACHE_GB = 8.0  # one source for the gate AND the budget


def _mem_available_bytes() -> int | None:
    """Host MemAvailable (bytes), or None where /proc/meminfo is absent."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except (OSError, ValueError, IndexError):
        return None
    return None


class AudioCache:
    """Thread-safe decoded-audio RAM cache shared by a subset's samplers.

    Tracks held bytes under a lock (entries can be float32, 2x the int16
    construction-time estimate); once the budget is reached, new files read
    directly instead of being cached."""

    def __init__(self, budget_bytes: int) -> None:
        self.budget = budget_bytes
        self._d: dict[int, np.ndarray] = {}
        self._held = 0
        self._lock = threading.Lock()

    def get(self, key: int) -> np.ndarray | None:
        return self._d.get(key)

    def put(self, key: int, arr: np.ndarray) -> None:
        with self._lock:
            if key in self._d:
                return
            if self._held + arr.nbytes <= self.budget:
                self._d[key] = arr
                self._held += arr.nbytes

    def __len__(self) -> int:
        return len(self._d)


class AudioSegmentationSampler:
    """Infinite random-crop sampler over one dataset subset.

    Files are drawn with probability proportional to audio duration, then a
    uniform start offset is drawn (reference ``loaders.py:141-155``).
    """

    def __init__(
        self,
        subset: DatasetSubset,
        config: Config,
        conv_settings: ConvolutionSettings,
        label_encoder: LabelEncoder,
        seed: int | None = None,
        host_hook: Callable[[np.ndarray], np.ndarray] | None = None,
        cache_audio_gb: float = DEFAULT_CACHE_GB,
        shared_audio_cache: "AudioCache | None" = None,
        device_bases: np.ndarray | None = None,
    ) -> None:
        self.uris = subset.uris
        self.durations = subset.durations
        self.indexes = subset.indexes
        self.config = config
        self.label_encoder = label_encoder
        self.host_hook = host_hook
        self.transport = config.train.transport
        if self.transport not in ("f32", "int16"):
            raise DataLoaderError(
                f"train.transport must be 'f32' or 'int16', "
                f"got {self.transport!r}"
            )
        # train.data_cache=device: the subset's audio is HBM-resident and
        # sample() emits (flat-buffer offset, targets) instead of shipping
        # the waveform — identical rng draws, so trajectories match the
        # host path bit for bit (tests/test_device_cache.py)
        self._device_bases = device_bases
        if device_bases is not None and host_hook is not None:
            raise DataLoaderError(
                "data_cache=device is incompatible with host-side audio "
                "hooks (feature extraction must run inside the jitted step)"
            )
        self._seed = seed
        self.rng = np.random.default_rng(seed)
        # decoded-audio RAM cache (int16): random crops re-read the same
        # files constantly; decoding each file once removes the dominant
        # host cost of the sampling loop. Disabled when the subset's
        # estimated size exceeds the budget (whole-file decodes that the
        # cache then rejects would be pure waste — ranged reads are cheap).
        self._audio_cache: AudioCache | None = None
        budget = int(cache_audio_gb * 1e9)
        total_bytes = int(subset.durations["audio_duration_f"].sum()) * 2
        if cache_audio_gb > 0 and total_bytes <= budget:
            # N workers over one subset share ONE cache (per-worker copies
            # would multiply host RAM by num_workers)
            self._audio_cache = (
                shared_audio_cache
                if shared_audio_cache is not None
                else AudioCache(budget)
            )

        if len(self.uris) != self.durations.shape[0]:
            raise DataLoaderError("Mismatch between URIs and durations.")

        self.windows = generate_frames(
            conv_settings=conv_settings,
            sample_rate=config.audio.sample_rate,
            chunk_duration_s=config.audio.chunk_duration_s,
            strict=config.audio.strict_frames,
        )
        self.chunk_f = config.audio.chunk_duration_f
        audio_f = self.durations["audio_duration_f"].astype(np.float64)
        self._weights = audio_f / audio_f.sum()

    @property
    def n_windows(self) -> int:
        return self.windows.shape[0]

    def reseed(self, epoch: int) -> None:
        """Re-derive the crop rng from ``(seed, epoch)`` instead of a stream
        position. This makes training trajectory-exact under resume: a run
        preempted at epoch N and resumed sees exactly the crops the
        uninterrupted run would have seen at N, N+1, ... (the reference's
        torch DataLoader streams cannot do this — worker rng state is lost
        on restart). No-op when unseeded."""
        if self._seed is not None:
            self.rng = np.random.default_rng((self._seed, epoch))

    def sample(self) -> tuple[np.ndarray, np.ndarray]:
        """One (waveform (chunk_f,), targets (n_windows, L)) pair."""
        uri_i = int(self.rng.choice(len(self.uris), p=self._weights))
        high = int(self.durations["audio_duration_f"][uri_i]) - self.chunk_f
        start_f = int(self.rng.integers(low=0, high=max(1, high)))

        if self._device_bases is not None:
            y = windows_to_targets(self.windows + start_f, self.indexes[uri_i])
            return (
                np.int32(self._device_bases[uri_i] + start_f),
                y,
            )

        audio_path = (
            Path(self.config.data.dataset_path) / "wav" / self.uris[uri_i]
        ).with_suffix(".wav")
        waveform = self._read_crop(uri_i, audio_path, start_f)
        if waveform.shape[0] < self.chunk_f:  # guard short tail reads
            waveform = np.pad(waveform, (0, self.chunk_f - waveform.shape[0]))

        y = windows_to_targets(self.windows + start_f, self.indexes[uri_i])
        if self.host_hook is not None:
            if waveform.dtype == np.int16:  # hooks expect float waveforms
                waveform = waveform.astype(np.float32) / 32768.0
            waveform = self.host_hook(waveform)
        elif waveform.dtype == np.int16:
            # train.transport=int16: ship the raw PCM crop; the jitted
            # train/eval steps normalize on device (x * 2^-15 there is
            # bit-identical to the host division — half the bytes/batch)
            return waveform, y
        return waveform.astype(np.float32), y

    def _read_crop(self, uri_i: int, audio_path: Path, start_f: int) -> np.ndarray:
        """chunk_f mono samples at start_f, from the RAM cache when enabled."""
        if self._audio_cache is not None:
            cached = self._audio_cache.get(uri_i)
            if cached is None:
                from segma_tpu.utils.io import read_pcm16_mono

                raw = read_pcm16_mono(audio_path)
                if raw is None:  # non-PCM16: cache as float32 mono
                    full = get_samples_in_range(audio_path, 0, -1)
                    cached = (
                        full.mean(axis=0) if full.shape[0] > 1 else full[0]
                    ).astype(np.float32)
                else:
                    cached = raw
                self._audio_cache.put(uri_i, cached)
            crop = cached[start_f : start_f + self.chunk_f]
            if crop.dtype == np.int16:
                if self.transport == "int16":
                    return np.array(crop)  # raw PCM16 for the device hop
                return crop.astype(np.float32) / 32768.0
            return np.array(crop, np.float32)
        waveform = get_samples_in_range(audio_path, start_f, self.chunk_f)
        if waveform.shape[0] > 1:  # downmix to mono
            waveform = waveform.mean(axis=0, keepdims=True)
        return waveform[0]

    def sample_batch(self, batch_size: int) -> dict[str, np.ndarray]:
        xs, ys = zip(*(self.sample() for _ in range(batch_size)))
        if self._device_bases is not None:
            # device-cache batches carry flat-buffer OFFSETS, keyed
            # distinctly from host waveform batches ("x") so wiring one
            # into a step built for the other raises BatchContractError
            # at trace time (see train._batch_input)
            return {"offsets": np.stack(xs), "y": np.stack(ys)}
        if any(x.dtype != xs[0].dtype for x in xs):
            # mixed sources under transport=int16 (some files not PCM16):
            # promote the whole batch to normalized f32 — np.stack's own
            # promotion would mix raw PCM magnitudes with [-1, 1] floats
            xs = [
                x.astype(np.float32) / 32768.0
                if x.dtype == np.int16
                else np.asarray(x, np.float32)
                for x in xs
            ]
        return {"x": np.stack(xs), "y": np.stack(ys)}

    def samples_per_epoch(self) -> int:
        """Virtual-epoch size (reference ``loaders.py:219-249``)."""
        total_audio_s = frames_to_seconds(
            int(self.durations["audio_duration_f"].sum())
        )
        return int(
            self.config.data.dataset_multiplier
            * max(
                ceil(total_audio_s / self.config.audio.chunk_duration_s),
                self.config.train.batch_size,
            )
        )


class PrefetchingLoader:
    """Background-thread batch producer (double-buffered host->device feed).

    ``num_workers`` > 1 runs several sampler threads (role of the
    reference's DataLoader worker processes, ``loaders.py:66``), each with
    its own derived seed — numpy's decode/label kernels release the GIL, so
    threads scale on multi-core hosts. Like torch multi-worker loading,
    batch ORDER is then nondeterministic; use 1 worker for bit-reproducible
    runs.
    """

    def __init__(
        self,
        sampler: AudioSegmentationSampler,
        batch_size: int,
        n_batches: int,
        prefetch: int = 2,
        extra_samplers: list[AudioSegmentationSampler] | None = None,
    ) -> None:
        self.sampler = sampler
        self.batch_size = batch_size
        self.n_batches = n_batches
        self.prefetch = prefetch
        self.extra_samplers = extra_samplers or []
        # set by SegmentationDataLoader under train.data_cache=device
        self.device_cache: Any = None

    def __len__(self) -> int:
        return self.n_batches

    def set_epoch(self, epoch: int) -> None:
        """Reseed every worker's sampler from ``(worker seed, epoch)`` —
        called by the Trainer at each epoch boundary so resumed runs replay
        the uninterrupted run's crop sequence exactly (at num_workers=1;
        multi-worker batch ORDER is nondeterministic either way)."""
        for s in (self.sampler, *self.extra_samplers):
            s.reseed(epoch)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        samplers = [self.sampler] + self.extra_samplers
        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, len(samplers)))
        stop = object()
        # split the batch budget across workers
        shares = [self.n_batches // len(samplers)] * len(samplers)
        shares[0] += self.n_batches - sum(shares)

        def producer(sampler, n):
            try:
                for _ in range(n):
                    q.put(sampler.sample_batch(self.batch_size))
            except BaseException as e:  # noqa: BLE001 — surface in consumer
                # a worker dying must FAIL the epoch, not silently shrink
                # it (train.py's step accounting trusts len(loader))
                q.put((stop, e))
            finally:
                q.put(stop)

        for sampler, n in zip(samplers, shares):
            threading.Thread(target=producer, args=(sampler, n), daemon=True).start()

        finished = 0
        while finished < len(samplers):
            item = q.get()
            if item is stop:
                finished += 1
                continue
            if isinstance(item, tuple) and len(item) == 2 and item[0] is stop:
                raise RuntimeError(
                    "data loader worker failed"
                ) from item[1]
            yield item


class SegmentationDataLoader:
    """Train/val loader factory bound to a loaded ``SegmaFileDataset``
    (role of the reference LightningDataModule, ``loaders.py:25-89``)."""

    def __init__(
        self,
        dataset: SegmaFileDataset,
        label_encoder: LabelEncoder,
        config: Config,
        conv_settings: ConvolutionSettings,
        host_hook: Callable | None = None,
        seed: int | None = None,
    ) -> None:
        self.dataset = dataset
        self.label_encoder = label_encoder
        self.config = config
        self.conv_settings = conv_settings
        self.host_hook = host_hook
        self.seed = seed if seed is not None else config.train.seed
        # data_cache=auto: bytes already committed to device buffers by
        # OTHER subsets (train before val) — the budget bounds the SUM of
        # this factory's subsets, not each one independently. Keyed by
        # seed_offset (one per subset) so re-building a loader is
        # idempotent, not double-counted.
        self._planned_device_bytes: dict[int, int] = {}

        if not dataset.is_loaded():
            dataset.load()

    def _loader(self, subset: DatasetSubset, seed_offset: int) -> PrefetchingLoader:
        import jax

        batch_size = self.config.train.batch_size
        n_procs, pid = jax.process_count(), jax.process_index()
        seed_base = self.seed
        if n_procs > 1:
            # multi-host: every controller samples from its own shard of the
            # file list and produces 1/n_procs of the global batch; the step
            # count comes from the GLOBAL subset (computed below, before
            # sharding) so all controllers run the same number of
            # collectives per epoch
            if batch_size % n_procs:
                raise DataLoaderError(
                    f"train.batch_size={batch_size} must divide evenly over "
                    f"{n_procs} processes"
                )
            if len(subset.uris) < n_procs:
                raise DataLoaderError(
                    f"subset has {len(subset.uris)} files but "
                    f"{n_procs} processes — every process needs at least one"
                )
            if seed_base is not None:
                # decorrelate the random-crop streams across controllers
                seed_base = seed_base + 7919 * pid

        # virtual-epoch step count from the FULL subset (identical on every
        # process regardless of how files shard)
        global_spe = int(
            self.config.data.dataset_multiplier
            * max(
                ceil(
                    frames_to_seconds(
                        int(subset.durations["audio_duration_f"].sum())
                    )
                    / self.config.audio.chunk_duration_s
                ),
                batch_size,
            )
        )
        n_batches = max(1, global_spe // batch_size)  # drop_last

        global_subset = subset  # pre-shard view: cache plans need ALL shards
        if n_procs > 1:
            subset = DatasetSubset(
                uris=subset.uris[pid::n_procs],
                durations=subset.durations[pid::n_procs],
                indexes=subset.indexes[pid::n_procs],
            )
            batch_size = batch_size // n_procs

        data_cache = self.config.train.data_cache
        if data_cache not in ("host", "device", "auto"):
            raise DataLoaderError(
                f"train.data_cache must be 'host', 'device' or 'auto', "
                f"got {data_cache!r}"
            )
        decision = data_cache
        decision_note = None
        buffer_contract: tuple[bool, int] | None = None
        if data_cache == "auto" and self.host_hook is not None:
            # host-side audio hooks run on the host by definition; resolve
            # BEFORE any planning (plan probes every file's header — waste
            # when the outcome is already decided)
            decision = "host"
            decision_note = "auto -> host (host_hook requires host-side waveforms)"
        if data_cache == "device" or decision == "auto":
            # header probes only (plan decodes nothing). Multi-host: every
            # controller computes ALL processes' shard plans from the SAME
            # global file list, so the device/host decision and the
            # cross-process buffer contract (one dtype, one padded row
            # length = the max shard) are bit-deterministic — a divergent
            # decision would desynchronize collective counts and hang
            from segma_tpu.data.device_cache import DeviceAudioCache

            plans = [
                DeviceAudioCache.plan(
                    s,
                    self.config.data.dataset_path,
                    self.config.audio.chunk_duration_f,
                )
                for s in (
                    [
                        DatasetSubset(
                            uris=global_subset.uris[p::n_procs],
                            durations=global_subset.durations[p::n_procs],
                            indexes=global_subset.indexes[p::n_procs],
                        )
                        for p in range(n_procs)
                    ]
                    if n_procs > 1
                    else [subset]
                )
            ]
            force_f32 = any(p[0] for p in plans)
            max_pos = max(p[4] for p in plans)
            buffer_contract = (force_f32, max_pos)
            # per-DEVICE bytes: each chip holds one (padded) process row
            planned = max_pos * (4 if force_f32 else 2)
            local_plan = plans[pid] if n_procs > 1 else plans[0]
            if data_cache == "device" and max_pos >= 2**31:
                # raise DETERMINISTICALLY on every controller (max_pos
                # comes from the global file list): letting only the
                # oversized shard's build() throw would leave the other
                # processes hanging at their first collective
                raise DataLoaderError(
                    f"train.data_cache=device: {max_pos} planned samples "
                    "exceed the int32 offset range (2^31) of the device "
                    "gather — use data_cache=host (or auto, which resolves "
                    "to host)"
                )
        if decision == "auto":
            budget = int(self.config.train.device_cache_budget_gb * 1e9)
            self._planned_device_bytes.pop(seed_offset, None)
            remaining = budget - sum(self._planned_device_bytes.values())
            # host-RAM guard is single-controller only: MemAvailable
            # differs across hosts and the decision must not diverge;
            # a multi-host build decodes only ~1/n of the data anyway
            avail = _mem_available_bytes() if n_procs == 1 else None
            if max_pos >= 2**31:
                # gather offsets are int32 (TPU x64 off): auto must
                # RESOLVE, never trip the explicit-device hard error
                decision = "host"
                reason = (
                    f"{max_pos} planned samples exceed the int32 "
                    "offset range (2^31) of the device gather"
                )
            elif planned > remaining:
                decision = "host"
                reason = (
                    f"{planned / 1e9:.2f} GB exceeds the remaining "
                    f"budget {max(remaining, 0) / 1e9:.2f} GB "
                    f"(train.device_cache_budget_gb="
                    f"{self.config.train.device_cache_budget_gb} bounds "
                    "ALL subsets jointly)"
                )
            elif avail is not None and planned > 0.8 * avail:
                # building the cache decodes ~1x the buffer into host
                # RAM before the upload; auto must not OOM the host
                decision = "host"
                reason = (
                    f"building needs ~{planned / 1e9:.2f} GB host RAM "
                    f"but only {avail / 1e9:.2f} GB is available"
                )
            else:
                decision = "device"
                reason = (
                    f"{planned / 1e6:.1f} MB fits the "
                    f"{remaining / 1e9:.1f} GB remaining budget"
                ) + (
                    f" (per-process rows over {n_procs} controllers)"
                    if n_procs > 1
                    else ""
                )
                self._planned_device_bytes[seed_offset] = planned
            decision_note = f"auto -> {decision} ({reason})"
        device_cache = None
        if decision == "device":
            from segma_tpu.data.device_cache import DeviceAudioCache

            force_f32, max_pos = buffer_contract
            device_cache = DeviceAudioCache.build(
                subset,
                self.config.data.dataset_path,
                self.config.audio.chunk_duration_f,
                force_f32=force_f32,
                pad_to=max_pos,
                plan=local_plan,
            )

        shared_cache = AudioCache(budget_bytes=int(DEFAULT_CACHE_GB * 1e9))

        def make_sampler(worker: int) -> AudioSegmentationSampler:
            return AudioSegmentationSampler(
                subset=subset,
                config=self.config,
                conv_settings=self.conv_settings,
                label_encoder=self.label_encoder,
                seed=None
                if seed_base is None
                else seed_base + seed_offset + 1000 * worker,
                host_hook=self.host_hook,
                # one decoded-audio cache per SUBSET, not per worker
                shared_audio_cache=shared_cache,
                device_bases=(
                    device_cache.bases if device_cache is not None else None
                ),
            )

        n_workers = max(1, self.config.train.dataloader.num_workers)
        sampler = make_sampler(0)
        extras = [make_sampler(w) for w in range(1, min(n_workers, n_batches))]
        loader = PrefetchingLoader(
            sampler, batch_size, n_batches, extra_samplers=extras
        )
        # the Trainer places this on the device/mesh and builds its jitted
        # steps' gathers from it (train.py wires it up in fit())
        loader.device_cache = device_cache
        # data_cache=auto: how this subset resolved (Trainer logs it)
        loader.data_cache_decision = decision_note
        return loader

    def train_dataloader(self) -> PrefetchingLoader:
        return self._loader(self.dataset.train, seed_offset=0)

    def val_dataloader(self) -> PrefetchingLoader:
        return self._loader(self.dataset.val, seed_offset=1)
