"""Self-contained inference artifacts (jax.export / StableHLO).

Production deployment without the model zoo: ``export_inference`` freezes a
trained model into a directory of serialized StableHLO programs — one
full-pipeline forward per chunk bucket (parameters baked in as constants)
plus the fused packed-run decode — and a JSON manifest carrying the chunk
geometry, labels and tuned thresholds. ``ExportedPipeline`` loads the
directory back in any process with jax installed — no flax module tree, no
registry, no checkpoint handling — and reproduces the live pipeline's
numerics end-to-end (pinned by ``tests/test_export.py``).

Artifacts are lowered for both ``cpu`` and ``tpu`` by default, so the same
directory serves on a TPU pod and in a CPU canary. The reference has no
deployment story at all (inference requires the full torch/Lightning stack
plus the checkpoint, ``/root/reference/src/segma/inference.py:398-440``);
this is the TPU-native answer: ship one directory.

Layout::

    manifest.json            geometry, labels, thresholds, buckets, version
    infer_<n_chunks>.jaxexp  waveform (1, padded_len) -> logits grid
    decode_<n_chunks>.jaxexp logits grid + thresholds + valid -> packed runs
    stream.jaxexp            one f32 chunk -> frame logits (online sessions)
    stream_batch<b>.jaxexp   b chunks -> frame logits (cross-session batch,
                             power-of-two buckets)

Each program embeds the params as constants (self-containment over size);
for encoder-heavy models every extra bucket costs roughly one weight copy
on disk — trim ``buckets`` when that matters.

Parity note (measured round 3, whisper-base on chip): the default
multi-platform export (``platforms=("cpu", "tpu")``) must trace the
PORTABLE mel frontend instead of the fused Pallas kernel, so mel-frontend
models can flip the odd borderline frame vs the live TPU path (observed:
one interval boundary 0.58 vs 0.60 s over two 60 s files — last-ulp logit
differences at the threshold). ``--platforms tpu`` keeps the Pallas
lowering and is **byte-identical** to the live pipeline; use it when the
artifact will only ever run on TPU and bit-parity matters. Models without
a mel frontend (conv_vad, hubert/wavlm waveform encoders) are
byte-identical either way.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from segma_tpu.inference import (
    Chunkyfier,
    InferencePipeline,
    create_intervals,
    decode_capacity,
    default_thresholds,
    threshold_vector,
    unpack_run_intervals,
)
from segma_tpu.models.base import ConvolutionSettings, SegmentationModel
from segma_tpu.ops.adpcm import AdpcmAudio, adpcm_encode_audio, encoded_nbytes

FORMAT_VERSION = 1
# cross-session streaming batch programs shipped with every artifact.
# Power-of-two buckets like the live ChunkForwardBatcher: padding a group
# up to the next bucket wastes <2x transfer, where one fixed max-size
# program measured 3.25x amplification (groups of 2-7 padded to 8) — on a
# slow host link that waste dominated the batching win.
STREAM_BATCHES = (2, 4, 8)
_TRANSPORT_DTYPES = {
    "f32": np.float32,
    "int16": np.int16,
    "mulaw": np.int8,
    "adpcm": np.uint8,
}


# packed-run capacity policy is shared with the live pipeline
# (inference.decode_capacity) so artifacts always match its decode programs


def _bucket_plan(needed: int, buckets: list[int]) -> list[int]:
    """Dispatch plan covering ``needed`` chunks with the exported buckets.

    DP minimizing ``shipped_chunks + OVERHEAD * n_dispatches``: shipped
    chunks model the host->device transfer (the measured bottleneck) and
    OVERHEAD charges each dispatch its ~80 ms blocking relay latency in
    chunk-equivalents, so the plan neither pads a 60-chunk file into the
    128 bucket (2x transfer) nor shreds an 88-chunk tail into [8]*11:
    with (8,32,128,512), 60 -> [32, 32], 88 -> [32, 32, 32], 127 -> [128].
    Everything above the largest bucket runs as full largest-bucket
    dispatches (zero padding); the sub-largest remainder is solved exactly
    by an iterative DP, which for near-multiple bucket families (the
    power-of-two-ish defaults) makes the whole plan optimal — for exotic
    bucket sets the greedy prefix can be off by one bucket's padding.
    """
    OVERHEAD = 8  # chunks of transfer one extra dispatch is "worth"
    buckets = sorted(set(buckets))
    largest = buckets[-1]
    plan: list[int] = []
    while needed >= largest:
        plan.append(largest)
        needed -= largest

    # bottom-up over the remainder (bounded by `largest`, so no recursion
    # depth concerns for any bucket set): cost[r] -> (total, plan tuple)
    cost: list[tuple[int, tuple[int, ...]]] = [(0, ())]
    for r in range(1, needed + 1):
        best = None
        for b in buckets:
            if b >= r:
                cand = (b + OVERHEAD, (b,))
            else:
                c, tail = cost[r - b]
                cand = (b + OVERHEAD + c, (b, *tail))
            if best is None or cand[0] < best[0]:
                best = cand
        cost.append(best)

    plan.extend(cost[needed][1])
    return plan


def export_inference(
    model: SegmentationModel,
    output_dir: Path | str,
    thresholds: dict | None = None,
    buckets: tuple[int, ...] = (8, 32, 128, 512),
    batch_size: int = 64,
    transport: str = "int16",
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    model_version: str | None = None,
    stream_batches: tuple[int, ...] = STREAM_BATCHES,
) -> Path:
    """Freeze ``model`` (with its current params) into an artifact dir.

    ``stream_batches`` sets the cross-session streaming batch buckets
    (each program embeds a weight copy — encoder-heavy models may want
    ``()`` to ship only the single-chunk stream program)."""
    import contextlib

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    pipe = InferencePipeline(model, model.params, batch_size=batch_size)
    ck = pipe.chunkyfier
    enc = model.label_encoder
    thresholds = thresholds or default_thresholds(enc.base_labels)
    dtype = _TRANSPORT_DTYPES[transport]
    params = model.params

    # Pallas kernels (the fused log-mel frontend) only lower for TPU; a
    # multi-platform artifact must trace the portable XLA formulation
    # instead. Single-platform TPU exports keep the fused kernel. The
    # switch is thread-local (ops.melspec.portable_lowering), so a live
    # pipeline tracing in another thread is unaffected.
    from segma_tpu.ops.melspec import portable_lowering

    force_portable = tuple(platforms) != ("tpu",)
    stream_batches = tuple(sorted({int(b) for b in stream_batches if b > 1}))
    ctx = portable_lowering() if force_portable else contextlib.nullcontext()
    with ctx:
        _export_programs(
            pipe, params, model, output_dir, buckets, transport, dtype,
            platforms, stream_batches,
        )

    from segma_tpu import __version__

    manifest = {
        "format_version": FORMAT_VERSION,
        "framework_version": __version__,
        "model_name": model.name,
        "labels": list(enc.base_labels),
        "sample_rate": model.config.audio.sample_rate,
        "chunk_duration_f": ck.chunk_duration_f,
        "chunk_stride": ck.chunk_stride,
        "n_windows": ck.n_windows,
        "rf_step": int(model.conv_settings.rf_step),
        "strict_frames": model.config.audio.strict_frames,
        "reference_tail": model.config.audio.reference_tail,
        "transport": transport,
        "buckets": sorted(set(buckets)),
        "decode_caps": {
            str(n): decode_capacity(n * ck.n_windows) for n in sorted(set(buckets))
        },
        "thresholds": thresholds,
        "platforms": list(platforms),
        # provenance: who built this artifact and when (bundle manifests
        # and /v1/models surface these so deployments can tell versions
        # apart without diffing program bytes)
        "model_version": model_version,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # this build ships stream.jaxexp; loaders check the file (older
        # artifacts lack both the key and the program)
        "streaming": True,
        "stream_batches": list(stream_batches),
        # input dtypes of the frozen stream programs: stream.jaxexp is f32,
        # stream_int16.jaxexp takes raw PCM16 (device-normalized), and the
        # stream_batch<b>.jaxexp buckets are traced on stream_batch_dtype.
        # Loaders treat a missing key as the r3 layout (f32 everywhere).
        "stream_int16": True,
        "stream_batch_dtype": "int16",
    }
    (output_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return output_dir


def _export_programs(
    pipe: InferencePipeline,
    params: Any,
    model: SegmentationModel,
    output_dir: Path,
    buckets: tuple[int, ...],
    transport: str,
    dtype: Any,
    platforms: tuple[str, ...],
    stream_batches: tuple[int, ...],
) -> None:
    ck = pipe.chunkyfier
    buckets = tuple(sorted(set(buckets)))
    for n_chunks in buckets:
        padded_len = n_chunks * ck.chunk_stride + ck.chunk_duration_f
        in_len = (
            encoded_nbytes(padded_len) if transport == "adpcm" else padded_len
        )

        def infer(audio, _n=n_chunks):
            return pipe._infer_jit(params, audio, _n)[0]

        exp = jax_export.export(jax.jit(infer), platforms=platforms)(
            jax.ShapeDtypeStruct((1, in_len), dtype)
        )
        (output_dir / f"infer_{n_chunks}.jaxexp").write_bytes(exp.serialize())

        rows = n_chunks * ck.n_windows
        cap = decode_capacity(rows)

        def decode(logits, thr, valid, _cap=cap):
            return pipe._decode_packed_jit(logits, thr, valid, _cap)

        exp_d = jax_export.export(jax.jit(decode), platforms=platforms)(
            jax.ShapeDtypeStruct((rows, model.n_labels), np.float32),
            jax.ShapeDtypeStruct((model.n_labels,), np.float32),
            jax.ShapeDtypeStruct((), np.int32),
        )
        (output_dir / f"decode_{n_chunks}.jaxexp").write_bytes(
            exp_d.serialize()
        )

    # streaming forwards: one chunk -> per-frame logits, the same program
    # shape as streaming.make_streaming_forward, so a frozen artifact can
    # serve /v1/stream/* too. Two single-chunk variants ship:
    #   stream.jaxexp        f32 input (universal fallback, back-compat)
    #   stream_int16.jaxexp  int16 input, normalized ON DEVICE — what live
    #     sessions actually push (HTTP/WS bodies are PCM16); shipping it
    #     frozen removes the host f32 conversion AND halves the per-chunk
    #     bytes, the measured 4-16x p99 gap live-int16 vs artifact-f32
    #     (BENCH_REPORT.md r3/r4 streaming rows)
    smodel = model
    if getattr(smodel.module, "mesh", None) is not None:
        # single-device program: strip a baked-in seq-parallel mesh (same
        # normalization as make_streaming_forward — pure data movement)
        smodel = smodel.with_module(smodel.module.clone(mesh=None))
    apply, transform = smodel.apply, smodel.inference_transform

    def stream(chunk):
        if chunk.dtype == jnp.int16:
            chunk = chunk.astype(jnp.float32) * (1.0 / 32768.0)
        return transform(apply(params, chunk[None, :], train=False))[0]

    for fname, sdtype in (
        ("stream.jaxexp", np.float32),
        ("stream_int16.jaxexp", np.int16),
    ):
        exp_s = jax_export.export(jax.jit(stream), platforms=platforms)(
            jax.ShapeDtypeStruct((ck.chunk_duration_f,), sdtype)
        )
        (output_dir / fname).write_bytes(exp_s.serialize())

    # batched stream forwards: N concurrent sessions' chunks in one padded
    # dispatch (the live path's ChunkForwardBatcher measured 4.1x p99 at 8
    # sessions when each single-chunk dispatch pays ~80 ms relay latency).
    # Traced on int16 — the dtype serving sessions buffer; an f32 group
    # (mid-stream dtype promotion, rare) falls back to per-row f32 singles.
    def stream_batch(chunks):
        if chunks.dtype == jnp.int16:
            chunks = chunks.astype(jnp.float32) * (1.0 / 32768.0)
        return transform(apply(params, chunks, train=False))

    for b in stream_batches:
        exp_sb = jax_export.export(jax.jit(stream_batch), platforms=platforms)(
            jax.ShapeDtypeStruct((b, ck.chunk_duration_f), np.int16)
        )
        (output_dir / f"stream_batch{b}.jaxexp").write_bytes(
            exp_sb.serialize()
        )


@dataclass
class ExportedPipeline:
    """Serve an exported artifact directory (no model zoo needed)."""

    manifest: dict
    infer_fns: dict  # n_chunks -> Exported
    decode_fns: dict  # n_chunks -> Exported
    stream_fn: object = None  # Exported f32 chunk forward, when shipped
    stream_batch_fns: dict | None = None  # batch size -> Exported
    stream_i16_fn: object = None  # Exported int16 chunk forward (r4+)

    @classmethod
    def load(cls, artifact_dir: Path | str) -> "ExportedPipeline":
        artifact_dir = Path(artifact_dir)
        manifest = json.loads((artifact_dir / "manifest.json").read_text())
        if manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest['format_version']} is newer than "
                f"this build ({FORMAT_VERSION})"
            )
        infer_fns, decode_fns = {}, {}
        for n in manifest["buckets"]:
            infer_fns[n] = jax_export.deserialize(
                (artifact_dir / f"infer_{n}.jaxexp").read_bytes()
            )
            decode_fns[n] = jax_export.deserialize(
                (artifact_dir / f"decode_{n}.jaxexp").read_bytes()
            )
        stream_p = artifact_dir / "stream.jaxexp"
        stream_fn = (
            jax_export.deserialize(stream_p.read_bytes())
            if stream_p.is_file()
            else None
        )
        stream_i16_p = artifact_dir / "stream_int16.jaxexp"
        stream_i16_fn = (
            jax_export.deserialize(stream_i16_p.read_bytes())
            if stream_i16_p.is_file()
            else None
        )
        stream_batch_fns = {}
        for b in manifest.get("stream_batches", []):
            sb_p = artifact_dir / f"stream_batch{b}.jaxexp"
            if sb_p.is_file():
                stream_batch_fns[int(b)] = jax_export.deserialize(
                    sb_p.read_bytes()
                )
        return cls(
            manifest,
            infer_fns,
            decode_fns,
            stream_fn,
            stream_batch_fns,
            stream_i16_fn,
        )

    @property
    def supports_streaming(self) -> bool:
        return self.stream_fn is not None

    @property
    def stream_batch_dtype(self) -> "np.dtype":
        """Input dtype the ``stream_batch<b>.jaxexp`` buckets were traced
        on: int16 for r4+ artifacts (raw PCM16 across the wire, normalized
        in the frozen program), float32 for the r3 all-f32 layout (missing
        manifest key). THE single decode of the manifest key — streaming,
        serving and the bench all read it from here."""
        import numpy as np

        return np.dtype(
            np.int16
            if self.manifest.get("stream_batch_dtype") == "int16"
            else np.float32
        )

    def streaming_segmenter(
        self, thresholds: dict | None = None, forward_fn: Callable | None = None
    ) -> Any:
        """Online segmentation off the frozen artifact — same contract as
        ``StreamingSegmenter(model, params, ...)`` but driven by the
        exported per-chunk program (params baked in). ``forward_fn``
        shares a cross-session dispatcher (e.g.
        ``ChunkForwardBatcher.from_exported``) across segmenters."""
        from segma_tpu.streaming import StreamingSegmenter

        if self.stream_fn is None:
            raise ValueError(
                "this artifact was exported without a streaming program "
                "(stream.jaxexp) — re-export with a current build to "
                "enable /v1/stream/*"
            )
        return StreamingSegmenter.from_exported(
            self, thresholds or self.manifest["thresholds"], forward_fn
        )

    # -- geometry ---------------------------------------------------------------
    @property
    def labels(self) -> list[str]:
        return self.manifest["labels"]

    @property
    def frame_settings(self) -> ConvolutionSettings:
        step = self.manifest["rf_step"]
        return ConvolutionSettings((step,), (step,), (0,))

    def _chunkyfier(self) -> Chunkyfier:
        return Chunkyfier(
            1, self.manifest["chunk_duration_f"], self.frame_settings
        )

    # -- inference ----------------------------------------------------------------
    def prepare(self, audio: np.ndarray) -> np.ndarray | AdpcmAudio:
        """Encode a decoded waveform (f32 [-1,1] or int16) for the
        artifact's transport. Accepts 1-D mono or (channels, n) — multi-
        channel is downmixed, matching ``inference.infer_file``."""
        if audio.ndim == 2:
            if audio.shape[0] > 1:
                was_int16 = audio.dtype == np.int16
                audio = audio.astype(np.float32).mean(axis=0)
                if was_int16:  # back to [-1, 1] — the mean is int16-scaled
                    audio = audio / 32768.0
            else:
                audio = audio[0]
        transport = self.manifest["transport"]
        if transport == "adpcm":
            return adpcm_encode_audio(audio)
        if transport == "mulaw":
            from segma_tpu.inference import mulaw_compress

            return mulaw_compress(audio)
        if transport == "int16":
            if audio.dtype == np.int16:
                return audio
            return np.rint(np.clip(audio, -1, 1) * 32767).astype(np.int16)
        return (
            audio.astype(np.float32) / 32768.0
            if audio.dtype == np.int16
            else audio.astype(np.float32)
        )

    def logits_for_audio(self, audio: np.ndarray | AdpcmAudio) -> np.ndarray:
        """Full-file frame logits (total_frames, n_labels); dispatches in
        segments of the largest exported bucket for very long files."""
        m = self.manifest
        ck = self._chunkyfier()
        n = (
            audio.n_samples
            if isinstance(audio, AdpcmAudio)
            else int(audio.shape[0])
        )
        total = ck.total_frames(
            n,
            strict_tail=m["strict_frames"],
            reference_tail=m["reference_tail"],
        )
        if total == 0:
            return np.zeros((0, len(self.labels)), np.float32)
        needed = -(-total // ck.n_windows)
        buckets = m["buckets"]
        grids = []
        start_chunk = 0
        plan = _bucket_plan(needed, buckets)
        for n_chunks in plan:
            remaining = needed - start_chunk
            seg_chunks = min(n_chunks, remaining)
            padded_len = n_chunks * ck.chunk_stride + ck.chunk_duration_f
            off = start_chunk * ck.chunk_stride
            if isinstance(audio, AdpcmAudio):
                from segma_tpu.ops.adpcm import n_blocks

                seg = audio.block_slice(off, n_blocks(padded_len))[None]
            else:
                seg = np.zeros((1, padded_len), audio.dtype)
                take = min(padded_len, max(0, n - off))
                if take > 0:
                    seg[0, :take] = audio[off : off + take]
            grid = np.asarray(self.infer_fns[n_chunks].call(seg))
            grids.append(grid[: seg_chunks * ck.n_windows])
            start_chunk += seg_chunks
        return np.concatenate(grids, axis=0)[:total]

    def decode_intervals(
        self,
        logits: np.ndarray,
        thresholds: dict | None = None,
    ) -> list[tuple[int, int, str]]:
        """Frame logits -> sample intervals via the exported fused decode
        (host fallback on packed-capacity overflow)."""
        m = self.manifest
        thresholds = thresholds or m["thresholds"]
        thr = threshold_vector(self.labels, thresholds).astype(np.float32)
        valid = int(logits.shape[0])
        if valid == 0:
            return []
        n_w = m["n_windows"]
        needed = -(-valid // n_w)
        bucket = next(
            (b for b in m["buckets"] if b >= needed), m["buckets"][-1]
        )
        rows = bucket * n_w
        cs = self.frame_settings
        if valid > rows:  # longer than the largest exported decode: host path
            return self._host_decode(logits, thr, cs)
        grid = np.zeros((rows, len(self.labels)), np.float32)
        grid[:valid] = logits
        packed = np.asarray(
            self.decode_fns[bucket].call(grid, thr, np.int32(valid))
        )
        cap = int(m["decode_caps"][str(bucket)])
        intervals = unpack_run_intervals(packed, cap, self.labels, cs)
        if intervals is None:  # capacity overflow: exact host fallback
            return self._host_decode(logits, thr, cs)
        return intervals

    def _host_decode(
        self, logits: np.ndarray, thr: np.ndarray, cs: ConvolutionSettings
    ) -> list[tuple[int, int, str]]:
        mask = 1.0 / (1.0 + np.exp(-logits)) > thr[None, :]

        class _Enc:  # create_intervals only reads .base_labels
            base_labels = tuple(self.labels)

        return create_intervals(mask, cs, _Enc())

    def segment(
        self, audio: np.ndarray, thresholds: dict | None = None
    ) -> list[tuple[int, int, str]]:
        """Waveform -> sorted sample intervals (the one-call serving API)."""
        logits = self.logits_for_audio(self.prepare(audio))
        return sorted(self.decode_intervals(logits, thresholds))


def run_inference_on_artifact(
    artifact: Path | str,
    wavs: Path | str,
    output: Path | str,
    uris: Path | str | None = None,
    thresholds: dict | str | Path | None = None,
    recursive: bool = False,
    rttm_dirname: str = "raw_rttm",
    min_duration_s: float = 0.0,
    merge_gap_s: float = 0.0,
    dump_logits: bool = False,
) -> list[Path]:
    """Batch prediction from a frozen export directory — same RTTM layout
    as ``run_inference_on_audios`` but no model zoo, registry, or
    checkpoint handling (``scripts/predict.py --artifact``).
    ``dump_logits`` writes the tuner's per-label ``.npz`` dumps, so the
    predict->tune->predict loop runs on artifact-only deployments too."""
    from segma_tpu.inference import (
        _load_mono,
        get_list_of_files_to_process,
        load_thresholds,
        postprocess_intervals,
        save_logits,
        write_intervals,
    )

    thresholds = load_thresholds(thresholds)

    pipe = ExportedPipeline.load(artifact)
    files, n_files = get_list_of_files_to_process(Path(wavs), recursive, uris)
    sr = int(pipe.manifest["sample_rate"])
    processed: list[Path] = []
    for i, audio_path in enumerate(files, 1):
        t0 = time.perf_counter()
        try:
            # same decode as the live CLI (zero-decode int16 fast path) so
            # artifact predictions are byte-identical to config+checkpoint
            audio = _load_mono(audio_path, "int16", expect_sr=sr)
        except Exception as e:  # noqa: BLE001 — one bad/missing file must
            # not abandon the rest of the batch (parity with the live CLI)
            print(
                f"[log] - SKIPPED '{audio_path}': {type(e).__name__}: {e}",
                flush=True,
            )
            continue
        # per-label decode order (not segment()'s time-sorted order) so the
        # RTTM files are byte-identical to the live CLI's
        logits = pipe.logits_for_audio(pipe.prepare(audio))
        if dump_logits:
            save_logits(logits, list(pipe.labels), Path(output), audio_path.stem)
        intervals = postprocess_intervals(
            pipe.decode_intervals(logits, thresholds),
            min_duration_f=int(min_duration_s * sr),
            merge_gap_f=int(merge_gap_s * sr),
        )
        write_intervals(intervals, audio_path, Path(output), rttm_dirname)
        print(
            f"[log] - ({i:>{len(str(n_files))}}/{n_files}) inference for "
            f"'{audio_path.stem}' in {time.perf_counter() - t0:.2f}s",
            flush=True,
        )
        processed.append(audio_path)
    return processed
