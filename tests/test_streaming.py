"""Streaming segmenter: intervals must match the offline pipeline exactly
for frame-local models, regardless of push sizes."""

import numpy as np
import pytest

from segma_tpu.inference import (
    InferencePipeline,
    default_thresholds,
    intervals_from_boundaries,
)
from segma_tpu.streaming import StreamingSegmenter


@pytest.fixture
def audio():
    rng = np.random.default_rng(4)
    # ~3.3 chunks at the 1 s test geometry: 2 full strides + a tail
    n = 16_000 + 15_680 * 2 + 5_000
    return (rng.standard_normal(n) * 0.2).astype(np.float32)


def _offline_intervals(vad_model, audio):
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    logits = pipe.logits_for_audio(audio)
    thr = default_thresholds(vad_model.label_encoder.base_labels)
    starts, ends = pipe.decode_boundaries(logits, thr)
    return sorted(
        intervals_from_boundaries(
            starts, ends, pipe.frame_settings, vad_model.label_encoder
        )
    )


# vad_model fixture comes from tests/test_inference.py via conftest-style
# import; define it locally for isolation
@pytest.fixture(scope="module")
def vad_model():
    from pathlib import Path

    import jax

    from segma_tpu.config import load_config
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    config_dir = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"
    cfg = load_config(
        config_dir / "default.yml",
        [
            "model.name=conv_vad",
            "model.config={hidden: 32, depth: 1, dtype: f32}",
            "audio.chunk_duration_s=1.0",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    model.init_params(jax.random.key(0))
    return model


@pytest.mark.parametrize("push_size", [1000, 16_000, 37_777])
def test_streaming_matches_offline(vad_model, audio, push_size):
    seg = StreamingSegmenter(vad_model, vad_model.params)
    emitted = []
    for off in range(0, audio.shape[0], push_size):
        emitted.extend(seg.push(audio[off : off + push_size]))
    emitted.extend(seg.flush())
    assert sorted(emitted) == seg.intervals
    assert seg.intervals == _offline_intervals(vad_model, audio)


def test_streaming_incremental_emission(vad_model, audio):
    """Intervals come out while streaming, not only at flush."""
    seg = StreamingSegmenter(vad_model, vad_model.params)
    first_half = seg.push(audio[: 2 * 16_000])
    rest = seg.push(audio[2 * 16_000 :]) + seg.flush()
    assert len(first_half) > 0
    assert sorted(first_half + rest) == seg.intervals


def test_flush_twice_raises(vad_model):
    seg = StreamingSegmenter(vad_model, vad_model.params)
    seg.push(np.zeros(20_000, np.float32))
    seg.flush()
    with pytest.raises(RuntimeError, match="already called"):
        seg.flush()


def test_streaming_reference_tail_matches_offline(vad_model, audio):
    """audio.reference_tail=true: streaming flush emits the same zero-padded
    full-chunk tail frames as the offline pipeline."""
    from pathlib import Path

    from segma_tpu.config import load_config
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    config_dir = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"
    cfg = load_config(
        config_dir / "default.yml",
        [
            "model.name=conv_vad",
            "model.config={hidden: 32, depth: 1, dtype: f32}",
            "audio.chunk_duration_s=1.0",
            "audio.reference_tail=true",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model_rt = Models["conv_vad"](enc, cfg)
    model_rt.params = vad_model.params

    seg = StreamingSegmenter(model_rt, model_rt.params)
    seg.push(audio)
    seg.flush()
    assert seg.intervals == _offline_intervals(model_rt, audio)
    # and the compat mode really changes the tail: frame counts differ
    default_seg = StreamingSegmenter(vad_model, vad_model.params)
    default_seg.push(audio)
    default_seg.flush()
    assert seg._n_frames > default_seg._n_frames


def test_streaming_threshold_key_order_invariant(vad_model, audio):
    """A hand-edited YAML with reordered threshold keys must NOT swap
    per-label thresholds (reference bug: inference.py:229-233 trusts
    insertion order)."""
    labels = vad_model.label_encoder.base_labels
    # wildly different per-label thresholds so a swap is detectable
    thr = {
        label: {"lower_bound": 0.05 + 0.9 * i / max(1, len(labels) - 1),
                "upper_bound": 1.0}
        for i, label in enumerate(labels)
    }
    shuffled = {k: thr[k] for k in reversed(list(thr))}
    assert list(shuffled) != list(thr)

    a = StreamingSegmenter(vad_model, vad_model.params, thresholds=thr)
    a.push(audio)
    a.flush()
    b = StreamingSegmenter(vad_model, vad_model.params, thresholds=shuffled)
    b.push(audio)
    b.flush()
    assert a.intervals == b.intervals
    # and streaming agrees with the offline pipeline's vector for both orders
    from segma_tpu.inference import threshold_vector

    vec = threshold_vector(labels, thr)
    assert np.allclose(threshold_vector(labels, shuffled), vec)
    assert np.allclose(a.thr, vec)


def test_streaming_accepts_int16(vad_model, audio):
    pcm = (audio * 32768.0).clip(-32768, 32767).astype(np.int16)
    a = StreamingSegmenter(vad_model, vad_model.params)
    a.push(pcm)
    got = sorted(a.flush() + a.intervals)
    b = StreamingSegmenter(vad_model, vad_model.params)
    b.push(pcm.astype(np.float32) / 32768.0)
    b.flush()
    assert a.intervals == b.intervals


def test_streaming_invariant_to_push_partitioning(vad_model, audio):
    """Finalized intervals are identical no matter HOW the audio is split
    into pushes (hypothesis over random cut points) — the streaming
    parity claim, strengthened beyond the fixed split sizes above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    reference = None

    @settings(max_examples=15, deadline=None)
    @given(
        cuts=st.lists(
            st.integers(1, audio.shape[0] - 1), max_size=6, unique=True
        )
    )
    def check(cuts):
        nonlocal reference
        seg = StreamingSegmenter(vad_model, vad_model.params)
        out = []
        prev = 0
        for c in sorted(cuts):
            out += seg.push(audio[prev:c])
            prev = c
        out += seg.push(audio[prev:])
        out += seg.flush()
        got = sorted(out)
        if reference is None:
            reference = got
        assert got == reference

    check()


def test_chunk_forward_batcher_parity_and_batching(vad_model):
    """N concurrent sessions sharing a ChunkForwardBatcher produce
    intervals identical to independent single-session segmenters, with
    fewer device dispatches than total chunks (round-3: cross-session
    streaming batching)."""
    import threading

    from segma_tpu.streaming import ChunkForwardBatcher

    n_sessions = 4
    rng = np.random.default_rng(11)
    audios = [
        (rng.standard_normal(3 * 16_000 + 777) * 0.3).astype(np.float32)
        for _ in range(n_sessions)
    ]
    # reference: serial single-session runs
    expected = []
    for a in audios:
        s = StreamingSegmenter(vad_model, vad_model.params)
        s.push(a)
        s.flush()
        expected.append(s.intervals)

    batcher = ChunkForwardBatcher(vad_model, window_ms=30.0, max_batch=4)
    segs = [
        StreamingSegmenter(vad_model, vad_model.params, forward_fn=batcher)
        for _ in range(n_sessions)
    ]
    results = [None] * n_sessions

    def run(i):
        # interleaved pushes so chunks from different sessions coincide
        a = audios[i]
        for off in range(0, len(a), 16_000):
            segs[i].push(a[off : off + 16_000])
        segs[i].flush()
        results[i] = segs[i].intervals

    threads = [
        threading.Thread(target=run, args=(i,)) for i in range(n_sessions)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == expected
    # 4 sessions x 4 chunks (3 full + tail) = 16 single dispatches serial;
    # batching must have grouped at least some of them
    total_chunks = sum(4 for _ in audios)
    assert batcher.dispatches < total_chunks, batcher.dispatches


def test_whisper_streaming_matches_offline_live_and_exported(tmp_path):
    """The flagship family streams too: a surgical_hydra (whisper encoder,
    padded 30 s context per chunk) streaming session must match the
    offline pipeline — live AND off a frozen artifact's stream.jaxexp."""
    from pathlib import Path

    import jax
    import pytest as _pytest

    from segma_tpu.config import load_config
    from segma_tpu.export import ExportedPipeline, export_inference
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    config_dir = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"
    cfg = load_config(
        config_dir / "default.yml",
        [
            "model.name=surgical_hydra",
            "model.config.encoder=missing_tiny",
            "model.config.lstm={hidden_size: 16, num_layers: 1, "
            "bidirectional: true, dropout: 0.0}",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with _pytest.warns(UserWarning):
        model = Models["surgical_hydra"](enc, cfg)
    from segma_tpu.models.whisper.encoder import WhisperEncoderConfig

    model.module = model.module.clone(
        enc_cfg=WhisperEncoderConfig(d_model=64, n_heads=2, n_layers=2, ffn_dim=128)
    )
    model.init_params(jax.random.key(0))

    rng = np.random.default_rng(31)
    audio = (rng.standard_normal(36_000) * 0.2).astype(np.float32)
    offline = _offline_intervals(model, audio)
    assert len(offline) > 0

    live = StreamingSegmenter(model, model.params)
    exp_dir = tmp_path / "whisper_stream"
    export_inference(model, exp_dir, buckets=(2,), batch_size=2, transport="int16")
    frozen = ExportedPipeline.load(exp_dir).streaming_segmenter(
        default_thresholds(model.label_encoder.base_labels)
    )
    for seg in (live, frozen):
        for off in range(0, audio.shape[0], 9_000):
            seg.push(audio[off : off + 9_000])
        seg.flush()
        assert seg.intervals == offline


def test_streaming_mixed_dtype_pushes_promote(vad_model, audio):
    """int16 pushes buffer AND ship as int16 (half the bytes; the device
    normalizes bit-identically); switching dtype mid-stream promotes the
    buffer to f32 with unchanged results."""
    pcm = (audio * 32768.0).clip(-32768, 32767).astype(np.int16)
    a = StreamingSegmenter(vad_model, vad_model.params)
    cut = 20_000
    a.push(pcm[:cut])
    assert a._buffer.dtype == np.int16  # int16 mode engaged
    a.push(pcm[cut:].astype(np.float32) / 32768.0)  # switch -> promote
    assert a._buffer.dtype == np.float32
    a.flush()
    b = StreamingSegmenter(vad_model, vad_model.params)
    b.push(pcm)
    b.flush()
    assert a.intervals == b.intervals and a.intervals


def test_chunk_forward_batcher_mixed_dtype_group(vad_model):
    """Concurrent sessions buffering different dtypes can share one
    batched dispatch: int16 rows promote bit-exactly, so both sessions
    get identical logits for the same underlying audio."""
    import threading

    from segma_tpu.streaming import ChunkForwardBatcher

    chunk_f = vad_model.config.audio.chunk_duration_f
    rng = np.random.default_rng(9)
    pcm = (rng.standard_normal(chunk_f) * 8000).astype(np.int16)
    batcher = ChunkForwardBatcher(vad_model, window_ms=150.0, max_batch=4)
    outs = {}

    def call(key, chunk):
        outs[key] = batcher(vad_model.params, chunk)

    ts = [
        threading.Thread(target=call, args=("i16", pcm)),
        threading.Thread(
            target=call, args=("f32", pcm.astype(np.float32) / 32768.0)
        ),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # same padded batched program, bit-identical effective inputs
    np.testing.assert_array_equal(outs["i16"], outs["f32"])


# ---------------------------------------------------------------------------
# int16-input frozen stream programs (round-4): the exported path must stop
# paying the measured f32 penalty — int16 pushes ride stream_int16.jaxexp /
# int16-traced stream_batch buckets with byte-identical intervals.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vad_artifact(vad_model, tmp_path_factory):
    from segma_tpu.export import export_inference

    out = tmp_path_factory.mktemp("stream_art") / "conv_vad"
    export_inference(
        vad_model, out, buckets=(2,), batch_size=2, transport="int16"
    )
    return out


def test_exported_int16_stream_program_used_and_byte_identical(
    vad_model, vad_artifact, audio
):
    """int16 pushes through a frozen artifact must (a) dispatch the
    int16-input program — no host f32 conversion — and (b) produce the
    exact intervals of the live segmenter AND the f32 exported path."""
    from segma_tpu.export import ExportedPipeline

    exported = ExportedPipeline.load(vad_artifact)
    assert exported.stream_i16_fn is not None
    assert exported.manifest["stream_int16"] is True
    assert exported.manifest["stream_batch_dtype"] == "int16"

    pcm = (audio * 32768.0).clip(-32768, 32767).astype(np.int16)

    live = StreamingSegmenter(vad_model, vad_model.params)
    frozen_i16 = exported.streaming_segmenter()
    frozen_f32 = exported.streaming_segmenter()
    for off in range(0, pcm.shape[0], 9_000):
        live.push(pcm[off : off + 9_000])
        frozen_i16.push(pcm[off : off + 9_000])
        frozen_f32.push(pcm[off : off + 9_000].astype(np.float32) / 32768.0)
    for seg in (live, frozen_i16, frozen_f32):
        seg.flush()
    assert frozen_i16.intervals == live.intervals
    assert frozen_f32.intervals == live.intervals
    assert live.intervals  # non-degenerate


def test_exported_batcher_int16_buckets(vad_model, vad_artifact):
    """Concurrent int16 sessions share the int16-traced frozen batch
    programs: fewer dispatches than chunks, intervals identical to serial
    single-session frozen runs. (Raw logits may differ in the last ulp
    between batch shapes — XLA fuses each program independently — so the
    contract, as for the live batcher, is interval identity.)"""
    import threading

    from segma_tpu.export import ExportedPipeline
    from segma_tpu.streaming import ChunkForwardBatcher

    exported = ExportedPipeline.load(vad_artifact)
    n_sessions = 4
    rng = np.random.default_rng(12)
    audios = [
        (rng.standard_normal(3 * 16_000 + 777) * 9000).astype(np.int16)
        for _ in range(n_sessions)
    ]
    expected = []
    for a in audios:
        s = exported.streaming_segmenter()
        s.push(a)
        s.flush()
        expected.append(s.intervals)

    batcher = ChunkForwardBatcher.from_exported(exported, window_ms=30.0)
    segs = [
        exported.streaming_segmenter(forward_fn=batcher)
        for _ in range(n_sessions)
    ]
    results: list = [None] * n_sessions

    def run(i: int) -> None:
        a = audios[i]
        for off in range(0, len(a), 16_000):
            segs[i].push(a[off : off + 16_000])
        segs[i].flush()
        results[i] = segs[i].intervals

    threads = [
        threading.Thread(target=run, args=(i,)) for i in range(n_sessions)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == expected
    assert batcher.dispatches < sum(4 for _ in audios)


def test_r3_artifact_layout_still_streams(vad_model, vad_artifact, tmp_path, audio):
    """Back-compat: an artifact WITHOUT stream_int16.jaxexp (the r3 layout,
    f32-traced batch buckets) must keep streaming int16 pushes through the
    f32 program via host conversion — same intervals."""
    import json
    import shutil

    from segma_tpu.export import ExportedPipeline

    old = tmp_path / "r3_layout"
    shutil.copytree(vad_artifact, old)
    (old / "stream_int16.jaxexp").unlink()
    # r3 batch buckets were f32-traced; this copy's are int16 — drop them
    # from the manifest (and disk) to model the r3 layout faithfully
    m = json.loads((old / "manifest.json").read_text())
    del m["stream_int16"]
    del m["stream_batch_dtype"]
    m["stream_batches"] = []
    for p in old.glob("stream_batch*.jaxexp"):
        p.unlink()
    (old / "manifest.json").write_text(json.dumps(m))

    exported = ExportedPipeline.load(old)
    assert exported.stream_i16_fn is None
    pcm = (audio * 32768.0).clip(-32768, 32767).astype(np.int16)
    live = StreamingSegmenter(vad_model, vad_model.params)
    frozen = exported.streaming_segmenter()
    for off in range(0, pcm.shape[0], 9_000):
        live.push(pcm[off : off + 9_000])
        frozen.push(pcm[off : off + 9_000])
    live.flush()
    frozen.flush()
    assert frozen.intervals == live.intervals and live.intervals
