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
    with pytest.raises(AssertionError):
        seg.flush()


def test_streaming_accepts_int16(vad_model, audio):
    pcm = (audio * 32768.0).clip(-32768, 32767).astype(np.int16)
    a = StreamingSegmenter(vad_model, vad_model.params)
    a.push(pcm)
    got = sorted(a.flush() + a.intervals)
    b = StreamingSegmenter(vad_model, vad_model.params)
    b.push(pcm.astype(np.float32) / 32768.0)
    b.flush()
    assert a.intervals == b.intervals
