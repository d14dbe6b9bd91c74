"""Python client SDK (segma_tpu.client) against a live test server.

Contract: the client returns exactly what the serving layer computes
(bit-parity with direct service calls), maps server errors to
SegmaClientError with the status and message, and its streaming sessions
match offline segmentation.
"""

import threading
from pathlib import Path

import jax
import numpy as np
import pytest

from segma_tpu.client import Interval, SegmaClient, SegmaClientError
from segma_tpu.config import load_config
from segma_tpu.inference import InferencePipeline, default_thresholds
from segma_tpu.models import Models
from segma_tpu.serve import SegmentationService, make_server
from segma_tpu.utils.encoders import MultiLabelEncoder
from segma_tpu.utils.io import write_data_to_disk

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


@pytest.fixture(scope="module")
def service():
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=conv_vad",
            "model.config={hidden: 32, depth: 1, dtype: f32}",
            "audio.chunk_duration_s=1.0",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    model.init_params(jax.random.key(0))
    return SegmentationService(InferencePipeline(model, model.params, batch_size=8))


@pytest.fixture(scope="module")
def client(service):
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield SegmaClient(f"http://127.0.0.1:{srv.server_address[1]}")
    srv.shutdown()


@pytest.fixture(scope="module")
def audio(tmp_path_factory):
    rng = np.random.default_rng(12)
    wave = (rng.standard_normal(40_000) * 0.2).astype(np.float32)
    p = tmp_path_factory.mktemp("client") / "req.wav"
    write_data_to_disk(wave, p)
    return p, wave


def _expected(service, wave) -> list[Interval]:
    pipe = service.pipeline
    thr = default_thresholds(pipe.model.label_encoder.base_labels)
    pcm = (np.clip(wave, -1, 1) * 32767.0).astype(np.int16)
    return [
        Interval(round(s / 16_000, 6), round(e / 16_000, 6), label)
        for s, e, label in sorted(
            pipe.decode_intervals(pipe.logits_for_audio(pcm), thr)
        )
    ]


def test_health_and_metrics(client):
    h = client.health()
    assert h["status"] == "ok" and h["model"] == "conv_vad"
    assert "segma_requests_total" in client.metrics()
    assert "conv_vad" in client.models()["models"]


def test_segment_every_input_kind_matches_pipeline(client, service, audio):
    """Path, WAV bytes, float waveform and int16 waveform all produce the
    service's exact intervals."""
    path, wave = audio
    expected = _expected(service, wave)
    assert expected  # non-trivial fixture
    pcm = (np.clip(wave, -1, 1) * 32767.0).astype(np.int16)
    for inp in (path, path.read_bytes(), wave, pcm):
        assert client.segment(inp) == expected


def test_segment_rttm_text(client, audio):
    path, _ = audio
    rttm = client.segment(path, uri="myfile", rttm=True)
    assert isinstance(rttm, str)
    assert all(line.startswith("SPEAKER myfile ") for line in rttm.strip().splitlines())


def test_error_mapping(client):
    with pytest.raises(SegmaClientError) as e:
        client.segment(b"definitely not a wav")
    assert e.value.status == 400 and "RIFF" in e.value.message
    with pytest.raises(SegmaClientError) as e:
        client.segment(np.zeros(1000, np.int16), model="nope")
    assert e.value.status == 404
    with pytest.raises(SegmaClientError) as e:
        client.reload()  # single-model server: no bundle to reload
    assert e.value.status == 409
    with pytest.raises(TypeError):
        client.segment(np.zeros(10, np.int64))  # unsupported dtype


def test_http_stream_matches_offline(client, audio):
    """Pushing the file in chunks through a session yields the one-shot
    result, and the context manager flushes."""
    path, wave = audio
    offline = client.segment(path)
    pcm = (np.clip(wave, -1, 1) * 32767.0).astype(np.int16)
    with client.stream() as session:
        for lo in range(0, len(pcm), 8000):
            session.push(pcm[lo : lo + 8000])
    assert sorted(session.intervals) == sorted(offline)
    assert session.flush() == []  # idempotent after __exit__


def test_ws_stream_matches_http_stream(client, audio):
    path, wave = audio
    offline = client.segment(path)
    pcm = (np.clip(wave, -1, 1) * 32767.0).astype(np.int16)
    with client.stream_ws() as session:
        for lo in range(0, len(pcm), 8000):
            session.push(pcm[lo : lo + 8000])
    assert sorted(session.intervals) == sorted(offline)


def test_ws_unknown_model_maps_to_client_error(client):
    with pytest.raises(SegmaClientError) as e:
        client.stream_ws(model="nope")
    assert e.value.status == 404


def test_iter_wav_chunks(audio):
    from segma_tpu.client import iter_wav_chunks

    path, wave = audio
    chunks = list(iter_wav_chunks(path, chunk_s=0.5))
    assert sum(len(c) for c in chunks) == len(wave)
    assert all(c.dtype == np.int16 for c in chunks)
    assert len(chunks[0]) == 8000


def test_client_stream_429_maps_to_error(service):
    """The session cap surfaces through the SDK as SegmaClientError(429)
    for both HTTP and WS stream opens."""
    from segma_tpu.serve import SegmentationService, make_server

    capped = SegmentationService(service.pipeline, max_sessions=1)
    srv = make_server(capped, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = SegmaClient(f"http://127.0.0.1:{srv.server_address[1]}")
        first = c.stream()
        with pytest.raises(SegmaClientError) as e:
            c.stream()
        assert e.value.status == 429
        with pytest.raises(SegmaClientError) as e:
            c.stream_ws()
        assert e.value.status == 429
        first.flush()  # slot freed -> works again
        with c.stream() as s2:
            s2.push(np.zeros(4000, np.int16))
    finally:
        srv.shutdown()
