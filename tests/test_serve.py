"""HTTP serving: endpoint behavior and bit-parity with the batch CLI path."""

import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import jax
import numpy as np
import pytest

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
    pipe = InferencePipeline(model, model.params, batch_size=8)
    return SegmentationService(pipe)


@pytest.fixture(scope="module")
def server(service):
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture(scope="module")
def wav_bytes(tmp_path_factory):
    rng = np.random.default_rng(12)
    audio = (rng.standard_normal(40_000) * 0.2).astype(np.float32)
    p = tmp_path_factory.mktemp("serve") / "req.wav"
    write_data_to_disk(audio, p)
    return p.read_bytes(), audio


def _post(url: str, body: bytes, ctype: str = "application/octet-stream"):
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", ctype)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, resp.read()


def test_healthz(server, service):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as resp:
        payload = json.loads(resp.read())
    assert payload["status"] == "ok"
    assert payload["model"] == "conv_vad"
    assert payload["labels"] == list(
        service.pipeline.model.label_encoder.base_labels
    )


def test_segment_wav_matches_pipeline(server, service, wav_bytes):
    """The HTTP path must produce exactly the pipeline's intervals."""
    body, audio = wav_bytes
    status, raw = _post(f"{server}/v1/segment?uri=req", body)
    assert status == 200
    payload = json.loads(raw)
    assert payload["uri"] == "req"

    pipe = service.pipeline
    thr = default_thresholds(pipe.model.label_encoder.base_labels)
    # the server decodes the WAV to the int16 transport; mirror that
    pcm = (np.clip(audio, -1, 1) * 32767.0).astype(np.int16)
    expected = sorted(pipe.decode_intervals(pipe.logits_for_audio(pcm), thr))
    got = [
        (round(iv["start_s"], 6), round(iv["end_s"], 6), iv["label"])
        for iv in payload["intervals"]
    ]
    exp = [
        (round(s / 16_000, 6), round(e / 16_000, 6), label)
        for s, e, label in expected
    ]
    assert got == exp and len(got) > 0


def test_segment_raw_pcm16(server, wav_bytes):
    """Raw int16 PCM: audio/l16 is big-endian per RFC 2586; the
    ;endianness=little parameter selects s16le. Both must match the WAV
    upload."""
    body, audio = wav_bytes
    samples = (np.clip(audio, -1, 1) * 32767.0).astype(np.int16)
    _, raw_wav = _post(f"{server}/v1/segment?uri=x", body)
    _, raw_be = _post(
        f"{server}/v1/segment?uri=x",
        samples.astype(">i2").tobytes(),
        "audio/l16; rate=16000",
    )
    _, raw_le = _post(
        f"{server}/v1/segment?uri=x",
        samples.astype("<i2").tobytes(),
        "audio/l16; rate=16000; endianness=little",
    )
    assert json.loads(raw_wav) == json.loads(raw_be) == json.loads(raw_le)


def test_segment_rttm_format(server, wav_bytes):
    body, _ = wav_bytes
    status, raw = _post(f"{server}/v1/segment?uri=myfile&format=rttm", body)
    assert status == 200
    lines = raw.decode().strip().split("\n")
    assert all(line.startswith("SPEAKER myfile ") for line in lines)


def test_bad_body_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/v1/segment", b"not audio at all")
    assert e.value.code == 400
    assert "RIFF" in json.loads(e.value.read())["error"]


def test_unknown_path_is_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/v1/other", b"x")
    assert e.value.code == 404


def test_wrong_sample_rate_upload_is_400(server, tmp_path):
    """A 44.1 kHz WAV must be refused: every downstream number assumes the
    model's configured rate, so accepting it would return silently
    wrong-timescale intervals."""
    rng = np.random.default_rng(5)
    p = tmp_path / "hifi.wav"
    write_data_to_disk(
        (rng.standard_normal(44_100) * 0.2).astype(np.float32),
        p,
        sample_rate=44_100,
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/v1/segment", p.read_bytes())
    assert e.value.code == 400
    assert "sample rate" in json.loads(e.value.read())["error"]


def test_oversized_body_is_413(service):
    """Content-Length above the cap is refused before the body is read —
    one request must not be able to exhaust host RAM."""
    srv = make_server(service, port=0, max_body_bytes=1024)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{url}/v1/segment", b"\0" * 4096)
        assert e.value.code == 413
        # the cap must not break requests under it
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{url}/v1/segment", b"tiny")
        assert e.value.code == 400  # not a WAV, but it WAS read
    finally:
        srv.shutdown()


def test_micro_batching_groups_concurrent_requests(service, wav_bytes):
    """With a batching window, concurrent requests share device dispatches
    and return the same intervals as the direct path."""
    from segma_tpu.serve import SegmentationService

    body, _ = wav_bytes
    batched = SegmentationService(
        service.pipeline, batch_window_ms=200.0, max_batch=8
    )
    direct = service.segment(body)
    results = []

    def hit():
        results.append(batched.segment(body))

    threads = [threading.Thread(target=hit) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6
    assert all(r == direct for r in results)
    # 6 requests within one 200 ms window -> far fewer dispatches than 6
    assert batched._batcher.dispatches < 6


def test_micro_batching_propagates_errors(service):
    from segma_tpu.serve import SegmentationService

    batched = SegmentationService(
        service.pipeline, batch_window_ms=50.0, max_batch=4
    )
    with pytest.raises(ValueError, match="RIFF"):
        batched.segment(b"definitely not audio")
    # the batcher keeps working after a bad request
    pcm = np.zeros(20_000, "<i2").tobytes()
    out = batched.segment(pcm, "audio/l16")
    assert out == service.segment(pcm, "audio/l16")


def test_concurrent_requests(server, wav_bytes):
    """Parallel clients all get correct, identical answers (device access
    is serialized internally)."""
    body, _ = wav_bytes
    results = []

    def hit():
        _, raw = _post(f"{server}/v1/segment?uri=c", body)
        results.append(json.loads(raw))

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    assert all(r == results[0] for r in results)


def test_serve_from_exported_artifact(service, wav_bytes, tmp_path):
    """The HTTP surface runs identically off a frozen export directory:
    same endpoints, responses bit-identical to the live-pipeline server."""
    from segma_tpu.export import ExportedPipeline, export_inference

    model = service.pipeline.model
    out = tmp_path / "artifact"
    export_inference(model, out, buckets=(2, 4), batch_size=8,
                     transport="int16")
    exp_service = SegmentationService(ExportedPipeline.load(out))
    srv = make_server(exp_service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        body, _ = wav_bytes
        status, raw = _post(f"{url}/v1/segment?uri=x", body)
        assert status == 200
        got = json.loads(raw)

        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert "exported artifact" in health["model"]
        assert health["labels"] == list(
            model.label_encoder.base_labels
        )
    finally:
        srv.shutdown()

    # parity with the live-pipeline server on the same body
    live_srv = make_server(service, port=0)
    t2 = threading.Thread(target=live_srv.serve_forever, daemon=True)
    t2.start()
    try:
        live_url = f"http://127.0.0.1:{live_srv.server_address[1]}"
        _, live_raw = _post(f"{live_url}/v1/segment?uri=x", body)
    finally:
        live_srv.shutdown()
    assert got == json.loads(live_raw)


def test_metrics_endpoint(service, wav_bytes):
    """GET /metrics: Prometheus counters advance with requests and errors."""
    def scrape(url):
        with urllib.request.urlopen(f"{url}/metrics", timeout=30) as resp:
            assert resp.headers["Content-Type"].startswith("text/plain")
            text = resp.read().decode()
        return text, {
            line.split()[0]: line.split()[1]
            for line in text.splitlines()
            if line and not line.startswith("#")
        }

    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        body, audio = wav_bytes
        _, before = scrape(url)
        _post(f"{url}/v1/segment?uri=m", body)
        _post(f"{url}/v1/segment?uri=m", body)
        try:
            _post(f"{url}/v1/segment", b"notawav")
        except urllib.error.HTTPError:
            pass
        text, after = scrape(url)
    finally:
        srv.shutdown()

    def delta(key):
        return float(after[key]) - float(before[key])

    assert delta("segma_requests_total") == 2
    assert delta("segma_request_errors_total") == 1
    expect_s = 2 * audio.size / service.sample_rate
    assert abs(delta("segma_audio_seconds_total") - expect_s) < 0.1
    assert 'segma_request_latency_seconds{quantile="0.5"}' in text


def test_streaming_session_matches_offline(server, service, wav_bytes):
    """start -> push (in uneven pieces) -> flush over HTTP reproduces the
    offline /v1/segment intervals on the same audio."""
    body, audio = wav_bytes
    pcm = (np.clip(audio, -1, 1) * 32767.0).astype(np.int16)

    _, raw = _post(f"{server}/v1/stream/start", b"")
    sid = json.loads(raw)["session"]

    collected = []
    for chunk in np.array_split(pcm, 5):
        _, r = _post(
            f"{server}/v1/stream/{sid}/push",
            chunk.astype("<i2").tobytes(),
            "audio/l16; endianness=little",
        )
        collected += json.loads(r)["intervals"]
    _, r = _post(f"{server}/v1/stream/{sid}/flush", b"")
    collected += json.loads(r)["intervals"]

    _, offline_raw = _post(f"{server}/v1/segment?uri=x", body)
    offline = json.loads(offline_raw)["intervals"]
    key = lambda iv: (iv["start_s"], iv["end_s"], iv["label"])  # noqa: E731
    assert sorted(collected, key=key) == sorted(offline, key=key)
    assert len(offline) > 0

    # session is gone after flush
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/v1/stream/{sid}/push", b"\x00\x00")
    assert e.value.code == 404


def test_concurrent_streaming_sessions_soak(service):
    """Soak: N concurrent HTTP streaming sessions, DIFFERENT audio each,
    with the cross-session ChunkForwardBatcher enabled. Every session's
    streamed intervals must equal its own offline result (regression:
    with the batcher active, pushes to one session were unserialized —
    per-session locks now guard the segmenter state while the batcher
    still packs chunks across sessions)."""
    from segma_tpu.serve import SegmentationService, make_server

    batched = SegmentationService(
        service.pipeline, batch_window_ms=40.0, max_batch=8
    )
    srv = make_server(batched, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    n_sessions, n_pushes = 6, 4
    results: dict[int, list] = {}
    errors: list = []

    def run(i: int) -> None:
        try:
            rng = np.random.default_rng(100 + i)
            pcm = (rng.standard_normal(48_000) * 3000).astype(np.int16)
            _, raw = _post(f"{url}/v1/stream/start", b"")
            sid = json.loads(raw)["session"]
            got = []
            for chunk in np.array_split(pcm, n_pushes):
                _, r = _post(
                    f"{url}/v1/stream/{sid}/push",
                    chunk.astype("<i2").tobytes(),
                    "audio/l16; endianness=little",
                )
                got += json.loads(r)["intervals"]
            _, r = _post(f"{url}/v1/stream/{sid}/flush", b"")
            got += json.loads(r)["intervals"]
            results[i] = sorted(
                (iv["start_s"], iv["end_s"], iv["label"]) for iv in got
            )
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errors.append((i, e))

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n_sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.shutdown()
    assert not errors, errors
    assert len(results) == n_sessions

    for i in range(n_sessions):
        rng = np.random.default_rng(100 + i)
        pcm = (rng.standard_normal(48_000) * 3000).astype(np.int16)
        expected = sorted(
            (round(s / 16_000, 6), round(e / 16_000, 6), label)
            for s, e, label in service.segment(
                pcm.astype("<i2").tobytes(), "audio/l16; endianness=little"
            )
        )
        got = [(round(s, 6), round(e, 6), label) for s, e, label in results[i]]
        assert got == expected, f"session {i} diverged"
    assert not batched._streams  # all sessions ended


def test_streaming_sessions_share_one_forward(service):
    """Two concurrent sessions reuse one jitted forward (no per-session
    re-trace) and keep independent run state."""
    sid1 = service.stream_start()
    sid2 = service.stream_start()
    assert sid1 != sid2
    seg1, _, _ = service._streams[sid1]
    seg2, _, _ = service._streams[sid2]
    assert seg1._forward is seg2._forward
    service.stream_flush(sid1)
    service.stream_flush(sid2)


def test_exported_artifact_streams_and_matches_live(service, tmp_path):
    """Artifacts ship a stream.jaxexp program: a streaming session off the
    frozen directory must emit byte-identical intervals to a live-model
    session fed the same pushes."""
    from segma_tpu.export import ExportedPipeline, export_inference

    out = tmp_path / "artifact_stream"
    export_inference(
        service.pipeline.model, out, buckets=(2,), batch_size=4,
        transport="int16",
    )
    exp_service = SegmentationService(ExportedPipeline.load(out))

    rng = np.random.default_rng(17)
    pcm = (rng.standard_normal(40_000) * 8000).astype(np.int16).tobytes()
    results = []
    for svc in (service, exp_service):
        sid = svc.stream_start()
        got = []
        for off in range(0, len(pcm), 9_000):
            got += svc.stream_push(
                sid, pcm[off : off + 9_000], "audio/l16;endianness=little"
            )
        got += svc.stream_flush(sid)
        results.append(sorted(got))
    assert results[0] == results[1] and len(results[0]) > 0


def test_artifact_sessions_batch_across_sessions(service, tmp_path):
    """With micro-batching on, concurrent sessions over an ARTIFACT share
    the exported fixed-shape batched program: fewer dispatches than
    pushes, identical intervals to unbatched artifact sessions."""
    import concurrent.futures

    from segma_tpu.export import ExportedPipeline, export_inference

    out = tmp_path / "artifact_batch"
    export_inference(
        service.pipeline.model, out, buckets=(2,), batch_size=4,
        transport="int16",
    )
    exp_batched = SegmentationService(
        ExportedPipeline.load(out), batch_window_ms=30.0, max_batch=8
    )
    exp_serial = SegmentationService(ExportedPipeline.load(out))

    rng = np.random.default_rng(23)
    pcm = [
        (rng.standard_normal(36_000) * 8000).astype(np.int16).tobytes()
        for _ in range(4)
    ]

    def run_session(svc, data):
        sid = svc.stream_start()
        got = []
        for off in range(0, len(data), 12_000):
            got += svc.stream_push(
                sid, data[off : off + 12_000], "audio/l16;endianness=little"
            )
        got += svc.stream_flush(sid)
        return sorted(got)

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        batched = list(ex.map(lambda d: run_session(exp_batched, d), pcm))
    serial = [run_session(exp_serial, d) for d in pcm]
    assert batched == serial and any(len(r) > 0 for r in serial)
    from segma_tpu.streaming import ChunkForwardBatcher

    assert isinstance(exp_batched._stream_forward, ChunkForwardBatcher)
    # 4 sessions x (2 full chunks + tail) = 12 forwards; batching must
    # have grouped at least some of them
    assert exp_batched._stream_forward.dispatches < 12


def test_streaming_rejected_for_legacy_artifact(service, tmp_path):
    """Artifacts exported before stream.jaxexp existed stay batch-only,
    with an error that says how to fix it (re-export)."""
    from segma_tpu.export import ExportedPipeline, export_inference

    out = tmp_path / "artifact_legacy"
    export_inference(
        service.pipeline.model, out, buckets=(2,), batch_size=4,
        transport="int16",
    )
    (out / "stream.jaxexp").unlink()
    exp_service = SegmentationService(ExportedPipeline.load(out))
    assert exp_service.pipeline.supports_streaming is False
    with pytest.raises(ValueError, match="re-export"):
        exp_service.stream_start()


def test_stream_double_flush_is_clean(service):
    """Flush atomically claims the session: a second flush (or a late
    push) gets 404-style KeyError, never a half-flushed segmenter."""
    sid = service.stream_start()
    service.stream_push(sid, np.zeros(4_000, "<i2").tobytes(), "audio/l16")
    service.stream_flush(sid)
    with pytest.raises(KeyError):
        service.stream_flush(sid)
    with pytest.raises(KeyError):
        service.stream_push(sid, b"\x00\x00", "audio/l16")


def test_stream_metrics_counted(service, server):
    """Streaming traffic shows up in /metrics (requests + audio seconds)."""
    def scrape():
        with urllib.request.urlopen(f"{server}/metrics", timeout=30) as r:
            return {
                ln.split()[0]: float(ln.split()[1])
                for ln in r.read().decode().splitlines()
                if ln and not ln.startswith("#")
            }

    before = scrape()
    _, raw = _post(f"{server}/v1/stream/start", b"")
    sid = json.loads(raw)["session"]
    pcm = np.zeros(16_000, "<i2").tobytes()
    _post(f"{server}/v1/stream/{sid}/push", pcm, "audio/l16; endianness=little")
    _post(f"{server}/v1/stream/{sid}/flush", b"")
    after = scrape()
    assert after["segma_requests_total"] - before["segma_requests_total"] == 2
    assert (
        after["segma_audio_seconds_total"] - before["segma_audio_seconds_total"]
        == pytest.approx(1.0, abs=0.01)
    )


def test_l16_content_type_case_insensitive(service):
    """'audio/L16' (RFC-canonical capitalization) must decode big-endian."""
    samples = np.array([1000, -2000, 300], np.int16)
    got = service._decode_l16(samples.astype(">i2").tobytes(), "audio/L16")
    np.testing.assert_array_equal(got, samples)
    got_le = service._decode_l16(
        samples.astype("<i2").tobytes(), "audio/L16; ENDIANNESS=LITTLE"
    )
    np.testing.assert_array_equal(got_le, samples)


def test_http_api_contract_is_stable(server, wav_bytes):
    """Response schemas and metric names are a deployed contract
    (clients parse them, dashboards alert on them) — change only with
    intent."""
    body, _ = wav_bytes
    _, raw = _post(f"{server}/v1/segment?uri=c", body)
    payload = json.loads(raw)
    assert set(payload) == {"uri", "sample_rate", "intervals"}
    assert all(
        set(iv) == {"label", "start_s", "end_s"} for iv in payload["intervals"]
    )

    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert set(health) == {"status", "version", "model", "labels", "device"}

    with urllib.request.urlopen(f"{server}/metrics", timeout=30) as r:
        names = {
            ln.split("{")[0].split()[0]
            for ln in r.read().decode().splitlines()
            if ln and not ln.startswith("#")
        }
    assert names == {
        "segma_requests_total", "segma_request_errors_total",
        "segma_audio_seconds_total", "segma_uptime_seconds",
        "segma_batch_dispatches_total", "segma_request_latency_seconds",
        "segma_host_rss_bytes",
    }


def test_ws_codec_roundtrip():
    """RFC 6455 framing: accept key (spec example), encode/decode
    round-trip through masked client frames."""
    import io

    from segma_tpu import ws

    # the handshake example from RFC 6455 §1.3
    assert (
        ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )
    for payload in (b"", b"hi", b"x" * 200, b"y" * 70_000):
        framed = ws.mask_frame(ws.OP_BINARY, payload)
        op, got = ws.read_frame(io.BytesIO(framed))
        assert op == ws.OP_BINARY and got == payload
    # unmasked client frame is a protocol violation
    with pytest.raises(ws.WebSocketError):
        ws.read_frame(io.BytesIO(ws.encode_frame(ws.OP_TEXT, b"nope")))


def _ws_client(server_url: str, path: str = "/v1/stream/ws"):
    """Tiny raw-socket websocket client for tests."""
    import socket
    from urllib.parse import urlparse

    from segma_tpu import ws

    u = urlparse(server_url)
    sock = socket.create_connection((u.hostname, u.port), timeout=30)
    f = sock.makefile("rwb")
    f.write(
        f"GET {path} HTTP/1.1\r\n".encode()
        + f"Host: {u.hostname}:{u.port}\r\n".encode()
        + b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
        b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
        b"Sec-WebSocket-Version: 13\r\n\r\n"
    )
    f.flush()
    status = f.readline()
    assert b"101" in status, status
    while f.readline() not in (b"\r\n", b""):
        pass  # drain handshake headers
    return sock, f, ws


def test_ws_streaming_matches_http_stream(server, service, wav_bytes):
    """WebSocket pushes produce the same intervals as the HTTP session
    path (same segmenter underneath), and close ends the session."""
    body, audio = wav_bytes
    pcm = (np.clip(audio, -1, 1) * 32767.0).astype(np.int16)

    sock, f, ws = _ws_client(server)
    try:
        collected = []
        for chunk in np.array_split(pcm, 5):
            f.write(ws.mask_frame(ws.OP_BINARY, chunk.astype("<i2").tobytes()))
            f.flush()
            op, payload = ws.read_frame(f, require_mask=False)
            assert op == ws.OP_TEXT
            collected += json.loads(payload)["intervals"]
        f.write(ws.mask_frame(ws.OP_TEXT, b"flush"))
        f.flush()
        op, payload = ws.read_frame(f, require_mask=False)
        assert op == ws.OP_TEXT
        collected += json.loads(payload)["intervals"]
        op, _ = ws.read_frame(f, require_mask=False)
        assert op == ws.OP_CLOSE
    finally:
        sock.close()

    _, offline_raw = _post(f"{server}/v1/segment?uri=x", body)
    offline = json.loads(offline_raw)["intervals"]
    key = lambda iv: (iv["start_s"], iv["end_s"], iv["label"])  # noqa: E731
    assert sorted(collected, key=key) == sorted(offline, key=key)
    assert len(offline) > 0


def test_ws_requires_upgrade_header(server):
    """Plain GET on the ws path gets a 400, not a hung socket."""
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{server}/v1/stream/ws", timeout=10)
    assert e.value.code == 400


def _settle(pred, timeout_s=5.0):
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return pred()


def test_ws_bad_payload_closes_cleanly(server, service):
    """A push whose byte count is not int16-aligned must answer with a
    1011 close frame (not a silent handler crash) and free the session
    (regression: ValueError escaped the route's catch list and the
    session leaked until TTL eviction)."""
    import struct

    sock, f, ws = _ws_client(server)
    try:
        f.write(ws.mask_frame(ws.OP_BINARY, b"\x01\x02\x03"))
        f.flush()
        op, payload = ws.read_frame(f, require_mask=False)
        assert op == ws.OP_CLOSE
        assert struct.unpack("!H", payload[:2])[0] == 1011
        assert b"ValueError" in payload[2:]
    finally:
        sock.close()
    assert _settle(lambda: not service._streams), service._streams


def test_ws_eof_mid_extended_length_frees_session(server, service):
    """A peer vanishing after announcing an extended-length frame must be
    treated as a normal disconnect: session freed, no handler traceback
    (regression: struct.error escaped the catch list)."""
    sock, f, ws = _ws_client(server)
    f.write(bytes([0x82, 0x80 | 126]))  # masked binary, ext length never sent
    f.flush()
    f.close()  # the makefile holds a dup'd fd — close both to send FIN
    sock.close()
    assert _settle(lambda: not service._streams), service._streams


def test_serving_under_device_mesh_matches_meshless(service, wav_bytes):
    """serve --mesh auto: a service whose pipeline shards the window axis
    over the 8-device CPU mesh must return exactly the meshless service's
    intervals (bit-parity of the serving surface under data parallelism)."""
    from segma_tpu.parallel.mesh import make_mesh

    _, audio = wav_bytes
    meshed = SegmentationService(
        InferencePipeline(
            service.pipeline.model,
            service.pipeline.model.params,
            batch_size=8,
            mesh=make_mesh(data=-1),
        )
    )
    pcm = (np.clip(audio, -1, 1) * 32767.0).astype(np.int16)
    body = pcm.astype("<i2").tobytes()
    got = meshed.segment(body, "audio/l16;endianness=little")
    ref = service.segment(body, "audio/l16;endianness=little")
    assert got == ref and len(ref) > 0


def test_sigterm_drains_and_stops(service):
    """SIGTERM (k8s/systemd stop) must end the serve loop gracefully and
    restore the previous handler — not reset clients or hang forever."""
    import os
    import signal
    import time

    from segma_tpu.serve import _serve_until_signalled

    prev = signal.getsignal(signal.SIGTERM)
    srv = make_server(service, port=0)

    def kill_soon():
        time.sleep(0.3)
        os.kill(os.getpid(), signal.SIGTERM)

    threading.Thread(target=kill_soon, daemon=True).start()
    t0 = time.monotonic()
    _serve_until_signalled(srv)  # returns once the signal lands
    assert time.monotonic() - t0 < 10
    assert signal.getsignal(signal.SIGTERM) is prev


def _read_http_response(f) -> tuple[bytes, bytes]:
    """Read one HTTP/1.1 response (status line, headers, Content-Length
    body) off a socket makefile; returns (status_line, body)."""
    status = f.readline()
    headers = {}
    while True:
        line = f.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        k, _, v = line.partition(b":")
        headers[k.strip().lower()] = v.strip()
    body = f.read(int(headers.get(b"content-length", 0)))
    return status, body


def test_malformed_content_length_gets_400(server):
    """A garbage Content-Length header must get a clean 400 response, not
    an unhandled int() ValueError that drops the connection without any
    reply (regression)."""
    import socket
    from urllib.parse import urlparse

    u = urlparse(server)
    sock = socket.create_connection((u.hostname, u.port), timeout=30)
    try:
        sock.sendall(
            b"POST /v1/segment HTTP/1.1\r\n"
            + f"Host: {u.hostname}:{u.port}\r\n".encode()
            + b"Content-Length: banana\r\n\r\n"
        )
        reply = sock.recv(65536)
    finally:
        sock.close()
    assert reply.startswith(b"HTTP/1.1 400"), reply[:120]
    assert b"Content-Length" in reply


def test_stream_start_body_does_not_desync_keepalive(server):
    """POST /v1/stream/start with a (pointless but legal) body: the
    handler must drain it, or the NEXT request on the same keep-alive
    connection is parsed out of the body bytes (regression: start never
    read the body)."""
    import socket
    from urllib.parse import urlparse

    u = urlparse(server)
    sock = socket.create_connection((u.hostname, u.port), timeout=30)
    f = sock.makefile("rwb")
    try:
        body = b'{"client": "sends-a-config-blob"}'
        f.write(
            b"POST /v1/stream/start HTTP/1.1\r\n"
            + f"Host: {u.hostname}:{u.port}\r\n".encode()
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        f.flush()
        status, first = _read_http_response(f)
        assert status.startswith(b"HTTP/1.1 200"), status
        sid = json.loads(first)["session"]
        # the SAME connection must parse the next request cleanly
        f.write(
            f"POST /v1/stream/{sid}/flush HTTP/1.1\r\n"
            f"Host: {u.hostname}:{u.port}\r\n"
            "Content-Length: 0\r\n\r\n".encode()
        )
        f.flush()
        status, _ = _read_http_response(f)
        assert status.startswith(b"HTTP/1.1 200"), status
    finally:
        sock.close()


def test_ws_close_payload_echo_is_well_formed(server):
    """Echoing a peer's 1-byte close payload (their protocol violation)
    would violate RFC 6455 §5.5.1 in OUR close frame — the reply payload
    must be empty or a full 2-byte code."""
    sock, f, ws = _ws_client(server)
    try:
        f.write(ws.mask_frame(ws.OP_CLOSE, b"\x03"))
        f.flush()
        op, _ = ws.read_frame(f, require_mask=False)  # final intervals
        assert op == ws.OP_TEXT
        op, payload = ws.read_frame(f, require_mask=False)
        assert op == ws.OP_CLOSE
        assert payload == b""
    finally:
        sock.close()


def test_http_request_fuzz(server):
    """Raw-socket fuzz of the HTTP layer itself — request line and header
    mutations (the body parsers have their own fuzz suite). Contract:
    every mutation gets a complete HTTP reply or a clean connection
    close, never a hang, and the server stays fully usable afterwards
    (no handler thread wedged holding a lock)."""
    import socket
    from urllib.parse import urlparse

    u = urlparse(server)
    rng = np.random.default_rng(0x1177)

    def roundtrip(raw: bytes) -> bytes:
        sock = socket.create_connection((u.hostname, u.port), timeout=20)
        try:
            try:
                sock.sendall(raw)
                # FIN our side: whatever the handler was waiting for
                # resolves, and keep-alive replies get a server-side close
                sock.shutdown(socket.SHUT_WR)
            except OSError:
                pass  # server legitimately closed on us mid-send
            chunks = []
            try:
                while True:
                    b = sock.recv(65536)
                    if not b:
                        break
                    chunks.append(b)
            except OSError:
                pass  # reset instead of FIN: treat as a close
            return b"".join(chunks)
        finally:
            sock.close()

    host = f"Host: {u.hostname}:{u.port}\r\n".encode()
    base = b"POST /v1/segment HTTP/1.1\r\n" + host
    cases = [
        b"\x00\x01\x02\x03\r\n\r\n",
        b"GARBAGE\r\n\r\n",
        b"POST\r\n\r\n",
        b"POST /v1/segment HTTP/9.9\r\n\r\n",
        base + b"Content-Length: banana\r\n\r\n",
        base + b"Content-Length: -5\r\n\r\n",
        base + b"Content-Length: 1e9\r\n\r\n",
        base + b"Content-Length: 4\r\nContent-Length: 4\r\n\r\nabcd",
        base + b"Content-Length: 10\r\n\r\nabc",  # under-sent body + FIN
        base + b"Content-Length: 4\r\nContent-Type: \xff\xfe\r\n\r\nabcd",
        base + b"Transfer-Encoding: chunked\r\n\r\n0\r\n\r\n",
        base + b"X-Filler: " + b"a" * 200_000 + b"\r\n\r\n",  # oversized header
        b"GET /" + b"a" * 100_000 + b" HTTP/1.1\r\n" + host + b"\r\n",
        b"POST /v1/stream/%00/push HTTP/1.1\r\n" + host
        + b"Content-Length: 0\r\n\r\n",
    ]
    for _ in range(40):  # seeded random request blobs
        n = int(rng.integers(1, 200))
        cases.append(
            rng.integers(0, 256, n, dtype=np.uint8).tobytes() + b"\r\n\r\n"
        )
    for i, raw in enumerate(cases):
        reply = roundtrip(raw)
        # a request line with no parseable HTTP version gets http.server's
        # HTTP/0.9-style reply: an error body with no status line
        ok = (
            reply == b""
            or reply.startswith(b"HTTP/1.")
            or reply.startswith(b"<!DOCTYPE")
        )
        assert ok, (i, reply[:80])
    # the server survived all of it: a clean request still works
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as resp:
        assert resp.status == 200


def test_stream_session_cap(service):
    """A hostile client cannot open unbounded streaming sessions: starts
    beyond max_sessions get SessionLimitError (HTTP 429), and flushing a
    session frees a slot."""
    from segma_tpu.serve import SegmentationService, SessionLimitError

    capped = SegmentationService(service.pipeline, max_sessions=2)
    a = capped.stream_start()
    capped.stream_start()
    with pytest.raises(SessionLimitError):
        capped.stream_start()
    capped.stream_flush(a)
    capped.stream_start()  # freed slot is reusable

    # and over HTTP the cap maps to 429
    srv = make_server(capped, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{url}/v1/stream/start", b"")
        assert e.value.code == 429
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{url}/v1/stream/ws", timeout=10)
        assert e.value.code in (400, 429)  # upgrade check may fire first
    finally:
        srv.shutdown()


def test_rss_watchdog_drains_and_exits_75(service):
    """--max-rss-gb: crossing the limit stops the serve loop gracefully
    and exits 75 (EX_TEMPFAIL) so the orchestrator restarts the process
    instead of the OOM killer resetting clients."""
    import time as _time

    from segma_tpu.serve import _serve_until_signalled

    srv = make_server(service, port=0)
    t0 = _time.monotonic()
    with pytest.raises(SystemExit) as e:
        # any real process's RSS exceeds 0.001 GB -> fires on first poll
        _serve_until_signalled(srv, max_rss_gb=0.001)
    assert e.value.code == 75
    assert _time.monotonic() - t0 < 60


def test_drain_waits_for_inflight_reply(service, wav_bytes):
    """Graceful shutdown must let an in-flight request finish replying:
    handler threads are daemon, so without the drain the process would
    exit (and kill the reply) the moment the accept loop stops
    (regression: 'drain' previously only stopped the accept loop)."""
    import time as _time

    from segma_tpu.serve import SegmentationService

    slow = SegmentationService(service.pipeline)
    orig = slow._segment_audios

    def slow_segment(audios):
        _time.sleep(1.0)
        return orig(audios)

    slow._segment_audios = slow_segment
    srv = make_server(slow, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    body, _ = wav_bytes
    result = {}

    def client():
        result["status"], result["raw"] = _post(f"{url}/v1/segment", body)

    ct = threading.Thread(target=client)
    ct.start()
    # wait until the request is actually in flight, then stop + drain
    deadline = _time.monotonic() + 5
    while srv.inflight() == 0 and _time.monotonic() < deadline:
        _time.sleep(0.01)
    assert srv.inflight() == 1
    srv.shutdown()
    srv.drain(grace_s=10.0)
    assert srv.inflight() == 0  # drain returned only after the reply
    ct.join(timeout=10)
    assert result.get("status") == 200 and json.loads(result["raw"])["intervals"]


def test_drain_force_closes_ws_sessions(service):
    """A long-lived WS session must not block the drain: its socket is
    force-closed, the handler exits via the disconnect path, and the
    session is discarded."""
    import time as _time

    from segma_tpu.serve import SegmentationService

    svc = SegmentationService(service.pipeline)
    srv = make_server(svc, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    sock, f, ws = _ws_client(url)
    try:
        f.write(ws.mask_frame(ws.OP_BINARY, np.zeros(8000, "<i2").tobytes()))
        f.flush()
        op, _ = ws.read_frame(f, require_mask=False)
        assert op == ws.OP_TEXT
        assert _settle(lambda: len(srv.ws_conns) == 1)
        srv.shutdown()
        t0 = _time.monotonic()
        srv.drain(grace_s=5.0)
        assert _time.monotonic() - t0 < 5.0  # the WS wasn't waited out
        # our end sees the close
        with pytest.raises((ConnectionError, OSError)):
            for _ in range(10):
                ws.read_frame(f, require_mask=False)
    finally:
        sock.close()
    assert _settle(lambda: not svc._streams), svc._streams
