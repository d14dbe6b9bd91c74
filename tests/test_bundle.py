"""Multi-model artifact bundles (segma_tpu/bundle.py) + bundle serving.

segma_tpu extension — the reference has no deployment packaging at all
(reference inference.py:398-440 needs the full torch stack). Contract
pinned here: one server process serves every artifact in a bundle behind
one port, routed per request with ?model=<name>.
"""

import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import jax
import numpy as np
import pytest

from segma_tpu.bundle import load_bundle, write_bundle_manifest
from segma_tpu.config import load_config
from segma_tpu.export import export_inference
from segma_tpu.models import Models
from segma_tpu.serve import ModelRouter, SegmentationService, make_server
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


def _make_model(seed: int):
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
    model.init_params(jax.random.key(seed))
    return model


@pytest.fixture(scope="module")
def bundle_dir(tmp_path_factory) -> Path:
    """Two artifacts with deterministically different outputs: 'alert'
    thresholds at 0 (everything fires) and 'strict' at 1 (nothing does)."""
    root = tmp_path_factory.mktemp("bundle")
    model = _make_model(0)
    labels = model.label_encoder.base_labels
    export_inference(
        model,
        root / "alert",
        thresholds={lb: {"lower_bound": 0.0, "upper_bound": 1.0} for lb in labels},
        buckets=(2,),
        batch_size=2,
        transport="int16",
        model_version="v1.2.0",
    )
    export_inference(
        model,
        root / "strict",
        thresholds={lb: {"lower_bound": 1.0, "upper_bound": 1.0} for lb in labels},
        buckets=(2,),
        batch_size=2,
        transport="int16",
    )
    write_bundle_manifest(root, default="alert")
    return root


@pytest.fixture(scope="module")
def bundle_server(bundle_dir):
    manifest, pipelines = load_bundle(bundle_dir)
    shared = threading.Lock()
    services = {
        name: SegmentationService(pipe, device_lock=shared)
        for name, pipe in pipelines.items()
    }
    router = ModelRouter(services, manifest["default"])
    srv = make_server(router, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", services
    srv.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as resp:
        return resp.status, resp.read()


def _post(url: str, body: bytes, ctype: str = "application/octet-stream"):
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", ctype)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, resp.read()


def _pcm_body() -> bytes:
    rng = np.random.default_rng(3)
    return (rng.standard_normal(16_000) * 8000).astype("<i2").tobytes()


# -- manifest ------------------------------------------------------------------


def test_bundle_manifest_catalog(bundle_dir):
    manifest = json.loads((bundle_dir / "bundle.json").read_text())
    assert manifest["format_version"] == 1
    assert manifest["default"] == "alert"
    assert set(manifest["models"]) == {"alert", "strict"}
    alert = manifest["models"]["alert"]
    assert alert["model_name"] == "conv_vad"
    assert alert["model_version"] == "v1.2.0"
    assert alert["created_at"]  # stamped by export_inference
    assert alert["path"] == "alert"
    assert manifest["models"]["strict"]["model_version"] is None


def test_ambiguous_default_rejected(bundle_dir, tmp_path):
    import shutil

    root = tmp_path / "no_default"
    shutil.copytree(bundle_dir, root)
    (root / "bundle.json").unlink()
    with pytest.raises(ValueError, match="pick the default"):
        write_bundle_manifest(root)
    # explicit default resolves it; a re-scan then keeps the election
    write_bundle_manifest(root, default="strict")
    out = write_bundle_manifest(root)
    assert json.loads(out.read_text())["default"] == "strict"


def test_unknown_default_rejected(bundle_dir):
    with pytest.raises(KeyError, match="nope"):
        write_bundle_manifest(bundle_dir, default="nope")


def test_load_bundle_without_manifest(bundle_dir, tmp_path):
    import shutil

    root = tmp_path / "bare"
    shutil.copytree(bundle_dir, root)
    (root / "bundle.json").unlink()
    manifest, pipelines = load_bundle(root, default="strict")
    assert manifest["default"] == "strict"
    assert set(pipelines) == {"alert", "strict"}


def test_newer_bundle_format_rejected(bundle_dir, tmp_path):
    import shutil

    root = tmp_path / "future"
    shutil.copytree(bundle_dir, root)
    manifest = json.loads((root / "bundle.json").read_text())
    manifest["format_version"] = 99
    (root / "bundle.json").write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="newer"):
        load_bundle(root)


def test_empty_bundle_dir_rejected(tmp_path):
    with pytest.raises(FileNotFoundError):
        write_bundle_manifest(tmp_path)


# -- serving -------------------------------------------------------------------


def test_models_endpoint(bundle_server):
    url, _ = bundle_server
    _, raw = _get(f"{url}/v1/models")
    payload = json.loads(raw)
    assert payload["default"] == "alert"
    assert set(payload["models"]) == {"alert", "strict"}
    alert = payload["models"]["alert"]
    assert alert["model_version"] == "v1.2.0"
    assert alert["streaming"] is True  # artifacts ship stream.jaxexp
    assert isinstance(alert["labels"], list) and len(alert["labels"]) > 0
    assert alert["created_at"]


def test_segment_routes_by_model(bundle_server):
    url, _ = bundle_server
    body = _pcm_body()
    ctype = "audio/l16;endianness=little"
    # default (alert, thresholds 0): every label fires over the whole clip
    _, raw_default = _post(f"{url}/v1/segment", body, ctype)
    _, raw_alert = _post(f"{url}/v1/segment?model=alert", body, ctype)
    _, raw_strict = _post(f"{url}/v1/segment?model=strict", body, ctype)
    default, alert, strict = (
        json.loads(r)["intervals"] for r in (raw_default, raw_alert, raw_strict)
    )
    assert default == alert and len(alert) > 0
    assert strict == []


def test_unknown_model_is_404(bundle_server):
    url, _ = bundle_server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{url}/v1/segment?model=nope", _pcm_body(), "audio/l16")
    assert e.value.code == 404
    assert "nope" in json.loads(e.value.read())["error"]


def test_healthz_lists_models(bundle_server):
    url, _ = bundle_server
    _, raw = _get(f"{url}/healthz")
    payload = json.loads(raw)
    assert payload["models"] == ["alert", "strict"]
    assert payload["default"] == "alert"


def test_metrics_per_model_series(bundle_server):
    url, _ = bundle_server
    _post(f"{url}/v1/segment?model=strict", _pcm_body(), "audio/l16")
    _, raw = _get(f"{url}/metrics")
    text = raw.decode()
    assert 'segma_requests_total{model="alert"}' in text
    assert 'segma_requests_total{model="strict"}' in text
    # exposition format: exactly one TYPE header per metric
    assert text.count("# TYPE segma_requests_total counter") == 1


def test_stream_session_over_artifact_bundle(bundle_server):
    """Bundle artifacts stream: a full start/push/flush session against
    the 'alert' model (thresholds 0 -> every label fires) over HTTP."""
    url, _ = bundle_server
    _, raw = _post(f"{url}/v1/stream/start?model=alert", b"")
    sid = json.loads(raw)["session"]
    pcm = (np.zeros(20_000) + 0.1 * 32767).astype("<i2").tobytes()
    _post(f"{url}/v1/stream/{sid}/push", pcm, "audio/l16;endianness=little")
    _, raw = _post(f"{url}/v1/stream/{sid}/flush", b"")
    intervals = json.loads(raw)["intervals"]
    assert len(intervals) > 0  # thresholds 0: everything fires


def test_bundle_cli_writes_manifest(bundle_dir, capsys):
    from segma_tpu.cli.bundle import main

    main([str(bundle_dir)])
    out = capsys.readouterr().out
    assert "default: alert" in out and "v1.2.0" in out
    assert json.loads((bundle_dir / "bundle.json").read_text())["default"] == "alert"


def test_ws_streaming_over_bundle_with_model_param(bundle_server):
    """GET /v1/stream/ws?model=<name> opens a WebSocket session against
    that bundle model's frozen stream program."""
    from tests.test_serve import _ws_client

    url, _ = bundle_server
    sock, f, ws = _ws_client(url, path="/v1/stream/ws?model=alert")
    try:
        pcm = (np.zeros(20_000) + 0.1 * 32767).astype("<i2").tobytes()
        f.write(ws.mask_frame(ws.OP_BINARY, pcm))
        f.flush()
        op, payload = ws.read_frame(f, require_mask=False)
        assert op == ws.OP_TEXT
        f.write(ws.mask_frame(ws.OP_TEXT, b"flush"))
        f.flush()
        op, payload = ws.read_frame(f, require_mask=False)
        assert op == ws.OP_TEXT
        final = json.loads(payload)
        # alert model: thresholds 0 -> every label fires over the clip
        assert len(final["intervals"]) > 0
        op, _ = ws.read_frame(f, require_mask=False)
        assert op == ws.OP_CLOSE
    finally:
        sock.close()


def test_ws_unknown_model_is_404(bundle_server):
    import socket
    from urllib.parse import urlparse

    url, _ = bundle_server
    u = urlparse(url)
    sock = socket.create_connection((u.hostname, u.port), timeout=30)
    f = sock.makefile("rwb")
    f.write(
        b"GET /v1/stream/ws?model=nope HTTP/1.1\r\n"
        + f"Host: {u.hostname}:{u.port}\r\n".encode()
        + b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
        b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n\r\n"
    )
    f.flush()
    assert b"404" in f.readline()
    sock.close()


# -- hot reload ------------------------------------------------------------------


def _export(model, out: Path, lower: float, version=None):
    labels = model.label_encoder.base_labels
    export_inference(
        model,
        out,
        thresholds={
            lb: {"lower_bound": lower, "upper_bound": 1.0} for lb in labels
        },
        buckets=(2,),
        batch_size=2,
        transport="int16",
        stream_batches=(2,),
        model_version=version,
    )


@pytest.fixture()
def reloadable_server(tmp_path):
    """A live bundle server over a MUTABLE bundle dir + its router."""
    from segma_tpu.serve import bundle_reloader

    root = tmp_path / "bundle"
    root.mkdir()
    model = _make_model(0)
    _export(model, root / "alert", 0.0, version="v1")
    write_bundle_manifest(root, default="alert")

    rescan = bundle_reloader(root)
    services, default, report = rescan({})
    assert report["added"] == ["alert"] and report["kept"] == []
    router = ModelRouter(services, default, reloader=rescan)
    srv = make_server(router, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", router, root, model
    srv.shutdown()


def test_admin_reload_adds_removes_and_drains(reloadable_server):
    """POST /admin/reload: a new artifact routes without a restart, an
    unchanged one keeps its service (metrics continuity), a removed one
    404s for NEW requests while an already-open streaming session on a
    replaced model drains to completion."""
    import shutil

    url, router, root, model = reloadable_server
    body = _pcm_body()

    # open a streaming session on the original artifact
    _, raw = _post(f"{url}/v1/stream/start?model=alert", b"")
    sid = json.loads(raw)["session"]
    old_service = router.get("alert")

    # add a second artifact and reload
    _export(model, root / "strict", 1.0)
    write_bundle_manifest(root)  # keeps the prior 'alert' election
    status, raw = _post(f"{url}/admin/reload", b"")
    report = json.loads(raw)
    assert status == 200
    assert report["added"] == ["strict"]
    assert report["kept"] == ["alert"] and report["default"] == "alert"
    assert router.get("alert") is old_service  # service object survived

    # the new model serves immediately (thresholds 1.0 -> no intervals)
    status, raw = _post(
        f"{url}/v1/segment?model=strict", body, "audio/l16;endianness=little"
    )
    assert status == 200 and json.loads(raw)["intervals"] == []
    # catalog reflects it
    _, raw = _get(f"{url}/v1/models")
    assert set(json.loads(raw)["models"]) == {"alert", "strict"}

    # remove 'strict' again: new requests 404, routing table shrinks
    shutil.rmtree(root / "strict")
    (root / "bundle.json").unlink()  # stale listing would fail the load
    write_bundle_manifest(root)
    status, raw = _post(f"{url}/admin/reload", b"")
    assert json.loads(raw)["removed"] == ["strict"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(
            f"{url}/v1/segment?model=strict",
            body,
            "audio/l16;endianness=little",
        )
    assert e.value.code == 404

    # the pre-reload streaming session still drains on its service
    _, raw = _post(
        f"{url}/v1/stream/{sid}/push",
        body,
        "audio/l16;endianness=little",
    )
    _, raw = _post(f"{url}/v1/stream/{sid}/flush", b"")
    assert json.loads(raw)["intervals"]  # thresholds 0.0 -> everything fires


def test_admin_reload_replaces_reexported_artifact(reloadable_server):
    """Re-exporting an artifact in place (new created_at) swaps in a new
    service on reload; sessions opened BEFORE the swap drain on the
    retired service, sessions after use the new one."""
    import time

    url, router, root, model = reloadable_server
    _, raw = _post(f"{url}/v1/stream/start", b"")
    old_sid = json.loads(raw)["session"]
    old_service = router.get("alert")

    time.sleep(1.1)  # created_at has 1 s resolution; force a new stamp
    _export(model, root / "alert", 0.0, version="v2")
    status, raw = _post(f"{url}/admin/reload", b"")
    report = json.loads(raw)
    assert report["replaced"] == ["alert"] and report["kept"] == []
    assert router.get("alert") is not old_service
    assert old_service in router._retired  # session keeps it alive

    _, raw = _get(f"{url}/v1/models")
    assert json.loads(raw)["models"]["alert"]["model_version"] == "v2"

    # the old session drains; a new session lands on the new service
    _, raw = _post(
        f"{url}/v1/stream/{old_sid}/push",
        _pcm_body(),
        "audio/l16;endianness=little",
    )
    _, raw = _post(f"{url}/v1/stream/{old_sid}/flush", b"")
    assert json.loads(raw)["intervals"]
    _, raw = _post(f"{url}/v1/stream/start", b"")
    new_sid = json.loads(raw)["session"]
    assert new_sid in router.get("alert")._streams
    # once the old session is gone, the next reload prunes the retiree
    _post(f"{url}/admin/reload", b"")
    assert old_service not in router._retired


def test_admin_reload_rejected_without_bundle(reloadable_server):
    """A router with no reloader (single-model serving) answers 409."""
    url, router, _, _ = reloadable_server
    single = ModelRouter.single(router.get("alert"))
    srv = make_server(single, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(
                f"http://127.0.0.1:{srv.server_address[1]}/admin/reload", b""
            )
        assert e.value.code == 409
    finally:
        srv.shutdown()


def test_admin_reload_failure_keeps_old_routing(reloadable_server):
    """A torn artifact makes /admin/reload answer 500 and leaves the
    previous routing table fully intact (the swap is atomic: it only
    happens after every artifact loaded and warmed)."""
    url, router, root, _model = reloadable_server
    before = dict(router.services)

    mf = root / "alert" / "manifest.json"
    orig = mf.read_text()
    mf.write_text("{ torn json")
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{url}/admin/reload", b"")
    assert e.value.code == 500
    assert router.services == before and router.default == "alert"
    # the old services keep serving
    status, _ = _post(
        f"{url}/v1/segment", _pcm_body(), "audio/l16;endianness=little"
    )
    assert status == 200

    # repair -> reload succeeds again (nothing latched the failure)
    mf.write_text(orig)
    status, raw = _post(f"{url}/admin/reload", b"")
    assert status == 200 and json.loads(raw)["kept"] == ["alert"]


def test_reload_prunes_abandoned_sessions_on_retired_services(
    reloadable_server, monkeypatch
):
    """An abandoned session (client vanished, never flushed) must not pin
    a retired service forever: the reload prune evicts TTL-stale sessions
    before deciding what to keep."""
    import time

    url, router, root, model = reloadable_server
    _, raw = _post(f"{url}/v1/stream/start", b"")
    old_service = router.get("alert")

    time.sleep(1.1)
    _export(model, root / "alert", 0.0, version="v2")
    _post(f"{url}/admin/reload", b"")
    assert old_service in router._retired  # open session keeps it

    # age the abandoned session past the TTL; the next reload prunes it
    monkeypatch.setattr(type(old_service), "STREAM_TTL_S", 0.0)
    _post(f"{url}/admin/reload", b"")
    assert old_service not in router._retired


def test_reload_under_traffic_soak(reloadable_server):
    """Hammer /v1/segment and full streaming sessions from several threads
    WHILE the bundle hot-reloads repeatedly (artifact re-exported in
    place). Every request must succeed — in-flight requests hold their
    service reference, sessions started before a swap drain on retired
    services, and the routing swap is atomic."""
    import time

    url, router, root, model = reloadable_server
    body = _pcm_body()
    stop = threading.Event()
    errors: list = []
    ok = {"segment": 0, "stream": 0}

    def segment_traffic():
        while not stop.is_set():
            try:
                status, raw = _post(
                    f"{url}/v1/segment", body, "audio/l16;endianness=little"
                )
                assert status == 200 and json.loads(raw)["intervals"]
                ok["segment"] += 1
            except Exception as e:  # noqa: BLE001 — collect, fail at end
                errors.append(e)

    def stream_traffic():
        while not stop.is_set():
            try:
                _, raw = _post(f"{url}/v1/stream/start", b"")
                sid = json.loads(raw)["session"]
                _post(
                    f"{url}/v1/stream/{sid}/push",
                    body,
                    "audio/l16;endianness=little",
                )
                _post(f"{url}/v1/stream/{sid}/flush", b"")
                ok["stream"] += 1
            except Exception as e:  # noqa: BLE001 — collect, fail at end
                errors.append(e)

    threads = [threading.Thread(target=segment_traffic) for _ in range(3)]
    threads += [threading.Thread(target=stream_traffic) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for i in range(3):
            time.sleep(1.1)  # force a fresh created_at stamp
            _export(model, root / "alert", 0.0, version=f"soak{i}")
            status, raw = _post(f"{url}/admin/reload", b"")
            assert status == 200
            assert json.loads(raw)["replaced"] == ["alert"]
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors[:3]
    assert ok["segment"] > 10 and ok["stream"] > 3, ok
    # steady state: one live service, retirees only while sessions drain
    assert set(router.services) == {"alert"}
