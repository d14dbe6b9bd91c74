"""Mixed-traffic chaos soak against a running segma_tpu server.

One-shot segments, HTTP stream sessions, WebSocket sessions, catalog
reads and periodic hot reloads, all concurrent, via the client SDK.
Reports per-kind counts and every error. Usage:

    python scripts/chaos_soak.py http://HOST:PORT <duration_s>
"""
from segma_tpu.client import SegmaClient, SegmaClientError

BASE = sys.argv[1]
DURATION_S = float(sys.argv[2])
stop = time.monotonic() + DURATION_S
errors, counts = [], {"segment": 0, "http_stream": 0, "ws_stream": 0, "catalog": 0, "reload": 0}
lock = threading.Lock()

def bump(k):
    with lock: counts[k] += 1

def seg_worker(i):
    c = SegmaClient(BASE, timeout_s=120)
    rng = np.random.default_rng(i)
    while time.monotonic() < stop:
        try:
            c.segment((rng.standard_normal(16000 * 8) * 3000).astype(np.int16), uri=f"w{i}")
            bump("segment")
        except Exception as e: errors.append(("segment", repr(e)))

def http_stream_worker(i):
    c = SegmaClient(BASE, timeout_s=120)
    rng = np.random.default_rng(100 + i)
    while time.monotonic() < stop:
        try:
            with c.stream() as s:
                for _ in range(6):
                    s.push((rng.standard_normal(8000) * 3000).astype(np.int16))
            bump("http_stream")
        except SegmaClientError as e:
            if e.status != 429: errors.append(("http_stream", repr(e)))
        except Exception as e: errors.append(("http_stream", repr(e)))

def ws_worker(i):
    c = SegmaClient(BASE, timeout_s=120)
    rng = np.random.default_rng(200 + i)
    while time.monotonic() < stop:
        try:
            with c.stream_ws() as s:
                for _ in range(6):
                    s.push((rng.standard_normal(8000) * 3000).astype(np.int16))
            bump("ws_stream")
        except SegmaClientError as e:
            if e.status != 429: errors.append(("ws_stream", repr(e)))
        except Exception as e: errors.append(("ws_stream", repr(e)))

def meta_worker():
    c = SegmaClient(BASE, timeout_s=60)
    while time.monotonic() < stop:
        try:
            c.models(); c.health(); c.metrics(); bump("catalog")
        except Exception as e: errors.append(("catalog", repr(e)))
        time.sleep(2.0)

def reload_worker():
    c = SegmaClient(BASE, timeout_s=120)
    while time.monotonic() < stop:
        time.sleep(45.0)
        if time.monotonic() >= stop: break
        try:
            c.reload(); bump("reload")
        except Exception as e: errors.append(("reload", repr(e)))

workers = (
    [threading.Thread(target=seg_worker, args=(i,)) for i in range(3)]
    + [threading.Thread(target=http_stream_worker, args=(i,)) for i in range(2)]
    + [threading.Thread(target=ws_worker, args=(i,)) for i in range(2)]
    + [threading.Thread(target=meta_worker), threading.Thread(target=reload_worker)]
)
for t in workers: t.start()
for t in workers: t.join(timeout=DURATION_S + 180)
print(json.dumps({"counts": counts, "n_errors": len(errors), "errors": errors[:6]}))
