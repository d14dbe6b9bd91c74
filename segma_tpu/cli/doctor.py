"""Environment diagnostics: ``segma-tpu doctor``.

One command that answers "is this box ready to train/serve?" — versions,
devices, a timed device round-trip (catches relay stalls before an
expensive job does), compile-cache state, the native decoder, and the
mesh a config would resolve to. Exit code 0 = healthy, 1 = a check
failed.
"""

from __future__ import annotations

import argparse
import time


def _row(name: str, ok: bool, detail: str) -> bool:
    mark = "ok " if ok else "FAIL"
    print(f"[{mark}] {name:<18} {detail}", flush=True)
    return ok


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="environment diagnostics")
    parser.add_argument(
        "--config", default=None,
        help="also resolve the device mesh this config would build",
    )
    parser.add_argument(
        "--probe-timeout", type=float, default=60.0,
        help="seconds before the device round-trip probe counts as a stall",
    )
    args = parser.parse_args(argv)

    healthy = True

    from segma_tpu import __version__

    import jax

    _row("segma_tpu", True, __version__)
    _row("jax", True, jax.__version__)

    try:
        devices = jax.devices()
        healthy &= _row(
            "devices",
            len(devices) > 0,
            f"{len(devices)} x {devices[0].platform} ({devices[0]})",
        )
    except Exception as e:  # noqa: BLE001 — report, don't crash
        healthy = _row("devices", False, f"{type(e).__name__}: {e}")
        devices = []

    if devices:
        # timed round-trip with a REAL data dependency (block_until_ready
        # alone does not force execution through some relays)
        import threading

        import numpy as np

        result: dict = {}

        def probe() -> None:
            t0 = time.perf_counter()
            try:
                x = np.ones(1024, np.float32)
                val = float(np.asarray(jax.jit(lambda a: (a * 2).sum())(x)))
                result["dt"] = time.perf_counter() - t0
                result["ok"] = val == 2048.0
            except Exception as e:  # noqa: BLE001
                result["err"] = f"{type(e).__name__}: {e}"

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout=args.probe_timeout)
        if t.is_alive():
            healthy = _row(
                "device probe",
                False,
                f"no round-trip within {args.probe_timeout:g}s — the "
                "device link looks stalled; retry in a few minutes",
            )
        elif "err" in result:
            healthy = _row("device probe", False, result["err"])
        else:
            healthy &= _row(
                "device probe",
                result.get("ok", False),
                f"round-trip {result['dt'] * 1e3:.0f} ms",
            )

    import os
    from pathlib import Path

    cache_d = Path(
        os.environ.get(
            "SEGMA_TPU_CACHE", Path.home() / ".cache" / "segma_tpu_xla"
        )
    )
    n = sum(1 for _ in cache_d.glob("*")) if cache_d.exists() else 0
    _row("compile cache", True, f"{cache_d} ({n} entries)")

    from segma_tpu.utils import host_mem_total_gb, host_rss_gb, native

    _row(
        "native decoder",
        True,
        "built" if native.available() else "absent (pure-python fallback)",
    )
    _row(
        "host memory",
        True,
        f"rss {host_rss_gb():.2f} GB / total {host_mem_total_gb():.0f} GB",
    )

    if args.config:
        try:
            from segma_tpu.config import load_config
            from segma_tpu.parallel.mesh import make_mesh

            cfg = load_config(args.config)
            mesh = make_mesh(cfg)
            healthy &= _row("mesh", True, f"{dict(mesh.shape)}")
        except Exception as e:  # noqa: BLE001
            healthy = _row("mesh", False, f"{type(e).__name__}: {e}")

    raise SystemExit(0 if healthy else 1)


if __name__ == "__main__":
    main()
