"""ctypes bindings to the native WAV decoder (``native/wavio.cpp``).

Transparent fast path for ``segma_tpu.utils.io``: when
``native/libsegmawav.so`` has been built (``make native``), header probes,
ranged decodes and threaded batch decodes run in C++; otherwise callers
fall back to the pure-numpy implementation.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "native" / "libsegmawav.so"


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL | None:
    if os.environ.get("SEGMA_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.wavio_probe.restype = ctypes.c_int
    lib.wavio_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.wavio_read_range.restype = ctypes.c_int64
    lib.wavio_read_range.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.wavio_read_pcm16.restype = ctypes.c_int64
    lib.wavio_read_pcm16.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16),
    ]
    lib.wavio_read_batch_pcm16.restype = ctypes.c_int
    lib.wavio_read_batch_pcm16.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
    ]
    return lib


def available() -> bool:
    return _lib() is not None


# wavio.cpp return codes (see native/wavio.cpp)
_ERRORS = {
    -1: "cannot open file",
    -2: "not a decodable RIFF/WAVE file (bad or truncated header)",
    -3: "unsupported WAV sample encoding",
}


def _err(call: str, rc: int, path: Path | str) -> ValueError:
    reason = _ERRORS.get(rc, f"error {rc}")
    return ValueError(f"{path}: {reason} ({call})")


def probe(path: Path | str) -> tuple[int, int, int, int, int] | None:
    """(sample_rate, channels, bits, format, n_frames) or None on fallback."""
    lib = _lib()
    if lib is None:
        return None
    out = (ctypes.c_int64 * 5)()
    rc = lib.wavio_probe(str(path).encode(), out)
    if rc != 0:
        raise _err("wavio_probe", rc, path)
    return tuple(int(v) for v in out)


def read_range(
    path: Path | str, start: int, n: int, channels: int
) -> np.ndarray | None:
    """Interleaved float32 (frames, channels) decode, or None on fallback."""
    lib = _lib()
    if lib is None:
        return None
    if n < 0:
        info = probe(path)
        n = info[4] - max(0, start)
    buf = np.empty(max(n, 0) * channels, np.float32)
    got = lib.wavio_read_range(
        str(path).encode(), start, n, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if got < 0:
        raise _err("wavio_read_range", got, path)
    return buf[: got * channels].reshape(int(got), channels)


def read_pcm16(path: Path | str, start: int = 0, n: int = -1) -> np.ndarray | None:
    """Raw int16 samples of a mono PCM16 file; None when unsupported."""
    lib = _lib()
    if lib is None:
        return None
    if n < 0:
        info = probe(path)
        if info[3] != 1 or info[2] != 16 or info[1] != 1:
            return None
        n = info[4] - max(0, start)
    buf = np.empty(max(n, 0), np.int16)
    got = lib.wavio_read_pcm16(
        str(path).encode(), start, n, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
    )
    if got == -3:  # not mono PCM16 — caller should fall back
        return None
    if got < 0:
        raise _err("wavio_read_pcm16", got, path)
    return buf[:got]


def read_batch_pcm16(
    paths: list[Path | str], max_frames: int, n_threads: int = 4
) -> tuple[np.ndarray, np.ndarray] | None:
    """Threaded batch decode -> (int16 (n, max_frames), lengths (n,))."""
    lib = _lib()
    if lib is None:
        return None
    n = len(paths)
    buf = np.empty((n, max_frames), np.int16)
    lengths = np.zeros(n, np.int64)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.wavio_read_batch_pcm16(
        c_paths,
        n,
        max_frames,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads,
    )
    if rc != 0:
        raise _err("wavio_read_batch_pcm16", rc, "batch")
    return buf, lengths
