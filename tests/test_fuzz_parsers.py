"""Adversarial-input fuzzing for every parser that consumes untrusted bytes.

The WAV reader takes HTTP uploads (serve.py spools request bodies through
it), the WebSocket frame reader takes raw socket bytes, and the .aa/RTTM
parsers take dataset files. Contract pinned here: malformed input raises a
*clean, expected* error type (ValueError family, or ConnectionError for
socket EOF) — never struct.error/IndexError/ZeroDivisionError leaking to
callers, never a hang, never an unbounded allocation. The native C++
decoder must agree: same acceptance on valid files, error (not crash) on
garbage.
"""

import io as _io
import struct

import numpy as np
import pytest

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.utils import native
from segma_tpu.utils.io import (
    get_audio_info,
    get_samples_in_range,
    read_pcm16_mono,
    write_data_to_disk,
)

CLEAN_WAV_ERRORS = (ValueError, FileNotFoundError, OSError)


def _probe_all(path):
    """Run every WAV entry point; raise only what they raise."""
    info = get_audio_info(path)
    get_samples_in_range(path, 0, -1)
    get_samples_in_range(path, 3, 100)
    read_pcm16_mono(path)
    return info


def _write(tmp_path, name: str, blob: bytes):
    p = tmp_path / name
    p.write_bytes(blob)
    return p


# -- WAV: random fuzz -----------------------------------------------------------


def test_wav_random_bytes_fuzz(tmp_path):
    """Seeded random blobs — plain noise and RIFF/WAVE-prefixed noise so
    the chunk walker actually runs — must parse or raise cleanly."""
    rng = np.random.default_rng(0xC0FFEE)
    for i in range(200):
        size = int(rng.integers(0, 600))
        blob = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        if i % 2:  # get past the magic check so the walker sees the bytes
            blob = b"RIFF" + blob[:4].ljust(4, b"\0") + b"WAVE" + blob
        p = _write(tmp_path, f"fuzz_{i}.wav", blob)
        try:
            _probe_all(p)
        except CLEAN_WAV_ERRORS:
            pass
        p.unlink()


def test_wav_structured_mutations(tmp_path):
    """Field-targeted corruption of a valid file: every mutation must
    decode to SOMETHING or raise a clean error, and the fixed cases must
    raise the documented error type."""
    rng = np.random.default_rng(7)
    wav = tmp_path / "base.wav"
    write_data_to_disk(rng.standard_normal(2000).astype(np.float32) * 0.3, wav)
    base = wav.read_bytes()

    # truncate at every boundary the parser cares about, plus a sweep
    offsets = {0, 1, 4, 8, 11, 12, 13, 19, 20, 21, 35, 36, 37, 43, 44, 45}
    offsets |= {int(o) for o in rng.integers(0, len(base), 40)}
    for off in sorted(offsets):
        p = _write(tmp_path, "trunc.wav", base[:off])
        try:
            _probe_all(p)
        except CLEAN_WAV_ERRORS:
            pass

    def mutate(offset: int, payload: bytes) -> bytes:
        return base[:offset] + payload + base[offset + len(payload) :]

    # chunk-size fields: zero, huge, odd; fmt fields: zero channels,
    # sub-byte bits, bogus format codes
    mutations = [
        mutate(16, struct.pack("<I", 0)),  # fmt size 0
        mutate(16, struct.pack("<I", 0xFFFFFFFF)),  # fmt size huge
        mutate(40, struct.pack("<I", 0xFFFFFFFF)),  # data size huge
        mutate(40, struct.pack("<I", 0)),  # data size 0
        mutate(40, struct.pack("<I", 7)),  # data size not frame-aligned
        mutate(22, struct.pack("<H", 0)),  # 0 channels
        mutate(34, struct.pack("<H", 4)),  # 4-bit samples
        mutate(34, struct.pack("<H", 12)),  # 12-bit samples
        mutate(20, struct.pack("<H", 0x55)),  # unknown codec id
        base[:12] + base[36:],  # data chunk before any fmt chunk
    ]
    for i, blob in enumerate(mutations):
        p = _write(tmp_path, f"mut_{i}.wav", blob)
        try:
            _probe_all(p)
        except CLEAN_WAV_ERRORS:
            pass


def test_wav_extensible_truncated_body_raises_valueerror(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE whose fmt chunk CLAIMS >= 40 bytes but whose
    body ends early: the SubFormat read must be a clean ValueError (the
    HTTP server maps ValueError to 400), never struct.error."""
    body16 = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 40) + body16  # claims 40, writes 16
    )
    p = _write(tmp_path, "ext.wav", blob)
    import os

    os.environ["SEGMA_TPU_NO_NATIVE"] = "1"
    native._lib.cache_clear()  # the handle is cached; re-check the env var
    try:
        with pytest.raises(ValueError, match="truncated extensible"):
            get_samples_in_range(p, 0, -1)
    finally:
        del os.environ["SEGMA_TPU_NO_NATIVE"]
        native._lib.cache_clear()


def test_wav_unknown_chunks_skipped_with_odd_sizes(tmp_path):
    """RIFF word alignment: odd-sized unknown chunks carry a pad byte; the
    walker must still land on the data chunk behind them."""
    rng = np.random.default_rng(3)
    samples = (rng.standard_normal(500) * 0.25).astype(np.float32)
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    junk = [b"LIST" + struct.pack("<I", 7) + b"junkbyt" + b"\0"]  # odd + pad
    junk += [b"cue " + struct.pack("<I", 0)]  # zero-size chunk: no progress trap
    payload = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"".join(junk)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    blob = b"RIFF" + struct.pack("<I", len(payload)) + payload
    p = _write(tmp_path, "junk.wav", blob)
    info = get_audio_info(p)
    assert info.n_samples == 500 and info.sample_rate == 16000
    out = read_pcm16_mono(p)
    np.testing.assert_array_equal(out, np.frombuffer(pcm, "<i2"))


@pytest.mark.skipif(not native.available(), reason="native decoder not built")
def test_wav_native_python_agree_on_fuzz(tmp_path):
    """Same fuzz corpus through both decoders: they must agree on
    accept/reject, and on the decoded samples when both accept."""
    import os

    rng = np.random.default_rng(0xBEEF)
    wav = tmp_path / "seed.wav"
    write_data_to_disk(rng.standard_normal(1500).astype(np.float32) * 0.3, wav)
    base = wav.read_bytes()
    corpus = [base]
    for i in range(60):
        off = int(rng.integers(0, len(base)))
        corpus.append(base[:off])  # truncations
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):  # byte flips
            blob[int(rng.integers(0, len(base)))] = int(rng.integers(0, 256))
        corpus.append(bytes(blob))

    for i, blob in enumerate(corpus):
        p = _write(tmp_path, f"agree_{i}.wav", blob)

        def run(no_native: bool):
            if no_native:
                os.environ["SEGMA_TPU_NO_NATIVE"] = "1"
            native._lib.cache_clear()
            try:
                return ("ok", get_samples_in_range(p, 0, -1))
            except CLEAN_WAV_ERRORS:
                return ("err", None)
            finally:
                os.environ.pop("SEGMA_TPU_NO_NATIVE", None)
                native._lib.cache_clear()

        st_native, out_native = run(no_native=False)
        st_py, out_py = run(no_native=True)
        assert st_native == st_py, f"case {i}: native={st_native} py={st_py}"
        if st_py == "ok":
            np.testing.assert_allclose(
                out_native, out_py, atol=1e-6,
                err_msg=f"case {i}: decoders disagree on accepted file",
            )


# -- WebSocket frames ------------------------------------------------------------


def test_ws_random_bytes_fuzz():
    """Random socket bytes: read_frame must return a frame or raise
    WebSocketError/ConnectionError — nothing else, and never a giant
    allocation (the RNG can emit 127-length headers claiming 2**63)."""
    from segma_tpu import ws

    rng = np.random.default_rng(0xF00D)
    for _ in range(400):
        size = int(rng.integers(0, 64))
        blob = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        try:
            ws.read_frame(_io.BytesIO(blob))
        except (ws.WebSocketError, ConnectionError):
            pass


def test_ws_oversized_length_claim_rejected():
    """A 14-byte header claiming a 2**62-byte payload must be refused
    BEFORE any payload read (memory-DoS guard), as must anything over
    MAX_FRAME_BYTES."""
    from segma_tpu import ws

    class _Exploder(_io.BytesIO):
        def read(self, n=-1):
            assert n is None or n <= 14, f"tried to buffer {n} bytes"
            return super().read(n)

    for claim in (1 << 62, ws.MAX_FRAME_BYTES + 1):
        head = bytes([0x82, 0x80 | 127]) + struct.pack("!Q", claim)
        with pytest.raises(ws.WebSocketError, match="cap"):
            ws.read_frame(_Exploder(head + b"\x00" * 4))
    # exactly at the cap the claim itself is legal (payload EOFs cleanly)
    head = bytes([0x82, 0x80 | 127]) + struct.pack("!Q", ws.MAX_FRAME_BYTES)
    with pytest.raises(ConnectionError):
        ws.read_frame(_io.BytesIO(head + b"\x00" * 4))


def test_ws_roundtrip_property():
    """encode/mask -> read_frame round-trips payloads across every length
    encoding (7-bit, 16-bit, 64-bit) and all opcodes."""
    from segma_tpu import ws

    rng = np.random.default_rng(11)
    for n in (0, 1, 125, 126, 127, 65_535, 65_536, 70_001):
        payload = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        op = int(rng.choice([ws.OP_TEXT, ws.OP_BINARY, ws.OP_PING]))
        mask = rng.integers(0, 256, 4, dtype=np.uint8).tobytes()
        got_op, got = ws.read_frame(
            _io.BytesIO(ws.mask_frame(op, payload, mask))
        )
        assert (got_op, got) == (op, payload)
        got_op, got = ws.read_frame(
            _io.BytesIO(ws.encode_frame(op, payload)), require_mask=False
        )
        assert (got_op, got) == (op, payload)


def test_ws_truncations_raise_connectionerror():
    """EOF at EVERY byte boundary of a valid masked frame is a clean
    ConnectionError (peer vanished), never a hang or struct.error."""
    from segma_tpu import ws

    frame = ws.mask_frame(ws.OP_BINARY, b"\x01\x02" * 200)  # 16-bit length
    for cut in range(len(frame) - 1):
        with pytest.raises((ConnectionError, ws.WebSocketError)):
            ws.read_frame(_io.BytesIO(frame[:cut]))


# -- annotation line formats -----------------------------------------------------


def test_annotation_line_fuzz():
    """Malformed .aa / RTTM lines raise ValueError, never IndexError."""
    rng = np.random.default_rng(21)
    alphabet = list("SPEAKER <NA> 0123.x\t-einf")
    cases = ["", " ", "a b", "a b c d e", "u NaN 1 lab: ok", "\x00\x00"]
    cases += [
        "".join(rng.choice(alphabet, int(rng.integers(1, 60))))
        for _ in range(150)
    ]
    for line in cases:
        for parser in (AudioAnnotation.read_line, AudioAnnotation.from_rttm):
            try:
                parser(line)
            except ValueError:
                pass

    # and the documented good cases still parse
    a = AudioAnnotation.read_line("uid 1.5 2.25 male")
    assert (a.uid, a.start_time_s, a.duration_s, a.label) == ("uid", 1.5, 2.25, "male")
    r = AudioAnnotation.from_rttm(a.to_rttm())
    assert (r.uid, r.start_time_s, r.duration_s, r.label) == ("uid", 1.5, 2.25, "male")


def test_rttm_frame_tensor_malformed_lines(tmp_path):
    """The tuner's raw RTTM rasterizer names the file and line on
    malformed input instead of leaking IndexError."""
    import pytest

    from segma_tpu.tune import rttm_to_frame_tensor

    p = tmp_path / "bad.rttm"
    good = "SPEAKER u <NA> 1.0 2.0 <NA> <NA> male <NA> <NA>\n"
    for bad in ("SPEAKER u <NA> 1.0\n", "SPEAKER u <NA> x y <NA> <NA> male a b\n"):
        p.write_text(good + bad)
        with pytest.raises(ValueError, match="bad.rttm:2"):
            rttm_to_frame_tensor(p, ["male"])
    p.write_text(good)
    assert rttm_to_frame_tensor(p, ["male"]).sum() > 0


def test_wav_huge_data_size_claim_is_clamped(tmp_path):
    """A tiny file whose header CLAIMS a 4 GB data chunk must report only
    the bytes actually present — otherwise every caller sizes buffers off
    the claim (gigabytes of allocation from a 100-byte upload: a memory
    DoS the serving body cap cannot see). Both decoders must agree."""
    import os

    pcm = np.arange(50, dtype="<i2").tobytes()  # 100 real bytes
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 0xFFFFFFF0) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0xFFFFFFF0) + pcm
    )
    p = _write(tmp_path, "huge_claim.wav", blob)

    for no_native in (False, True):
        if no_native:
            os.environ["SEGMA_TPU_NO_NATIVE"] = "1"
        native._lib.cache_clear()
        try:
            info = get_audio_info(p)
            assert info.n_samples == 50, (no_native, info.n_samples)
            out = read_pcm16_mono(p)
            np.testing.assert_array_equal(out, np.frombuffer(pcm, "<i2"))
            rng = get_samples_in_range(p, 0, -1)
            assert rng.shape[-1] == 50
        finally:
            os.environ.pop("SEGMA_TPU_NO_NATIVE", None)
            native._lib.cache_clear()
