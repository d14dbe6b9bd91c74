"""4-bit block-ADPCM transport codec (segma_tpu/ops/adpcm.py).

The reference has no transport layer (it ships f32 tensors per batch,
``/root/reference/src/segma/inference.py:92-116``); this is a segma_tpu
serving extension, so the contract is pinned entirely here: byte budget,
jax/numpy decode equality, zero-buffer safety, round-trip SNR, and
pipeline-level decision agreement mirroring the mu-law transport tests.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.inference import InferencePipeline
from segma_tpu.models import Models
from segma_tpu.ops.adpcm import (
    BYTES_PER_BLOCK,
    adpcm_decode,
    adpcm_decode_np,
    adpcm_encode,
    encoded_nbytes,
)
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


def speech_like(n: int, seed: int = 0) -> np.ndarray:
    """Tonal + lowpassed-noise signal (speech-band energy distribution)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16_000
    x = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.15 * np.sin(2 * np.pi * 880 * t)
    noise = np.convolve(rng.standard_normal(n), np.ones(8) / 8, mode="same")
    return (x + 0.05 * noise).clip(-1, 1).astype(np.float32)


def test_byte_budget():
    assert BYTES_PER_BLOCK == 35
    # 0.547 bytes/sample: 1.83x fewer than mu-law int8, 3.7x fewer than int16
    assert encoded_nbytes(64_000) / 64_000 == pytest.approx(35 / 64)


def test_jax_decode_matches_numpy():
    x = speech_like(20_000, seed=1)
    enc = adpcm_encode(x)
    np.testing.assert_array_equal(
        np.asarray(adpcm_decode(enc, 20_000)), adpcm_decode_np(enc, 20_000)
    )


def test_zero_bytes_decode_to_silence():
    """Zero-padding a transport buffer must decode to digital silence (the
    pipeline pads encoded buffers to bucketed lengths)."""
    out = adpcm_decode_np(np.zeros(35 * 16, np.uint8), 35 * 16 // 35 * 64)
    assert np.abs(out).max() == 0.0


def test_roundtrip_snr_speech_like():
    x = speech_like(64_000)
    y = adpcm_decode_np(adpcm_encode(x), 64_000)
    snr = 10 * np.log10((x**2).mean() / ((x - y) ** 2).mean())
    assert snr > 38.0  # second-order prediction kicks in on tonal content


def test_second_order_blocks_selected_on_tonal_content():
    """Tonal blocks use the order-2 predictor, noise blocks order 1."""
    from segma_tpu.ops.adpcm import BYTES_PER_BLOCK as BPB

    t = np.arange(16_000) / 16_000
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(16_000) * 0.1).clip(-1, 1).astype(np.float32)
    for sig, want_order2 in [(tone, True), (noise, False)]:
        hdr = adpcm_encode(sig).reshape(-1, BPB)[:, 2]
        frac2 = float(np.mean(hdr >> 7))
        assert (frac2 > 0.9) == want_order2


def test_int16_and_float_inputs_agree():
    x = speech_like(16_000, seed=2)
    xi = np.rint(x * 32767).astype(np.int16)
    np.testing.assert_array_equal(adpcm_encode(x), adpcm_encode(xi))


def test_non_block_aligned_length():
    x = speech_like(16_000 + 37, seed=3)
    enc = adpcm_encode(x)
    y = adpcm_decode_np(enc, x.shape[0])
    assert y.shape == x.shape
    snr = 10 * np.log10((x**2).mean() / ((x - y) ** 2).mean())
    assert snr > 28.0


def test_batched_encode_matches_per_row():
    a = speech_like(8_000, seed=4)
    b = speech_like(8_000, seed=5)
    batched = adpcm_encode(np.stack([a, b]))
    np.testing.assert_array_equal(batched[0], adpcm_encode(a))
    np.testing.assert_array_equal(batched[1], adpcm_encode(b))


@pytest.fixture(scope="module")
def vad_model():
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
    return model


def test_adpcm_transport_close_to_f32(vad_model):
    """transport='adpcm' must track the f32 pipeline about as well as the
    established lossy serving transport (mu-law) does ON THE SAME SIGNAL.

    An absolute agreement bar is meaningless here: the fixture model is
    random-init, so its logits sit near the decision threshold and ANY
    transport noise flips borderline frames (mu-law itself lands ~0.94 on
    this signal). The claim under test is relative: adpcm ships 1.83x fewer
    bytes than mu-law at comparable fidelity."""
    from segma_tpu.inference import mulaw_compress

    wav = speech_like(40_000, seed=6)
    pipe_f32 = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    pipe_q = InferencePipeline(
        vad_model, vad_model.params, batch_size=4, transport="adpcm"
    )
    ref_logits = pipe_f32.logits_for_audio(wav)
    mul_logits = pipe_f32.logits_for_audio(mulaw_compress(wav))
    got_logits = pipe_q.logits_for_audio(wav)
    assert got_logits.shape == ref_logits.shape
    np.testing.assert_allclose(got_logits, ref_logits, atol=0.6)
    agree_adpcm = np.mean((got_logits > 0) == (ref_logits > 0))
    agree_mulaw = np.mean((mul_logits > 0) == (ref_logits > 0))
    assert agree_adpcm > agree_mulaw - 0.05
    assert np.abs(got_logits - ref_logits).mean() < np.abs(
        mul_logits - ref_logits
    ).mean() + 0.05


def test_adpcm_packed_multi_file_matches_single(vad_model):
    """Packed dispatch re-encodes per group; results must equal the
    per-file adpcm dispatch exactly (same codec, same padding)."""
    a = speech_like(20_000, seed=7)
    b = np.rint(speech_like(33_000, seed=8) * 32767).astype(np.int16)
    pipe = InferencePipeline(
        vad_model, vad_model.params, batch_size=4, transport="adpcm"
    )
    packed = pipe.logits_for_audios_async([a, b], pack_files=2)
    for audio, (lg, tf) in zip([a, b], packed):
        ref_lg, ref_tf = pipe.logits_for_audio_async(audio)
        assert tf == ref_tf
        np.testing.assert_allclose(
            np.asarray(lg[:tf]), np.asarray(ref_lg[:tf]), rtol=1e-5, atol=1e-6
        )


def test_preencoded_matches_ship_side_encode(vad_model):
    """AdpcmAudio (encode once, pad zero BLOCKS at dispatch) must produce
    the bit-identical bitstream — hence identical logits — to the
    transport='adpcm' pipeline that encodes the zero-padded waveform at
    the dispatch site."""
    from segma_tpu.ops.adpcm import adpcm_encode_audio

    wav = np.rint(speech_like(40_321, seed=9) * 32767).astype(np.int16)
    pipe_ship = InferencePipeline(
        vad_model, vad_model.params, batch_size=4, transport="adpcm"
    )
    pipe_pre = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    ref = pipe_ship.logits_for_audio(wav)
    got = pipe_pre.logits_for_audio(adpcm_encode_audio(wav))
    np.testing.assert_array_equal(got, ref)


def test_adpcm_transport_rejects_mulaw_int8(vad_model):
    """transport='adpcm' must refuse dtypes adpcm_encode cannot interpret
    (an int8 mu-law buffer would be clipped to +/-1 LSB and silently
    destroyed; round-3 advisor finding)."""
    pipe = InferencePipeline(
        vad_model, vad_model.params, batch_size=4, transport="adpcm"
    )
    mulaw = np.zeros(40_321, dtype=np.int8)
    with pytest.raises(TypeError, match="mu-law"):
        pipe.logits_for_audio(mulaw)


def test_preencoded_segmented_long_file(vad_model):
    """Segmented dispatch slices pre-encoded blocks at chunk strides
    (always BLOCK-aligned for rf_step-320 models); logits must match the
    unsegmented pre-encoded dispatch (same decoded samples; tolerance is
    XLA reassociation between the two differently-shaped programs)."""
    from segma_tpu.ops.adpcm import adpcm_encode_audio

    wav = np.rint(speech_like(6 * 16_000, seed=10) * 32767).astype(np.int16)
    enc = adpcm_encode_audio(wav)
    whole = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    seg = InferencePipeline(
        vad_model, vad_model.params, batch_size=4, max_bucket_chunks=2
    )
    ref = whole.logits_for_audio(enc)
    got = seg.logits_for_audio(enc)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_preencoded_packed_matches_single(vad_model):
    from segma_tpu.ops.adpcm import adpcm_encode_audio

    a = adpcm_encode_audio(
        np.rint(speech_like(20_000, seed=11) * 32767).astype(np.int16)
    )
    b = adpcm_encode_audio(
        np.rint(speech_like(33_000, seed=12) * 32767).astype(np.int16)
    )
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    packed = pipe.logits_for_audios_async([a, b], pack_files=2)
    for audio, (lg, tf) in zip([a, b], packed):
        ref_lg, ref_tf = pipe.logits_for_audio_async(audio)
        assert tf == ref_tf
        np.testing.assert_allclose(
            np.asarray(lg[:tf]), np.asarray(ref_lg[:tf]), rtol=1e-5, atol=1e-6
        )


def test_predict_cli_adpcm_end_to_end(vad_model, synthetic_dataset, tmp_path):
    """--transport adpcm produces sane RTTMs on the synthetic fixture: same
    uri coverage as int16 and near-identical total per-label duration."""
    from segma_tpu.inference import run_inference_on_audios

    def run(out: Path, transport: str) -> dict:
        run_inference_on_audios(
            config=vad_model.config,
            wavs=synthetic_dataset / "wav",
            checkpoint=None,
            output=out,
            uris=synthetic_dataset / "test.txt",
            batch_size=16,
            model=vad_model,
            mesh="off",
            transport=transport,
        )
        rttms = {}
        for p in sorted((out / "raw_rttm").glob("*.rttm")):
            rttms[p.name] = p.read_text()
        return rttms

    ref = run(tmp_path / "mulaw", "mulaw")
    got = run(tmp_path / "adpcm", "adpcm")
    assert set(got) == set(ref) and len(ref) > 0

    def durations(rttms: dict) -> dict:
        tot: dict[str, float] = {}
        for text in rttms.values():
            for line in text.splitlines():
                f = line.split()
                tot[f[7]] = tot.get(f[7], 0.0) + float(f[4])
        return tot

    d_ref, d_got = durations(ref), durations(got)
    assert set(d_got) == set(d_ref)
    # compared against mu-law (the established lossy serving transport),
    # not int16: the fixture model is random-init, so logits sit near the
    # threshold and ANY codec noise flips borderline frames (mu-law itself
    # shifts per-label durations ~25% vs int16 here). A trained model's
    # margins dwarf the ~30 dB codec noise.
    for label, dur in d_ref.items():
        assert d_got[label] == pytest.approx(dur, rel=0.2, abs=0.5)
