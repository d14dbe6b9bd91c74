"""End-to-end inference pipeline tests: chunk geometry parity, device
pipeline vs naive per-chunk reference computation, interval decode."""

from pathlib import Path

import jax
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.inference import (
    Chunkyfier,
    InferencePipeline,
    create_intervals,
    default_thresholds,
    infer_file,
    write_intervals,
)
from segma_tpu.models import Models
from segma_tpu.models.base import ConvolutionSettings
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"
FRAME_CS = ConvolutionSettings((320,), (320,), (0,))


# ---------------------------------------------------------------------------
# Chunkyfier geometry parity (reference inference.py:21-89 invariants)
# ---------------------------------------------------------------------------


def test_chunkyfier_derived_invariants():
    ck = Chunkyfier(128, 64_000, FRAME_CS)
    assert ck.n_windows == 199
    assert ck.missing_n_frames == 320
    assert ck.chunk_stride == 63_680
    assert ck.chunk_start_i(1) == 63_680
    assert ck.chunk_end_i(0) == 64_000
    assert ck.chunk_end_i_coverage(0) == 63_680
    assert ck.batch_start_i(1) == 128 * 63_680
    assert ck.batch_end_i(0) == 128 * 64_000
    assert ck.batch_end_i_coverage(0) == 128 * 64_000 - 128 * 320


def test_chunkyfier_fitting_chunks():
    ck = Chunkyfier(128, 64_000, FRAME_CS)
    assert ck.get_n_fitting_chunks(64_000) == 1
    assert ck.get_n_fitting_chunks(63_999) == 0
    assert ck.get_n_fitting_chunks(64_000 + 63_680) == 2
    # 60 s file
    assert ck.get_n_fitting_chunks(960_000) == 15


def test_total_frames_exact():
    ck = Chunkyfier(128, 64_000, FRAME_CS)
    # one chunk, leftover = 64000 - 63680 = 320 < 400 -> no tail frames
    assert ck.total_frames(64_000) == 199
    # tail 400 samples -> non-strict 400 // 321 = 1 frame
    assert ck.total_frames(63_680 + 400) == 199 + 1
    # tail 399 -> dropped
    assert ck.total_frames(63_680 + 399) == 199
    # 60 s file: 15 chunks + 4800-sample tail -> 4800 // 321 = 14
    assert ck.total_frames(960_000) == 15 * 199 + 14
    # shorter than a chunk: pure tail
    assert ck.total_frames(16_000) == 16_000 // 321
    assert ck.total_frames(200) == 0


# ---------------------------------------------------------------------------
# Device pipeline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vad_model():
    """Tiny f32 ConvVAD on 1 s chunks — all geometry derived, so this also
    exercises the no-hardcoded-199/320 property (1 s -> 49 windows)."""
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


CHUNK_1S = 16_000
STRIDE_1S = 15_680  # 49 windows * 320
N_W_1S = 49


def test_vad_forward_shape(vad_model):
    wav = np.zeros((2, CHUNK_1S), np.float32)
    logits = vad_model.apply(vad_model.params, wav)
    assert logits.shape == (2, N_W_1S, 4)
    assert logits.dtype == np.float32


def test_pipeline_matches_per_chunk_forward(vad_model):
    """The fused unfold+forward must equal naive per-chunk forwards."""
    rng = np.random.default_rng(0)
    n = CHUNK_1S + STRIDE_1S * 2 + 3_000  # 3 chunks + tail
    audio = (rng.standard_normal(n) * 0.1).astype(np.float32)

    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    got = pipe.logits_for_audio(audio)

    ck = pipe.chunkyfier
    assert ck.n_windows == N_W_1S and ck.chunk_stride == STRIDE_1S
    total = ck.total_frames(n)
    assert got.shape == (total, 4)

    # naive: forward each chunk separately at its stride offset
    for i in range(3):
        chunk = audio[i * STRIDE_1S : i * STRIDE_1S + CHUNK_1S]
        ref = np.asarray(vad_model.apply(vad_model.params, chunk[None, :]))[0]
        np.testing.assert_allclose(
            got[i * N_W_1S : (i + 1) * N_W_1S], ref, rtol=1e-4, atol=1e-5
        )


def test_pipeline_short_file(vad_model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(10_000) * 0.1).astype(np.float32)
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    got = pipe.logits_for_audio(audio)
    assert got.shape == (10_000 // 321, 4)


def test_pipeline_empty_for_tiny_file(vad_model):
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    got = pipe.logits_for_audio(np.zeros(300, np.float32))
    assert got.shape == (0, 4)


# ---------------------------------------------------------------------------
# Thresholds + interval decode
# ---------------------------------------------------------------------------


def test_apply_thresholds(vad_model):
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    logits = np.array([[2.0, -2.0, 0.1, -0.1], [-2.0, 2.0, -0.1, 0.1]], np.float32)
    thr = default_thresholds(("a", "b", "c", "d"))
    mask = pipe.apply_thresholds(logits, thr)
    np.testing.assert_array_equal(
        mask, [[True, False, True, False], [False, True, False, True]]
    )


def test_create_intervals_decode_math():
    enc = MultiLabelEncoder(["a", "b"])
    mask = np.zeros((10, 2), bool)
    mask[2:5, 0] = True  # frames 2,3,4 of label a
    mask[0:1, 1] = True  # frame 0 of label b
    mask[9:10, 1] = True  # last frame of label b
    out = create_intervals(mask, FRAME_CS, enc)
    # label a: start = rf_start(2) = 640, end = rf_end(4)+1 = 4*320+320 = 1600
    assert (640, 1600, "a") in out
    assert (0, 320, "b") in out
    assert (2880, 3200, "b") in out
    assert len(out) == 3


def test_create_intervals_negative_start_clamped():
    enc = MultiLabelEncoder(["a"])
    cs = ConvolutionSettings((400, 3, 3), (160, 1, 2), (200, 1, 1))  # rf_start(0) < 0
    mask = np.ones((2, 1), bool)
    out = create_intervals(mask, cs, enc)
    assert out[0][0] == 0  # max(0, rf_start)


def test_write_intervals_rttm(tmp_path):
    out = write_intervals(
        [(0, 16_000, "a"), (32_000, 48_000, "b")],
        Path("fake/uri_7.wav"),
        tmp_path,
    )
    assert out == tmp_path / "raw_rttm" / "uri_7.rttm"
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 2
    f0 = lines[0].split(" ")
    assert f0[0] == "SPEAKER" and f0[1] == "uri_7"
    assert float(f0[3]) == 0.0 and float(f0[4]) == 1.0


# ---------------------------------------------------------------------------
# Full file end-to-end on synthetic data
# ---------------------------------------------------------------------------


def test_infer_file_end_to_end(vad_model, synthetic_dataset, tmp_path):
    wav = next((synthetic_dataset / "wav").glob("*.wav"))
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=16)
    intervals = infer_file(wav, pipe, tmp_path, dump_logits=True)
    rttm = tmp_path / "raw_rttm" / f"{wav.stem}.rttm"
    assert rttm.exists()
    logits_npz = tmp_path / "logits" / f"{wav.stem}-logits_dict_t.npz"
    assert logits_npz.exists()
    loaded = np.load(logits_npz)
    assert set(loaded.files) == {"KCHI", "OCH", "MAL", "FEM"}
    ck = pipe.chunkyfier
    assert loaded["KCHI"].shape == (ck.total_frames(20 * 16_000),)
    # intervals land on the 320-sample grid, within the audio
    for s, e, label in intervals:
        assert 0 <= s < e
        assert s % 320 == 0 and e % 320 == 0


def test_int16_path_matches_f32(vad_model):
    """int16 PCM input (device-normalized) must match f32/32768 input."""
    rng = np.random.default_rng(5)
    pcm = (rng.standard_normal(40_000) * 3000).astype(np.int16)
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    got_i16 = pipe.logits_for_audio(pcm)
    got_f32 = pipe.logits_for_audio(pcm.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(got_i16, got_f32, rtol=1e-5, atol=1e-6)


def test_run_inference_on_audios_pipelined(vad_model, synthetic_dataset, tmp_path):
    """The pipelined batch entry writes one RTTM per file and logits dumps."""
    from segma_tpu.inference import run_inference_on_audios

    files = run_inference_on_audios(
        config=vad_model.config,
        wavs=synthetic_dataset / "wav",
        checkpoint=None,
        output=tmp_path,
        uris=synthetic_dataset / "test.txt",
        batch_size=16,
        dump_logits=True,
        model=vad_model,
    )
    assert len(files) == 5
    for f in files:
        assert (tmp_path / "raw_rttm" / f"{f.stem}.rttm").exists()
        assert (tmp_path / "logits" / f"{f.stem}-logits_dict_t.npz").exists()


def test_long_file_segmented_dispatch_matches_single(vad_model):
    """Files above max_bucket_chunks dispatch in segments; logits and
    intervals must match the single-dispatch path (bucket-cap correctness)."""
    rng = np.random.default_rng(11)
    # 11 chunks needed at the 1 s geometry; cap at 4 -> 3 segments (4+4+3)
    n = STRIDE_1S * 10 + CHUNK_1S + 2_000
    audio = (rng.standard_normal(n) * 3000).astype(np.int16)

    single = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    seg = InferencePipeline(
        vad_model, vad_model.params, batch_size=4, max_bucket_chunks=4
    )
    ref = single.logits_for_audio(audio)
    got = seg.logits_for_audio(audio)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    thr = default_thresholds(vad_model.label_encoder.base_labels)
    lg, tf = seg.logits_for_audio_async(audio)
    assert sorted(seg.decode_intervals(lg, thr, valid_frames=tf)) == sorted(
        single.decode_intervals(ref, thr)
    )
    # the device grid row count is re-bucketed to a power of two >= tf
    rows = int(lg.shape[0])
    assert rows >= tf and rows & (rows - 1) == 0


def test_packed_multifile_matches_per_file(vad_model):
    """logits_for_audios_async (packed dispatch) must match per-file calls
    (to float ulps — batch regrouping changes XLA fusion order) across mixed
    lengths and buckets."""
    rng = np.random.default_rng(8)
    lengths = [10_000, 40_000, 40_500, 90_000, 300, 16_000]
    audios = [
        (rng.standard_normal(n) * 3000).astype(np.int16) for n in lengths
    ]
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    packed = pipe.logits_for_audios_async(audios, pack_files=3)
    assert len(packed) == len(audios)
    for audio, (lg, tf) in zip(audios, packed):
        ref_lg, ref_tf = pipe.logits_for_audio_async(audio)
        assert tf == ref_tf
        if ref_lg is None:
            assert lg is None
        else:
            np.testing.assert_allclose(
                np.asarray(lg[:tf]),
                np.asarray(ref_lg[:tf]),
                rtol=1e-5,
                atol=1e-6,
            )


def test_packed_multifile_mixed_dtypes(vad_model):
    """int16 and f32 audios in one call must land in separate packed
    buffers (an f32 cast to int16 would zero the signal)."""
    rng = np.random.default_rng(14)
    a16 = (rng.standard_normal(20_000) * 3000).astype(np.int16)
    af = (rng.standard_normal(20_000) * 0.1).astype(np.float32)
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    packed = pipe.logits_for_audios_async([a16, af, a16], pack_files=3)
    for audio, (lg, tf) in zip([a16, af, a16], packed):
        ref_lg, ref_tf = pipe.logits_for_audio_async(audio)
        assert tf == ref_tf
        np.testing.assert_allclose(
            np.asarray(lg[:tf]), np.asarray(ref_lg[:tf]), rtol=1e-5, atol=1e-6
        )


def test_run_inference_pack_files_identical_rttm(
    vad_model, synthetic_dataset, tmp_path
):
    """--pack-files N writes byte-identical RTTMs vs per-file dispatch."""
    from segma_tpu.inference import run_inference_on_audios

    def run(out: Path, pack: int) -> dict[str, str]:
        run_inference_on_audios(
            config=vad_model.config,
            wavs=synthetic_dataset / "wav",
            checkpoint=None,
            output=out,
            uris=synthetic_dataset / "test.txt",
            batch_size=16,
            model=vad_model,
            mesh="off",
            pack_files=pack,
        )
        return {
            p.name: p.read_text()
            for p in sorted((out / "raw_rttm").glob("*.rttm"))
        }

    single = run(tmp_path / "single", 1)
    packed = run(tmp_path / "packed", 4)
    assert single and single == packed


def test_mulaw_transport_close_to_f32(vad_model):
    """mu-law int8 transport must match the f32 pipeline within companding
    noise (speech-transparent, ~38 dB SNR)."""
    from segma_tpu.inference import mulaw_compress

    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(40_000) * 0.1).astype(np.float32)
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    ref_logits = pipe.logits_for_audio(wav)
    got_logits = pipe.logits_for_audio(mulaw_compress(wav))
    assert got_logits.shape == ref_logits.shape
    # logits shift slightly with companding noise; decisions shouldn't
    np.testing.assert_allclose(got_logits, ref_logits, atol=0.35)
    agree = np.mean((got_logits > 0) == (ref_logits > 0))
    assert agree > 0.97


def test_mulaw_roundtrip_snr():
    from segma_tpu.inference import mulaw_compress

    rng = np.random.default_rng(3)
    x = (rng.standard_normal(16_000) * 0.2).clip(-1, 1).astype(np.float32)
    q = mulaw_compress(x).astype(np.float32) / 127.0
    y = np.sign(q) * (1.0 / 255.0) * (256.0 ** np.abs(q) - 1.0)
    snr = 10 * np.log10((x**2).mean() / ((x - y) ** 2).mean())
    assert snr > 30.0


def test_postprocess_intervals():
    from segma_tpu.inference import postprocess_intervals

    iv = [(0, 320, "a"), (640, 960, "a"), (5000, 5100, "a"), (0, 320, "b")]
    # merge gaps < 400 samples: (0,320)+(640,960) -> (0,960); 5000 too far
    merged = postprocess_intervals(iv, merge_gap_f=400)
    assert (0, 960, "a") in merged and (5000, 5100, "a") in merged
    assert (0, 320, "b") in merged
    # then drop < 200-sample intervals
    out = postprocess_intervals(iv, min_duration_f=200, merge_gap_f=400)
    assert (5000, 5100, "a") not in out
    # no-op passthrough
    assert postprocess_intervals(iv) == iv


def test_total_frames_property_random_lengths():
    """total_frames == full-chunk frames + tail frames for random lengths,
    and every counted frame's receptive field starts within the audio."""
    ck = Chunkyfier(128, 64_000, FRAME_CS)
    rng = np.random.default_rng(0)
    for n in rng.integers(0, 2_000_000, size=200):
        n = int(n)
        total = ck.total_frames(n)
        # enumerate: full chunks then the tail rule
        n_fit = ck.get_n_fitting_chunks(n)
        expect = n_fit * ck.n_windows
        tail = n - ck.chunk_start_i(n_fit)
        if tail >= 400:
            expect += ck.cnn_settings.n_windows(tail, strict=False)
        assert total == expect, n
        if total > 0:
            # last counted frame's grid start lies inside the audio
            assert (total - 1) * 320 < n


def test_threshold_dict_key_order_robust(vad_model):
    """A reordered thresholds YAML must still map bounds to the right labels
    (dict insertion order != label order)."""
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    logits = np.array([[3.0, 3.0, 3.0, 3.0]], np.float32)  # probs ~0.95
    # classes order: KCHI, OCH, MAL, FEM; give MAL an impossible bound but
    # list it FIRST in the dict
    thr = {
        "MAL": {"lower_bound": 0.99, "upper_bound": 1.0},
        "KCHI": {"lower_bound": 0.5, "upper_bound": 1.0},
        "OCH": {"lower_bound": 0.5, "upper_bound": 1.0},
        "FEM": {"lower_bound": 0.5, "upper_bound": 1.0},
    }
    mask = pipe.apply_thresholds(logits, thr)
    np.testing.assert_array_equal(mask, [[True, True, False, True]])


def test_total_frames_reference_tail():
    """reference_tail=True emits a FULL chunk of frames for any >=400-sample
    tail (the reference's zero-padded Whisper tail pass,
    reference inference.py:191-207)."""
    ck = Chunkyfier(128, 64_000, FRAME_CS)
    # tail 400 samples -> full 199 tail frames instead of 1
    assert ck.total_frames(63_680 + 400, reference_tail=True) == 199 + 199
    # tail 399 -> still dropped
    assert ck.total_frames(63_680 + 399, reference_tail=True) == 199
    # exact chunk, leftover 320 < 400 -> no tail either way
    assert ck.total_frames(64_000, reference_tail=True) == 199
    # sub-chunk file >= 400 samples -> one full chunk of frames
    assert ck.total_frames(16_000, reference_tail=True) == 199
    # 60 s file: 15 chunks + 4800-sample tail -> 16 full chunks of frames
    assert ck.total_frames(960_000, reference_tail=True) == 16 * 199


def test_reference_tail_mode_end_to_end(vad_model):
    """With audio.reference_tail=true the pipeline's logits equal the
    reference's apply_model_on_audio semantics INCLUDING the end-of-file
    region: per-chunk forwards for every fitting chunk, then one forward of
    the zero-padded tail emitting a full chunk of frames (reference
    inference.py:191-207), with interval decode allowed to extend past EOF.
    Closes the BASELINE 'bit-faithful intervals' tail gap."""
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=conv_vad",
            "model.config={hidden: 32, depth: 1, dtype: f32}",
            "audio.chunk_duration_s=1.0",
            "audio.reference_tail=true",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model_rt = Models["conv_vad"](enc, cfg)
    model_rt.params = vad_model.params  # same weights, compat-mode config

    rng = np.random.default_rng(77)
    n = CHUNK_1S + STRIDE_1S + 5_000  # 2 fitting chunks + 5000-sample tail
    audio = (rng.standard_normal(n) * 0.3).astype(np.float32)

    pipe = InferencePipeline(model_rt, model_rt.params, batch_size=4)
    got = pipe.logits_for_audio(audio)
    n_fit = pipe.chunkyfier.get_n_fitting_chunks(n)
    assert n_fit == 2
    assert got.shape == ((n_fit + 1) * N_W_1S, 4)

    # reference semantics re-implementation: naive per-chunk forwards, then
    # the zero-padded tail forward keeping ALL frames
    expected = []
    for i in range(n_fit):
        chunk = audio[i * STRIDE_1S : i * STRIDE_1S + CHUNK_1S]
        expected.append(
            np.asarray(vad_model.apply(vad_model.params, chunk[None, :]))[0]
        )
    tail = audio[n_fit * STRIDE_1S :]
    padded = np.zeros(CHUNK_1S, np.float32)
    padded[: tail.shape[0]] = tail
    expected.append(
        np.asarray(vad_model.apply(vad_model.params, padded[None, :]))[0]
    )
    expected = np.concatenate(expected)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    # intervals: decode both with identical math -> exact equality, and the
    # grid now covers frames past EOF (the reference's padded-tail frames)
    thr = default_thresholds(enc.base_labels)
    mask_got = pipe.apply_thresholds(got, thr)
    mask_ref = 1.0 / (1.0 + np.exp(-expected)) > 0.5
    iv_got = sorted(create_intervals(mask_got, pipe.frame_settings, enc))
    iv_ref = sorted(create_intervals(mask_ref, pipe.frame_settings, enc))
    assert iv_got == iv_ref
    last_grid_end = pipe.frame_settings.rf_end_i((n_fit + 1) * N_W_1S - 1) + 1
    assert last_grid_end > n  # the compat grid really extends past EOF

    # default mode on the same audio emits strictly fewer frames
    pipe_default = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    got_default = pipe_default.logits_for_audio(audio)
    assert got_default.shape[0] < got.shape[0]
    np.testing.assert_allclose(
        got[: got_default.shape[0]], got_default, rtol=1e-4, atol=1e-5
    )


def test_decode_intervals_packed_bit_identical(vad_model):
    """The packed on-device run-length decode must emit exactly the same
    intervals as the mask-download path, for random logits and for a padded
    device grid with valid_frames."""
    from segma_tpu.inference import intervals_from_boundaries

    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    thr = default_thresholds(vad_model.label_encoder.base_labels)
    rng = np.random.default_rng(21)
    for t in (1, 7, 199, 996):
        logits = (rng.standard_normal((t, 4)) * 2).astype(np.float32)
        starts, ends = pipe.decode_boundaries(logits, thr)
        ref = sorted(
            intervals_from_boundaries(starts, ends, pipe.frame_settings,
                                      vad_model.label_encoder)
        )
        got = sorted(pipe.decode_intervals(logits, thr))
        assert got == ref, t
        # padded grid + valid_frames: pad with WILD logits that would fire
        # if not masked
        grid = np.concatenate([logits, np.full((64, 4), 9.0, np.float32)])
        got_grid = sorted(pipe.decode_intervals(grid, thr, valid_frames=t))
        assert got_grid == ref, t


def test_decode_intervals_overflow_falls_back(vad_model):
    """More runs than the static capacity -> identical output via the mask
    fallback (alternating frames = worst case)."""
    pipe = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    thr = default_thresholds(vad_model.label_encoder.base_labels)
    t = 4096
    logits = np.where(
        (np.arange(t) % 2 == 0)[:, None], 5.0, -5.0
    ).astype(np.float32) * np.ones((1, 4), np.float32)
    got = sorted(pipe.decode_intervals(logits, thr))
    mask = 1 / (1 + np.exp(-logits)) > 0.5
    ref = sorted(create_intervals(mask, pipe.frame_settings,
                                  vad_model.label_encoder))
    assert got == ref
    assert len(got) == 4 * (t // 2)


def test_decode_parity_vs_masked_array_semantics():
    """Bit-parity of interval decode against the reference's
    np.ma.notmasked_contiguous formulation (reference inference.py:237-263),
    re-expressed here with numpy masked arrays on random masks."""
    enc = MultiLabelEncoder(["w", "x", "y", "z"])
    rng = np.random.default_rng(123)
    for cs in (FRAME_CS, ConvolutionSettings((400, 3, 3), (160, 1, 2), (200, 1, 1))):
        for _ in range(20):
            mask = rng.random((rng.integers(1, 400), 4)) > 0.7

            # reference-style decode: masked-value runs per label column
            slices = np.ma.notmasked_contiguous(
                np.ma.masked_values(mask.astype(int), value=0), axis=0
            )
            expected = []
            for label_i, label in enumerate(enc.base_labels):
                for sl in slices[label_i]:
                    expected.append(
                        (
                            max(0, cs.rf_start_i(sl.start)),
                            cs.rf_end_i(sl.stop - 1) + 1,
                            label,
                        )
                    )

            got = create_intervals(mask, cs, enc)
            assert sorted(got) == sorted(expected)


def test_packed_dispatch_caps_long_files(vad_model):
    """A file needing more than max_bucket_chunks in a packed dispatch is
    routed through the segmented single-file path instead of being padded
    to the next power of two (regression: round-2 review — the cap the
    constructor documents only applied to single-file calls)."""
    rng = np.random.default_rng(9)
    pipe = InferencePipeline(
        vad_model, vad_model.params, batch_size=4, max_bucket_chunks=2
    )
    long_a = (rng.standard_normal(70_000) * 3000).astype(np.int16)  # >2 chunks
    short_a = (rng.standard_normal(12_000) * 3000).astype(np.int16)
    packed = pipe.logits_for_audios_async([long_a, short_a], pack_files=4)
    for audio, (lg, tf) in zip([long_a, short_a], packed):
        ref_lg, ref_tf = pipe.logits_for_audio_async(audio)
        assert tf == ref_tf
        np.testing.assert_allclose(
            np.asarray(lg[:tf]), np.asarray(ref_lg[:tf]), rtol=1e-5, atol=1e-6
        )


def test_run_inference_skips_undecodable_file(vad_model, synthetic_dataset, tmp_path, capsys):
    """One corrupt WAV must not abandon the rest of the batch: good files
    still get RTTMs, the bad one is reported and excluded from the return
    (regression: round-2 review — the producer's stop sentinel silently
    ended the whole run)."""
    import shutil

    from segma_tpu.inference import run_inference_on_audios

    wav_dir = tmp_path / "wav"
    shutil.copytree(synthetic_dataset / "wav", wav_dir)
    bad = wav_dir / "0002.wav"  # uri order: corrupt a middle file
    bad.write_bytes(b"NOT A WAV FILE")

    files = run_inference_on_audios(
        config=vad_model.config,
        wavs=wav_dir,
        checkpoint=None,
        output=tmp_path / "out",
        batch_size=16,
        model=vad_model,
    )
    out = capsys.readouterr().out
    assert "SKIPPED" in out and "0002" in out and "WARNING: 1/" in out
    assert all(f.stem != "0002" for f in files)
    assert len(files) >= 2
    for f in files:
        assert (tmp_path / "out" / "raw_rttm" / f"{f.stem}.rttm").exists()
    assert not (tmp_path / "out" / "raw_rttm" / "0002.rttm").exists()


def test_load_mono_rejects_sample_rate_mismatch(tmp_path):
    """expect_sr turns a wrong-rate file (silently wrong-timescale
    intervals otherwise) into a clean ValueError on every decode path."""
    from segma_tpu.inference import _load_mono
    from segma_tpu.utils.io import write_data_to_disk

    rng = np.random.default_rng(9)
    p = tmp_path / "hifi.wav"
    write_data_to_disk(
        (rng.standard_normal(44_100) * 0.2).astype(np.float32),
        p,
        sample_rate=44_100,
    )
    with pytest.raises(ValueError, match="sample rate 44100"):
        _load_mono(p, expect_sr=16_000)
    assert _load_mono(p, expect_sr=44_100).shape[0] == 44_100
    assert _load_mono(p).shape[0] == 44_100  # no expectation: no check


def test_run_inference_skips_sample_rate_mismatch(
    vad_model, synthetic_dataset, tmp_path, capsys
):
    """A wrong-rate WAV in a batch is SKIPPED (like a corrupt one), not
    silently mis-segmented on the wrong frame grid."""
    import shutil

    from segma_tpu.inference import run_inference_on_audios
    from segma_tpu.utils.io import write_data_to_disk

    wav_dir = tmp_path / "wav"
    shutil.copytree(synthetic_dataset / "wav", wav_dir)
    rng = np.random.default_rng(9)
    write_data_to_disk(
        (rng.standard_normal(48_000) * 0.2).astype(np.float32),
        wav_dir / "0002.wav",
        sample_rate=48_000,
    )

    files = run_inference_on_audios(
        config=vad_model.config,
        wavs=wav_dir,
        checkpoint=None,
        output=tmp_path / "out",
        batch_size=16,
        model=vad_model,
    )
    out = capsys.readouterr().out
    assert "SKIPPED" in out and "sample rate 48000" in out
    assert all(f.stem != "0002" for f in files) and len(files) >= 2
