"""Self-contained inference artifacts (segma_tpu/export.py).

segma_tpu extension — the reference has no deployment story (inference
needs the full torch stack + checkpoint, reference inference.py:398-440).
Contract pinned here: an exported artifact reproduces the live pipeline's
logits and intervals without touching the model zoo.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from segma_tpu.config import load_config
from segma_tpu.export import ExportedPipeline, export_inference
from segma_tpu.inference import InferencePipeline, default_thresholds
from segma_tpu.models import Models
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


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


@pytest.fixture(scope="module")
def artifact(vad_model, tmp_path_factory) -> Path:
    out = tmp_path_factory.mktemp("artifact") / "conv_vad"
    export_inference(
        vad_model, out, buckets=(2, 4), batch_size=4, transport="int16"
    )
    return out


def test_artifact_layout(artifact):
    names = {p.name for p in artifact.iterdir()}
    assert names == {
        "manifest.json",
        "infer_2.jaxexp",
        "decode_2.jaxexp",
        "infer_4.jaxexp",
        "decode_4.jaxexp",
        "stream.jaxexp",
        "stream_int16.jaxexp",
        "stream_batch2.jaxexp",
        "stream_batch4.jaxexp",
        "stream_batch8.jaxexp",
    }


def test_exported_logits_match_live_pipeline(vad_model, artifact):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(50_000) * 3000).astype(np.int16)
    live = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    ref = live.logits_for_audio(wav)
    exp = ExportedPipeline.load(artifact)
    got = exp.logits_for_audio(wav)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_exported_segment_matches_live_intervals(vad_model, artifact):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(33_000) * 3000).astype(np.int16)
    thr = default_thresholds(vad_model.label_encoder.base_labels)

    live = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    lg, tf = live.logits_for_audio_async(wav)
    ref = sorted(live.decode_intervals(lg, thr, valid_frames=tf))

    exp = ExportedPipeline.load(artifact)
    got = exp.segment(wav)
    assert got == ref


def test_exported_long_file_segments_over_largest_bucket(vad_model, artifact):
    """A file needing more chunks than the largest exported bucket (4)
    dispatches in segments; logits must still match the live pipeline."""
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(10 * 16_000) * 3000).astype(np.int16)
    live = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    ref = live.logits_for_audio(wav)
    got = ExportedPipeline.load(artifact).logits_for_audio(wav)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_exported_adpcm_artifact(vad_model, tmp_path):
    """ADPCM-transport artifact: prepare() encodes, programs expect bytes."""
    out = tmp_path / "adpcm_artifact"
    export_inference(
        vad_model, out, buckets=(4,), batch_size=4, transport="adpcm"
    )
    exp = ExportedPipeline.load(out)
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(40_000) * 3000).astype(np.int16)

    live = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    from segma_tpu.ops.adpcm import adpcm_encode_audio

    ref = live.logits_for_audio(adpcm_encode_audio(wav))
    got = exp.logits_for_audio(exp.prepare(wav))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_segment_accepts_channel_major_audio(vad_model, artifact):
    """segment() takes (channels, n) arrays as io.get_all_samples returns
    them — same downmix convention as inference.infer_file."""
    rng = np.random.default_rng(4)
    mono = (rng.standard_normal(33_000) * 0.2).astype(np.float32)
    exp = ExportedPipeline.load(artifact)
    ref = exp.segment(mono)
    assert exp.segment(mono[None]) == ref  # (1, n)
    stereo = np.stack([mono, mono])  # (2, n) downmix == mono
    assert exp.segment(stereo) == ref


def test_manifest_carries_tuned_thresholds(vad_model, tmp_path):
    thr = {
        lbl: {"lower_bound": 0.3 + 0.1 * i, "upper_bound": 1.0}
        for i, lbl in enumerate(vad_model.label_encoder.base_labels)
    }
    out = tmp_path / "thr_artifact"
    export_inference(
        vad_model, out, thresholds=thr, buckets=(2,), transport="int16"
    )
    exp = ExportedPipeline.load(out)
    assert exp.manifest["thresholds"] == thr


def test_newer_format_version_rejected(artifact, tmp_path):
    import json
    import shutil

    clone = tmp_path / "newer"
    shutil.copytree(artifact, clone)
    m = json.loads((clone / "manifest.json").read_text())
    m["format_version"] = 999
    (clone / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(ValueError, match="newer"):
        ExportedPipeline.load(clone)


def test_prepare_stereo_int16_scale(vad_model, artifact):
    """(2, n) int16 input: the downmix must return to [-1, 1] scale before
    transport encoding (regression: round-2 review — int16-scale floats
    were clipped to square waves)."""
    rng = np.random.default_rng(5)
    mono16 = (rng.standard_normal(33_000) * 3000).astype(np.int16)
    exp = ExportedPipeline.load(artifact)
    ref = exp.segment(mono16)
    stereo = np.stack([mono16, mono16])
    assert exp.segment(stereo) == ref


def test_predict_cli_from_artifact(vad_model, synthetic_dataset, tmp_path):
    """scripts/predict.py --artifact writes the same RTTMs as the live
    config+checkpoint path (full CLI surface, no model zoo)."""
    from segma_tpu.inference import main as predict_main, run_inference_on_audios

    artifact_dir = tmp_path / "cli_artifact"
    export_inference(
        vad_model, artifact_dir, buckets=(8, 32), batch_size=8,
        transport="int16",
    )

    live_out = tmp_path / "live"
    run_inference_on_audios(
        config=vad_model.config,
        wavs=synthetic_dataset / "wav",
        checkpoint=None,
        output=live_out,
        uris=synthetic_dataset / "test.txt",
        model=vad_model,
        dump_logits=True,
    )

    art_out = tmp_path / "art"
    predict_main([
        "--artifact", str(artifact_dir),
        "--wavs", str(synthetic_dataset / "wav"),
        "--uris", str(synthetic_dataset / "test.txt"),
        "--output", str(art_out),
        "--save-logits",
    ])
    live_rttms = sorted((live_out / "raw_rttm").glob("*.rttm"))
    assert len(live_rttms) == 5
    for rttm in live_rttms:
        assert (art_out / "raw_rttm" / rttm.name).read_text() == rttm.read_text()
    # --save-logits works for artifacts too (tuner loop without a model
    # zoo): same labels, same values as the live dumps
    live_npz = sorted((live_out / "logits").glob("*.npz"))
    assert len(live_npz) == 5
    for npz in live_npz:
        a, b = np.load(npz), np.load(art_out / "logits" / npz.name)
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-5)


def test_bucket_plan_minimizes_transfer():
    """The dispatch plan minimizes shipped chunks, then dispatch count."""
    from segma_tpu.export import _bucket_plan

    assert _bucket_plan(60, [8, 32, 128, 512]) == [32, 32]  # not padded 128
    assert _bucket_plan(127, [8, 32, 128, 512]) == [128]  # not 32*4
    assert _bucket_plan(88, [8, 32, 128, 512]) == [32, 32, 32]  # not [8]*11
    assert _bucket_plan(3, [2, 4]) == [4]  # equal transfer, 1 dispatch
    assert _bucket_plan(600, [8, 32, 128, 512]) == [512, 32, 32, 32]
    assert _bucket_plan(8, [8, 32]) == [8]
    assert _bucket_plan(1, [8, 32]) == [8]


def test_bucket_plan_dispatch_logits_match_live(vad_model, artifact):
    """A planned multi-dispatch file's logits must match the live pipeline
    exactly (plan [4] for a 3-chunk file with exported buckets (2,4))."""
    rng = np.random.default_rng(6)
    # 45_000 samples -> 140 frames -> 3 chunks needed (buckets: 2 and 4)
    wav = (rng.standard_normal(45_000) * 3000).astype(np.int16)
    live = InferencePipeline(vad_model, vad_model.params, batch_size=4)
    ref = live.logits_for_audio(wav)
    exp = ExportedPipeline.load(artifact)
    calls = []
    orig = {n: f.call for n, f in exp.infer_fns.items()}

    class _Rec:
        def __init__(self, n):
            self.n = n

        def call(self, seg):
            calls.append(self.n)
            return orig[self.n](seg)

    exp.infer_fns = {n: _Rec(n) for n in exp.infer_fns}
    got = exp.logits_for_audio(wav)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert calls == [4]  # one padded dispatch (equal transfer, 1 call)


def test_artifact_cli_rejects_incompatible_flags(tmp_path):
    from segma_tpu.inference import main as predict_main

    with pytest.raises(SystemExit):
        predict_main([
            "--artifact", str(tmp_path), "--wavs", str(tmp_path),
            "--output", str(tmp_path), "--transport", "mulaw",
        ])
    with pytest.raises(SystemExit):
        predict_main([
            "--artifact", str(tmp_path), "--wavs", str(tmp_path),
            "--output", str(tmp_path), "--checkpoint", "some.ckpt",
        ])


def test_whisper_flagship_exports_and_matches_live(tmp_path):
    """The flagship surgical_hydra (whisper encoder + BiLSTM + hydra
    heads) round-trips through a StableHLO artifact: exercises the
    portable (non-Pallas) mel frontend, the transformer encoder and the
    scan-LSTM under jax.export — not just the conv_vad used elsewhere."""
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_hydra",
            "model.config.encoder=missing_tiny",
            "model.config.lstm={hidden_size: 16, num_layers: 1, "
            "bidirectional: true, dropout: 0.0}",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models["surgical_hydra"](enc, cfg)
    from segma_tpu.models.whisper.encoder import WhisperEncoderConfig

    model.module = model.module.clone(
        enc_cfg=WhisperEncoderConfig(d_model=64, n_heads=2, n_layers=2, ffn_dim=128)
    )
    model.init_params(jax.random.key(0))

    out = tmp_path / "whisper_artifact"
    export_inference(model, out, buckets=(2,), batch_size=2, transport="int16")

    rng = np.random.default_rng(7)
    wav = (rng.standard_normal(30_000) * 3000).astype(np.int16)
    live = InferencePipeline(model, model.params, batch_size=2)
    thr = default_thresholds(model.label_encoder.base_labels)
    lg, tf = live.logits_for_audio_async(wav)
    ref = sorted(live.decode_intervals(lg, thr, valid_frames=tf))

    exp = ExportedPipeline.load(out)
    np.testing.assert_allclose(
        exp.logits_for_audio(wav), np.asarray(lg[:tf]), rtol=2e-4, atol=2e-4
    )
    assert exp.segment(wav) == ref


def test_manifest_schema_is_stable(artifact):
    """format_version 1 manifest keys are a deployed contract: adding a
    key is fine only with a version bump reasoning; REMOVING or renaming
    one breaks every artifact already shipped. Update this set together
    with FORMAT_VERSION, never casually."""
    import json

    manifest = json.loads((artifact / "manifest.json").read_text())
    assert set(manifest) == {
        "format_version", "framework_version", "model_name", "labels", "sample_rate",
        "chunk_duration_f", "chunk_stride", "n_windows", "rf_step",
        "strict_frames", "reference_tail", "transport", "buckets",
        "decode_caps", "thresholds", "platforms",
        # provenance + streaming capability (additive, r3): readers must
        # tolerate these being absent in artifacts exported before they
        # existed
        "model_version", "created_at", "streaming", "stream_batches",
        # streaming program dtypes (additive, r4): absent = r3 all-f32
        "stream_int16", "stream_batch_dtype",
    }
    assert manifest["format_version"] == 1


def test_reference_tail_mode_roundtrips_through_artifact(tmp_path):
    """audio.reference_tail=true is carried by the manifest: exported
    logits must match the live pipeline incl. the zero-padded tail chunk."""
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
    model = Models["conv_vad"](enc, cfg)
    model.init_params(jax.random.key(0))

    out = tmp_path / "tail_artifact"
    export_inference(model, out, buckets=(2, 4), batch_size=4, transport="int16")
    exp = ExportedPipeline.load(out)
    assert exp.manifest["reference_tail"] is True

    rng = np.random.default_rng(8)
    # 2 full chunks + a 5000-sample tail -> the tail emits a FULL chunk
    wav = (rng.standard_normal(16_000 + 15_680 + 5_000) * 3000).astype(np.int16)
    live = InferencePipeline(model, model.params, batch_size=4)
    ref = live.logits_for_audio(wav)
    got = exp.logits_for_audio(wav)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_stream_batches_trimmable(vad_model, tmp_path):
    """stream_batches=() ships only the single-chunk stream program —
    encoder-heavy models pay ~one weight copy per program, so the buckets
    must be trimmable at export time."""
    out = tmp_path / "lean"
    export_inference(
        vad_model, out, buckets=(2,), batch_size=2, transport="int16",
        stream_batches=(),
    )
    exp = ExportedPipeline.load(out)
    assert exp.supports_streaming and not exp.stream_batch_fns
    assert exp.manifest["stream_batches"] == []
    assert not list(out.glob("stream_batch*.jaxexp"))
    from segma_tpu.streaming import ChunkForwardBatcher

    with pytest.raises(ValueError, match="re-export"):
        ChunkForwardBatcher.from_exported(exp)
