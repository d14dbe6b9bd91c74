"""One-command REAL-pretrained-weights validation (the standing
environment gap: zero egress means the HF->flax converters have only ever
been validated against full-dimension *random-weight* models,
``tests/test_full_dim_parity.py``).

On a NETWORKED machine this turns the gap into a 10-minute task:

    python scripts/validate_real.py --out /tmp/real_snapshots

For each encoder family (whisper-base / hubert-base / wavlm-base — the
frozen encoders the reference actually loads,
``src/segma/models/whisper/utils.py:9-12``,
``src/segma/models/hubert/utils.py:9-38``):

1. snapshot the real HF weights locally (skipped if the dir exists);
2. convert to the flax parameter tree with the repo converters;
3. assert logit parity vs the HF torch forward at production dims
   (atol + correlation, same bar as the full-dim random-weight tests);
4. wire the real frozen encoder into the matching segmentation model and
   run the actual sliding-window inference pipeline end to end on a
   synthetic file (device logits -> thresholds -> interval decode ->
   RTTM on disk).

Exit 0 = every link of the chain holds with real weights. ``--offline``
skips step 1 and validates snapshots already on disk (any source) — the
mode the dry-run test exercises without network.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# family -> (hf repo id, snapshot fn, parity fn, segmentation model name)
HF_IDS = {
    "whisper": "openai/whisper-base",
    "hubert": "facebook/hubert-base-ls960",
    "wavlm": "microsoft/wavlm-base",
}
SEG_MODEL = {
    "whisper": "surgical_hydra",
    "hubert": "surgical_hubert_hydra",
    "wavlm": "surgical_wavlm_hydra",
}


def snapshot(family: str, out: Path) -> Path:
    """Download the real weights and save a converter-ready local dir."""
    out.mkdir(parents=True, exist_ok=True)
    if family == "whisper":
        from transformers import WhisperModel

        # encoder-only, like scripts/save_load_whisper.py (the reference's
        # snapshot layout, scripts/save_load_whisper.py:6-49)
        WhisperModel.from_pretrained(HF_IDS[family]).encoder.save_pretrained(
            out
        )
    elif family == "hubert":
        from transformers import HubertModel

        HubertModel.from_pretrained(HF_IDS[family]).save_pretrained(out)
    else:
        from transformers import WavLMModel

        WavLMModel.from_pretrained(HF_IDS[family]).save_pretrained(out)
    print(f"[validate_real] snapshot {HF_IDS[family]} -> {out}")
    return out


def _assert_close(got: np.ndarray, ref: np.ndarray, atol: float) -> None:
    """Same bar as tests/test_full_dim_parity.py: elementwise atol plus a
    correlation check (a head-permuting converter can pass loose atol on
    small activations)."""
    np.testing.assert_allclose(got, ref, atol=atol)
    corr = float(np.corrcoef(got.ravel(), ref.ravel())[0, 1])
    assert corr > 0.999999, f"correlation {corr}"


def check_parity(family: str, snap: Path) -> dict:
    """Converted-flax vs HF-torch logit parity on the real weights."""
    import jax.numpy as jnp
    import torch

    rng = np.random.default_rng(2026)
    if family == "whisper":
        from transformers.models.whisper.modeling_whisper import (
            WhisperEncoder as HFEnc,
        )

        from segma_tpu.models.whisper.convert import convert_encoder_params
        from segma_tpu.models.whisper.encoder import WhisperEncoder

        enc_cfg, params = convert_encoder_params(snap)
        hf = HFEnc.from_pretrained(snap, local_files_only=True).eval()
        mel = rng.standard_normal((1, enc_cfg.n_mels, 3000)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = hf(torch.from_numpy(mel)).last_hidden_state.numpy()
        got = np.asarray(
            WhisperEncoder(enc_cfg, dtype=jnp.float32).apply(
                {"params": params}, jnp.asarray(mel)
            )[0]
        )
    else:
        wav = (rng.standard_normal((1, 16_000)) * 0.1).astype(np.float32)
        if family == "hubert":
            from transformers import HubertModel

            from segma_tpu.models.hubert.convert import convert_hubert_params
            from segma_tpu.models.hubert.encoder import (
                FeatureExtractor,
                HubertTransformer,
            )

            cfg, fe, tr = convert_hubert_params(snap)
            hf = HubertModel.from_pretrained(
                snap, local_files_only=True
            ).eval()
            feat_cls, tr_cls = FeatureExtractor, HubertTransformer
        else:
            from transformers import WavLMModel

            from segma_tpu.models.wavlm.convert import convert_wavlm_params
            from segma_tpu.models.wavlm.encoder import (
                FeatureExtractor,
                WavLMTransformer,
            )

            cfg, fe, tr = convert_wavlm_params(snap)
            hf = WavLMModel.from_pretrained(
                snap, local_files_only=True
            ).eval()
            feat_cls, tr_cls = FeatureExtractor, WavLMTransformer
        with torch.no_grad():
            ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
        feats = feat_cls(cfg, dtype=jnp.float32).apply(
            {"params": fe}, jnp.asarray(wav)
        )
        got = np.asarray(
            tr_cls(cfg, dtype=jnp.float32).apply({"params": tr}, feats)[0]
        )
    _assert_close(got, ref, atol=2e-3)
    err = float(np.abs(got - ref).max())
    print(
        f"[validate_real] {family}: flax/torch parity OK "
        f"(shape {got.shape}, max |err| {err:.2e})"
    )
    return {"family": family, "max_abs_err": err, "shape": list(got.shape)}


def run_pipeline(family: str, snap: Path, workdir: Path) -> int:
    """Wire the real frozen encoder into the matching segmentation model
    and drive the ACTUAL inference pipeline: sliding-window device logits
    -> thresholds -> packed-RLE interval decode -> RTTM on disk."""
    from scripts.generate_data import gen_classification

    from segma_tpu.config import load_config
    from segma_tpu.inference import run_inference_on_audios
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    ds = workdir / "ds"
    gen_classification(output=ds, per_split=1, seed=11, audio_duration_s=8.0)
    cfg = load_config(
        Path(__file__).resolve().parent.parent
        / "segma_tpu/config/default.yml",
        [
            f"model.name={SEG_MODEL[family]}",
            f"model.config={{encoder: {snap}}}",
            f"data.dataset_path={ds}",
            "data.classes=[male,female,key_child,other_child]",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models[SEG_MODEL[family]](enc, cfg)
    assert model.pretrained_loader is not None, (
        f"{SEG_MODEL[family]} did not detect the snapshot at {snap} — the "
        "frozen encoder would be random"
    )
    import jax

    # init_params grafts the pretrained encoder in via pretrained_loader
    model.init_params(jax.random.key(0))
    out = workdir / f"out_{family}"
    written = run_inference_on_audios(
        config=cfg,
        wavs=ds / "wav",
        checkpoint=None,
        output=out,
        model=model,
        batch_size=16,
    )
    rttms = list((out / "raw_rttm").glob("*.rttm"))
    assert rttms, f"pipeline produced no RTTM files under {out}"
    print(
        f"[validate_real] {family}: pipeline OK — {len(written)} file(s), "
        f"RTTM at {rttms[0]}"
    )
    return len(rttms)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument(
        "--out",
        type=Path,
        default=Path("real_snapshots"),
        help="snapshot root; <out>/<family>_base per family",
    )
    ap.add_argument(
        "--families",
        nargs="+",
        default=list(HF_IDS),
        choices=list(HF_IDS),
    )
    ap.add_argument(
        "--offline",
        action="store_true",
        help="never download: validate snapshots already under --out",
    )
    ap.add_argument(
        "--skip-pipeline",
        action="store_true",
        help="parity check only (no inference-pipeline smoke)",
    )
    args = ap.parse_args(argv)

    from segma_tpu.utils.cache import enable_compilation_cache

    # production-dim graphs compile for minutes through the remote tunnel;
    # the persistent cache makes reruns instant
    enable_compilation_cache()

    results = []
    for family in args.families:
        snap = args.out / f"{family}_base"
        if not (snap / "config.json").exists():
            if args.offline:
                raise FileNotFoundError(
                    f"--offline but no snapshot at {snap} (need config.json "
                    "+ weights)"
                )
            snapshot(family, snap)
        results.append(check_parity(family, snap))
        if not args.skip_pipeline:
            with tempfile.TemporaryDirectory() as td:
                run_pipeline(family, snap, Path(td))
    print(
        "[validate_real] ALL OK: "
        + ", ".join(
            f"{r['family']} max|err|={r['max_abs_err']:.2e}" for r in results
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
