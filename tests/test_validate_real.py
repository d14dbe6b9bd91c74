"""Dry-run of ``scripts/validate_real.py`` — the real-weights validation
runbook — against a mocked (random-weight, tiny-dims) local snapshot, so
the whole chain (snapshot discovery -> converter -> torch/flax parity ->
real inference pipeline) is exercised without network. On a networked
machine the same command validates the actual pretrained weights
(round-4 VERDICT item 5)."""

from pathlib import Path

import pytest

torch = pytest.importorskip("torch")


def _tiny_whisper_snapshot(out: Path) -> Path:
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import (
        WhisperEncoder as HFEnc,
    )

    cfg = WhisperConfig(
        d_model=64,
        encoder_attention_heads=2,
        encoder_layers=2,
        encoder_ffn_dim=128,
        decoder_attention_heads=2,
        decoder_layers=1,
        decoder_ffn_dim=128,
        num_mel_bins=80,
        max_source_positions=1500,
    )
    torch.manual_seed(7)
    HFEnc(cfg).eval().save_pretrained(out)
    return out


def test_offline_dry_run_whisper(tmp_path):
    """--offline against a local snapshot runs parity + the full inference
    pipeline and exits 0."""
    from scripts.validate_real import main

    _tiny_whisper_snapshot(tmp_path / "whisper_base")
    rc = main(
        ["--out", str(tmp_path), "--families", "whisper", "--offline"]
    )
    assert rc == 0


def test_offline_missing_snapshot_is_a_named_error(tmp_path):
    """--offline with nothing on disk must fail loudly (never silently
    download)."""
    from scripts.validate_real import main

    with pytest.raises(FileNotFoundError, match="whisper_base"):
        main(["--out", str(tmp_path), "--families", "whisper", "--offline"])
