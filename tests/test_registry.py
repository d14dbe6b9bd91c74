"""Model registry completeness (mirrors reference tests/test_models.py:
every registered name must build from its generated config)."""

import pytest

from segma_tpu.models import Models

EXPECTED = {
    "powerset_vad",
    "whisperidou",
    "whisperimax",
    "surgical_whisper",
    "hydra_whisper",
    "surgical_hydra",
    "surgical_hubert_hydra",
    "surgical_wavlm_hydra",
    "conv_vad",
    "sincnet_hydra",
}


def test_registry_names():
    assert set(Models) == EXPECTED


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_per_model_config_yaml_exists(name):
    from pathlib import Path

    cfg_dir = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"
    assert (cfg_dir / f"{name}.yml").exists()
