"""Determinism: same seed -> bit-identical training trajectory (the TPU
analog of the reference's torch.use_deterministic_algorithms switch)."""

from pathlib import Path

import jax
import numpy as np

from segma_tpu.config import load_config
from segma_tpu.models import Models
from segma_tpu.train import make_optimizer, make_train_step
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


def _run(seed: int, steps: int = 3) -> list[float]:
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=conv_vad",
            "model.config={hidden: 16, depth: 1, dtype: f32}",
            "audio.chunk_duration_s=1.0",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    params = model.init_params(jax.random.key(seed))
    optimizer = make_optimizer(model, 1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)

    rng = np.random.default_rng(seed)
    losses = []
    key = jax.random.key(seed)
    for _ in range(steps):
        batch = {
            "x": rng.standard_normal((2, 16_000)).astype(np.float32),
            "y": (rng.random((2, 49, 4)) > 0.7).astype(np.float32),
        }
        key, sub = jax.random.split(key)
        params, opt_state, loss, _ = step(params, opt_state, batch, sub)
        losses.append(float(loss))
    return losses


def test_same_seed_same_trajectory():
    assert _run(0) == _run(0)


def test_different_seed_differs():
    assert _run(0) != _run(1)


def test_debug_nans_config_flag():
    cfg = load_config(CONFIG_DIR / "default.yml", ["train.debug_nans=true"])
    assert cfg.train.debug_nans is True
