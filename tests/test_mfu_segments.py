"""The ``scripts/mfu.py --segments`` plan must COMPOSE to the model forward.

The per-stage timing mode re-instantiates each stage (mel / encoder /
layer-mix / lstm / heads) outside the model module and chains them; if the
model structure drifts (a renamed param collection, a new stage, a changed
truncation point) the plan would silently time the wrong program. These
tests pin the contract: applying the LAST stage of ``segment_plan`` to its
prepared input reproduces ``model.apply`` on the same waveform.

Models run at f32 (``train.precision=f32``) so the only divergence between
the staged and fused programs is jit-boundary fusion noise (~1e-6)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import mfu  # noqa: E402


def _compose_and_compare(name: str, extra: list[str], atol: float) -> None:
    import jax

    model = mfu.build_model(name, extra)
    chunk_f = model.config.audio.chunk_duration_f
    rng = np.random.default_rng(0)
    wav = jax.device_put(
        (rng.standard_normal((1, chunk_f)) * 0.1).astype(np.float32)
    )
    plan = mfu.segment_plan(name, model, wav)
    assert plan, f"empty segment plan for {name}"

    full = np.asarray(model.apply(model.params, wav, train=False))
    seg_name, fn, x = plan[-1]
    staged = np.asarray(fn(model.params, x), dtype=np.float32)
    # the plan's last stage may return the pre-truncation grid; the model
    # output is its prefix
    staged = staged[:, : full.shape[1], :]
    assert staged.shape == full.shape, (name, seg_name, staged.shape, full.shape)
    np.testing.assert_allclose(staged, full, atol=atol, rtol=0)


@pytest.mark.parametrize("name", ["whisper_padded", "whisper_fast"])
def test_whisper_plan_composes(name: str) -> None:
    _compose_and_compare(
        name,
        ["model.config.encoder=whisper_tiny_random", "train.precision=f32"],
        atol=1e-4,
    )


def test_hubert_plan_composes() -> None:
    # no tiny hubert config exists (snapshot-less builds are base dims);
    # batch 1 keeps this affordable and test_full_dim_parity already pays
    # this model-size class on CPU
    _compose_and_compare("hubert", ["train.precision=f32"], atol=1e-4)


def test_conv_vad_plan_runs() -> None:
    import jax

    model = mfu.build_model("conv_vad", ["train.precision=f32"])
    chunk_f = model.config.audio.chunk_duration_f
    rng = np.random.default_rng(0)
    wav = jax.device_put(
        (rng.standard_normal((1, chunk_f)) * 0.1).astype(np.float32)
    )
    # conv_vad's plan times only the mel frontend (the fused compact body
    # carries the rest as "other"); pin that it runs and is finite
    plan = mfu.segment_plan("conv_vad", model, wav)
    (seg_name, fn, x) = plan[0]
    out = np.asarray(fn(model.params, x))
    assert seg_name == "log_mel" and np.isfinite(out).all()


def test_unknown_model_rejected() -> None:
    with pytest.raises(ValueError, match="no segment plan"):
        mfu.segment_plan("nope", None, None)
