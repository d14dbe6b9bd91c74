"""MFU / %-of-peak accounting for the model zoo (BENCH_REPORT.md column).

xRT says "faster than the task needs"; MFU says "using the silicon well".
This script reports both ingredients:

- **FLOPs per forward** from XLA's cost analysis of the ACTUAL compiled
  program (``compiled.cost_analysis()["flops"]``) — robust across models
  and counts the fused graph instead of a hand-derived formula that drifts
  from the code.
- **device-only ms per forward** from a scan-chained forward: ``--chain N``
  iterations run inside ONE dispatch (each iteration's input is perturbed
  by ``i * 1e-6`` to defeat CSE), so the ~80 ms relay dispatch latency of
  this environment amortizes to noise and ``jax.block_until_ready``'s
  unreliability through the relay is bypassed by forcing a scalar output.

MFU = achieved FLOP/s / peak. Peak defaults to TPU v5e bf16 (197 TFLOP/s
per chip); override with ``--peak-tflops`` for other chips.

Usage:
  python scripts/mfu.py                    # FLOPs only, local CPU (fast)
  python scripts/mfu.py --measure          # + device timing on the chip
  python scripts/mfu.py --json mfu.json    # machine-readable output
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import warnings
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.utils.cache import enable_compilation_cache

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"

# same model matrix as scripts/bench_backbones.py
CONFIGS = {
    "conv_vad": ["model.name=conv_vad"],
    "whisper_padded": [
        "model.name=surgical_hydra",
        "model.config.encoder=whisper_base_random",
    ],
    # opt-in fast_context: encoder runs on the chunk's 200 mel frames
    # instead of Whisper's fixed 30 s padding — quantifies exactly what the
    # reference-faithful padding costs in device time and MFU
    "whisper_fast": [
        "model.name=surgical_hydra",
        "model.config.encoder=whisper_base_random",
        "model.config.fast_context=true",
    ],
    "hubert": [
        "model.name=surgical_hubert_hydra",
        "model.config.wav_encoder=hubert_base_random",
        "audio.strict_frames=true",
    ],
    "wavlm": [
        "model.name=surgical_wavlm_hydra",
        "model.config.wav_encoder=wavlm_base_random",
        "audio.strict_frames=true",
    ],
}

V5E_PEAK_BF16_TFLOPS = 197.0  # per chip (v5e: 394 int8 TOPS / 197 bf16)


def build_model(name: str, extra: list[str] | None = None) -> Any:
    from segma_tpu.config import load_config
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    cfg = load_config(CONFIG_DIR / "default.yml", CONFIGS[name] + (extra or []))
    enc = MultiLabelEncoder(cfg.data.classes)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-weights warning expected
        model = Models[cfg.model.name](enc, cfg)
    import jax

    model.init_params(jax.random.key(0))
    return model


def analyze_one(
    name: str,
    batch_size: int,
    chain: int,
    measure: bool,
    rounds: int,
    extra: list[str] | None = None,
) -> dict[str, Any]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    model = build_model(name, extra)
    chunk_f = model.config.audio.chunk_duration_f
    shaped = jax.ShapeDtypeStruct((batch_size, chunk_f), jnp.float32)

    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    t0 = time.perf_counter()
    compiled = fwd.lower(model.params, shaped).compile()
    compile_s = time.perf_counter() - t0
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict] per device program
        cost = cost[0]
    flops_fwd = float(cost.get("flops", 0.0))
    out: dict[str, Any] = {
        "model": name,
        "batch": batch_size,
        "chunk_f": chunk_f,
        "gflops_per_forward": round(flops_fwd / 1e9, 2),
        "audio_s_per_forward": batch_size * chunk_f / 16_000,
        "compile_s": round(compile_s, 1),
        "backend": jax.devices()[0].platform,
    }
    if not measure:
        return out

    # device-only timing: `chain` forwards inside one dispatch
    def chained(p: Any, x: jnp.ndarray) -> jnp.ndarray:
        def body(carry: jnp.ndarray, i: jnp.ndarray) -> tuple[jnp.ndarray, None]:
            logits = model.apply(
                p, x + i.astype(jnp.float32) * 1e-6, train=False
            )
            return carry + jnp.asarray(logits).mean(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(chain))
        return tot

    run = jax.jit(chained)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        (rng.standard_normal((batch_size, chunk_f)) * 0.1).astype(np.float32)
    )
    params = jax.device_put(model.params)
    float(run(params, x))  # compile + warm
    walls = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(run(params, x))  # the float() forces real execution (CLAUDE.md)
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    ms_fwd = best / chain * 1e3
    tflops = flops_fwd * chain / best / 1e12
    out.update(
        device_ms_per_forward=round(ms_fwd, 2),
        achieved_tflops=round(tflops, 2),
        xrt_device_only=round(out["audio_s_per_forward"] / (ms_fwd / 1e3), 0),
        walls_s=[round(w, 3) for w in walls],
        chain=chain,
    )
    return out


def analyze_train_one(
    name: str,
    batch_size: int,
    chain: int,
    measure: bool,
    rounds: int,
    extra: list[str] | None = None,
) -> dict[str, Any]:
    """FLOPs + device time for the FULL train step (forward + loss +
    backward + optimizer update) — the number the train-loop rows in
    BENCH_REPORT.md should be judged against, not the forward-only MFU.

    Timing scans ``chain`` steps in one dispatch with (params, opt_state)
    carried through — the same shape as ``train.dispatch=epoch``'s
    whole-epoch scan, so the measured ms/step is exactly what that mode
    achieves per batch on device."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from segma_tpu.train import make_optimizer, make_train_step

    model = build_model(name, extra)
    chunk_f = model.config.audio.chunk_duration_f
    x_shape = jax.ShapeDtypeStruct((batch_size, chunk_f), jnp.float32)
    # logit grid from the model itself (199 rows per 4 s chunk for the
    # standard geometry; hubert/wavlm strict frames differ)
    logits_shape = jax.eval_shape(
        lambda p, x: model.apply(p, x, train=False), model.params, x_shape
    )
    y_shape = jax.ShapeDtypeStruct(
        (batch_size, logits_shape.shape[1], len(model.label_encoder.base_labels)),
        jnp.float32,
    )

    optimizer = make_optimizer(model, 1e-3)
    train_step = make_train_step(model, optimizer)
    opt_state = jax.eval_shape(optimizer.init, model.params)
    t0 = time.perf_counter()
    compiled = train_step.lower(
        model.params, opt_state, {"x": x_shape, "y": y_shape}, jax.random.key(0)
    ).compile()
    compile_s = time.perf_counter() - t0
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops_step = float(cost.get("flops", 0.0))
    out: dict[str, Any] = {
        "model": name,
        "mode": "train_step",
        "batch": batch_size,
        "gflops_per_step": round(flops_step / 1e9, 2),
        "audio_s_per_step": batch_size * chunk_f / 16_000,
        "compile_s": round(compile_s, 1),
        "backend": jax.devices()[0].platform,
    }
    if not measure:
        return out

    def chained(p: Any, o: Any, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        def body(carry: Any, i: jnp.ndarray) -> tuple[Any, None]:
            params, opt_state, key = carry
            key, sub = jax.random.split(key)

            def loss_fn(pp: Any) -> Any:
                logits = model.apply(
                    pp,
                    x + i.astype(jnp.float32) * 1e-6,
                    train=True,
                    rngs={"dropout": sub},
                )
                total, _ = model.loss(logits, y)
                return total

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), None

        (params, _, _), _ = jax.lax.scan(
            body, (p, o, jax.random.key(0)), jnp.arange(chain)
        )
        # force a data dependency on the whole chain (CLAUDE.md: blocking
        # alone under-reports through the relay)
        return sum(jnp.asarray(v).mean() for v in jax.tree.leaves(params))

    run = jax.jit(chained)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        (rng.standard_normal((batch_size, chunk_f)) * 0.1).astype(np.float32)
    )
    y = jax.device_put(
        (rng.random((batch_size,) + y_shape.shape[1:]) > 0.5).astype(np.float32)
    )
    params = jax.device_put(model.params)
    opt = jax.jit(optimizer.init)(params)
    float(run(params, opt, x, y))  # compile + warm
    walls = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(run(params, opt, x, y))
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    ms_step = best / chain * 1e3
    tflops = flops_step * chain / best / 1e12
    out.update(
        device_ms_per_step=round(ms_step, 2),
        achieved_tflops=round(tflops, 2),
        xrt_device_only=round(out["audio_s_per_step"] / (ms_step / 1e3), 0),
        walls_s=[round(w, 3) for w in walls],
        chain=chain,
    )
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--models", nargs="*", default=list(CONFIGS), choices=list(CONFIGS)
    )
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--chain", type=int, default=16)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--measure", action="store_true")
    parser.add_argument(
        "--train",
        action="store_true",
        help="analyze the full train step (fwd+bwd+update) instead of the "
        "inference forward",
    )
    parser.add_argument(
        "--extra",
        nargs="*",
        default=[],
        help="extra config dotlist overrides appended to every model, e.g. "
        "model.config.lstm.unroll=8 (for A/B measurements)",
    )
    parser.add_argument("--peak-tflops", type=float, default=V5E_PEAK_BF16_TFLOPS)
    parser.add_argument("--json", type=Path, default=None)
    args = parser.parse_args()

    if not args.measure:
        # FLOPs analysis needs no accelerator; force the local CPU so this
        # mode never touches (or waits on) the TPU tunnel
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()

    rows = []
    analyze = analyze_train_one if args.train else analyze_one
    for name in args.models:
        row = analyze(
            name,
            args.batch_size,
            args.chain,
            args.measure,
            args.rounds,
            extra=args.extra,
        )
        if args.extra:
            row["extra"] = args.extra
        if args.measure:
            row["mfu_pct"] = round(
                100.0 * row["achieved_tflops"] / args.peak_tflops, 2
            )
            row["peak_tflops"] = args.peak_tflops
        print(json.dumps(row), flush=True)
        rows.append(row)
    if args.json:
        args.json.write_text(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
