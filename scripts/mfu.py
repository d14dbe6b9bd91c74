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
  A NULL BASELINE (an identity fn through the same harness) is subtracted:
  the chained wall still carries dispatch/chain + the per-iteration
  perturb-add and output-mean (~1.5 ms at chain 16 in a fast window —
  3.5x conv_vad's actual 0.6 ms forward). ``*_raw`` fields keep the
  uncorrected values.

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
    # Null-baseline: the chained wall includes a floor that is NOT the
    # model — the dispatch round-trip amortized over `chain` plus the
    # per-iteration perturb-add and output-mean (~1.5 ms at chain 16 in a
    # fast window; measured 3.5x of conv_vad's actual forward). An
    # identity fn through the SAME harness measures exactly that floor;
    # subtract it. Raw (uncorrected) values stay in the row.
    null_ms = _time_chained(lambda p, xx: xx, params, x, chain, rounds)
    ms_raw = best / chain * 1e3
    ms_fwd = max(0.0, ms_raw - null_ms)
    tflops = flops_fwd / (ms_fwd / 1e3) / 1e12 if ms_fwd else 0.0
    out.update(
        device_ms_per_forward=round(ms_fwd, 3),
        device_ms_per_forward_raw=round(ms_raw, 3),
        harness_floor_ms=round(null_ms, 3),
        achieved_tflops=round(tflops, 2),
        xrt_device_only=round(out["audio_s_per_forward"] / (ms_fwd / 1e3), 0)
        if ms_fwd
        else None,
        walls_s=[round(w, 3) for w in walls],
        chain=chain,
    )
    return out


def _mean_all(out: Any) -> Any:
    import jax
    import jax.numpy as jnp

    return sum(
        jnp.asarray(v).astype(jnp.float32).mean() for v in jax.tree.leaves(out)
    )


def _time_chained(
    fn: Any, params: Any, x: Any, chain: int, rounds: int
) -> float:
    """Best-of-``rounds`` device ms for ONE application of ``fn(params, x)``,
    measured as ``chain`` applications inside a single dispatch (same
    loop-variant-input trick as ``analyze_one`` — the scan body perturbs the
    input by ``i * 1e-6`` so XLA cannot hoist the computation out of the
    loop)."""
    import jax
    import jax.numpy as jnp

    def chained(p: Any, xx: jnp.ndarray) -> jnp.ndarray:
        def body(carry: jnp.ndarray, i: jnp.ndarray) -> tuple[jnp.ndarray, None]:
            out = fn(p, xx + (i.astype(jnp.float32) * 1e-6).astype(xx.dtype))
            return carry + _mean_all(out), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(chain))
        return tot

    run = jax.jit(chained)
    float(run(params, x))  # compile + warm
    walls = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(run(params, x))  # float() forces execution through the relay
        walls.append(time.perf_counter() - t0)
    return min(walls) / chain * 1e3


def segment_plan(
    name: str, model: Any, wav: Any
) -> list[tuple[str, Any, Any]]:
    """Ordered ``(segment, fn(params, x), input)`` triples whose composition
    is the model forward — each is timed separately by ``--segments``.
    Inputs are computed once (un-timed) by chaining the stages; ``params`` is
    the model's full top-level tree so closures stay weight-free."""
    import jax
    import jax.numpy as jnp

    if name not in CONFIGS:
        raise ValueError(f"no segment plan for {name!r}")
    module = model.module
    dtype = module.dtype
    plan: list[tuple[str, Any, Any]] = []

    if name == "conv_vad":
        from segma_tpu.ops.melspec import log_mel_spectrogram

        # the module is one fused compact body; time the mel frontend alone
        # and let the report's "other" row carry the conv stack + heads
        plan.append(("log_mel", lambda p, w: log_mel_spectrogram(w), wav))
        return plan

    if name in ("whisper_padded", "whisper_fast"):
        from segma_tpu.models.layers import BiLSTM, HydraHeads, LayerWeightedSum
        from segma_tpu.models.whisper.encoder import WhisperEncoder
        from segma_tpu.ops.melspec import (
            log_mel_spectrogram,
            whisper_input_features,
        )

        if module.fast_context:

            def mel_fn(p: Any, w: jnp.ndarray) -> jnp.ndarray:
                return jnp.swapaxes(log_mel_spectrogram(w), 1, 2)

        else:

            def mel_fn(p: Any, w: jnp.ndarray) -> jnp.ndarray:
                return whisper_input_features(w)

        enc = WhisperEncoder(module.enc_cfg, dtype)

        def enc_fn(p: Any, feats: jnp.ndarray) -> Any:
            return enc.apply({"params": p["encoder"]}, feats, output_hidden_states=True)

        feats = jax.jit(mel_fn)(model.params, wav)
        _, hidden = jax.jit(enc_fn)(model.params, feats)
        n_layers = module.enc_cfg.n_layers
        mix = LayerWeightedSum(n_layers=n_layers, reduction=module.reduction)
        stacked = jnp.stack(hidden[1:], axis=0)

        def mix_fn(p: Any, s: jnp.ndarray) -> jnp.ndarray:
            return mix.apply({"params": p["layer_mix"]}, s)

        x = jax.jit(mix_fn)(model.params, stacked)
        lstm = BiLSTM(module.lstm, dtype=dtype)
        keep = module.n_windows

        def lstm_fn(p: Any, xx: jnp.ndarray) -> jnp.ndarray:
            return lstm.apply({"params": p["lstm_shared"]}, xx, keep=keep)

        lstm_out = jax.jit(lstm_fn)(model.params, x)
        heads = HydraHeads(module.n_labels)

        def head_fn(p: Any, h: jnp.ndarray) -> jnp.ndarray:
            return heads.apply({"params": p["heads"]}, h)

        plan.append(("mel_frontend", mel_fn, wav))
        plan.append(("encoder", enc_fn, feats))
        plan.append(("layer_mix", mix_fn, stacked))
        plan.append(("bilstm", lstm_fn, x))
        plan.append(("heads", head_fn, lstm_out))
        return plan

    if name in ("hubert", "wavlm"):
        from segma_tpu.models.hubert.encoder import FeatureExtractor
        from segma_tpu.models.layers import HydraHeads, LayerWeightedSum

        fe = FeatureExtractor(module.enc_cfg, dtype)

        def fe_fn(p: Any, w: jnp.ndarray) -> jnp.ndarray:
            return fe.apply({"params": p["feature_extractor"]}, w)

        if name == "hubert":
            from segma_tpu.models.hubert.encoder import HubertTransformer

            tr = HubertTransformer(module.enc_cfg, dtype)
        else:
            from segma_tpu.models.wavlm.encoder import WavLMTransformer

            tr = WavLMTransformer(module.enc_cfg, dtype)

        def tr_fn(p: Any, feats: jnp.ndarray) -> Any:
            return tr.apply({"params": p["encoder"]}, feats, output_hidden_states=True)

        feats = jax.jit(fe_fn)(model.params, wav)
        _, hidden = jax.jit(tr_fn)(model.params, feats)
        stacked = jnp.stack(hidden[1:], axis=0)
        mix = LayerWeightedSum(
            n_layers=module.enc_cfg.n_layers, reduction=module.reduction
        )
        heads = HydraHeads(module.n_labels)

        def head_fn(p: Any, s: jnp.ndarray) -> jnp.ndarray:
            return heads.apply(
                {"params": p["heads"]}, mix.apply({"params": p["layer_mix"]}, s)
            )

        plan.append(("conv_frontend", fe_fn, wav))
        plan.append(("transformer", tr_fn, feats))
        plan.append(("layer_mix+heads", head_fn, stacked))
        return plan

    raise ValueError(f"no segment plan for {name!r}")


def analyze_segments_one(
    name: str,
    batch_size: int,
    chain: int,
    rounds: int,
    extra: list[str] | None = None,
) -> dict[str, Any]:
    """Per-stage device timing (``--segments``): where does the forward's
    time actually go? Each stage is timed with the same chained-scan harness
    as the full forward; "other_ms" is full minus the stages (fusion
    boundaries, casts, slicing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    model = build_model(name, extra)
    chunk_f = model.config.audio.chunk_duration_f
    rng = np.random.default_rng(0)
    wav = jax.device_put(
        (rng.standard_normal((batch_size, chunk_f)) * 0.1).astype(np.float32)
    )
    params = jax.device_put(model.params)

    def full_fn(p: Any, w: jnp.ndarray) -> jnp.ndarray:
        return model.apply(p, w, train=False)

    def identity(p: Any, x: Any) -> Any:
        return x

    # Every chained measurement carries a floor that is NOT the stage's
    # compute: the dispatch round-trip amortized over `chain` iterations
    # plus the harness's per-iteration perturb-add and output-mean. Small
    # stages (a 0.1 ms head) would otherwise read as ~the floor (~1.4 ms in
    # a fast window). Time an IDENTITY fn on the same input per stage and
    # subtract — raw values are kept alongside.
    full_raw = _time_chained(full_fn, params, wav, chain, rounds)
    full_null = _time_chained(identity, params, wav, chain, rounds)
    full_ms = max(0.0, full_raw - full_null)
    raw: dict[str, float] = {}
    segs: dict[str, float] = {}
    for seg_name, fn, x in segment_plan(name, model, wav):
        t = _time_chained(fn, params, x, chain, rounds)
        null = _time_chained(identity, params, x, chain, rounds)
        raw[seg_name] = round(t, 3)
        segs[seg_name] = round(max(0.0, t - null), 3)
    other = full_ms - sum(segs.values())
    return {
        "model": name,
        "mode": "segments",
        "batch": batch_size,
        "chain": chain,
        "full_ms": round(full_ms, 3),
        "full_raw_ms": round(full_raw, 3),
        "segments_ms": segs,
        "segments_raw_ms": raw,
        "other_ms": round(other, 3),
        "backend": jax.devices()[0].platform,
    }


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

    # Null-baseline (see analyze_one): same scan shape — per-iteration
    # input perturb + key split, params read once at the end — with the
    # train step itself removed; measures the dispatch round-trip / chain
    # plus the harness's per-iteration work, which is NOT the step's cost.
    def null_chained(
        p: Any, o: Any, x: jnp.ndarray, y: jnp.ndarray
    ) -> jnp.ndarray:
        def body(
            carry: tuple[jnp.ndarray, Any], i: jnp.ndarray
        ) -> tuple[tuple[jnp.ndarray, Any], None]:
            acc, key = carry
            key, _ = jax.random.split(key)
            acc = acc + (x + i.astype(jnp.float32) * 1e-6).mean()
            return (acc, key), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.float32(0), jax.random.key(0)), jnp.arange(chain)
        )
        return acc + sum(jnp.asarray(v).mean() for v in jax.tree.leaves(p))

    run = jax.jit(chained)
    null_run = jax.jit(null_chained)
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
    float(null_run(params, opt, x, y))
    walls = []
    nulls = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(run(params, opt, x, y))
        walls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(null_run(params, opt, x, y))
        nulls.append(time.perf_counter() - t0)
    best = min(walls)
    null_ms = min(nulls) / chain * 1e3
    ms_raw = best / chain * 1e3
    ms_step = max(0.0, ms_raw - null_ms)
    tflops = flops_step / (ms_step / 1e3) / 1e12 if ms_step else 0.0
    out.update(
        device_ms_per_step=round(ms_step, 3),
        device_ms_per_step_raw=round(ms_raw, 3),
        harness_floor_ms=round(null_ms, 3),
        achieved_tflops=round(tflops, 2),
        xrt_device_only=round(out["audio_s_per_step"] / (ms_step / 1e3), 0)
        if ms_step
        else None,
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
        "--segments",
        action="store_true",
        help="per-stage device timing (frontend / transformer / lstm / "
        "heads) instead of the whole-forward MFU — implies --measure",
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

    if not args.measure and not args.segments:
        # FLOPs analysis needs no accelerator; force the local CPU so this
        # mode never touches (or waits on) the TPU tunnel
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()

    rows = []
    if args.segments:
        for name in args.models:
            row = analyze_segments_one(
                name, args.batch_size, args.chain, args.rounds, extra=args.extra
            )
            if args.extra:
                row["extra"] = args.extra
            print(json.dumps(row), flush=True)
            rows.append(row)
        if args.json:
            args.json.write_text(json.dumps(rows, indent=1))
        return 0

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
