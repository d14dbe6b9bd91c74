"""A/B the attention core: einsum vs Pallas flash, on the live chip.

Times softmax(qkᵀ)·v alone at the shapes the encoders actually run
(whisper padded S=1500, fast_context/hubert S=199), through a chained
lax.scan (one dispatch; each iteration perturbs q so XLA cannot CSE) with
the result forced by float(out.mean()) — the only reliable way to force
execution through the axon relay (CLAUDE.md).

Usage: python scripts/bench_attention.py [--chain 16] [--repeats 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from segma_tpu.ops.attention import _einsum_core, _flash_bhsd
from segma_tpu.utils.cache import enable_compilation_cache


def _run(core, b, s, h, d, chain, repeats, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d), dtype)
    k = jax.random.normal(kk, (b, s, h, d), dtype)
    v = jax.random.normal(kv, (b, s, h, d), dtype)
    sm = d**-0.5

    @jax.jit
    def chained(q, k, v):
        def body(carry, i):
            qq = q + (carry * 1e-6 + i.astype(dtype) * 1e-6)
            out = core(qq, k, v, sm)
            return out.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(chain, dtype=jnp.int32)
        )
        return acc

    float(chained(q, k, v))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1e3  # ms per iteration


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--seq",
        type=int,
        nargs="*",
        default=[1500, 199],
        help="sequence lengths to time at (32, S, 8, 64)",
    )
    args = ap.parse_args()
    enable_compilation_cache()

    einsum = lambda q, k, v, sm: _einsum_core(q, k, v, sm, jnp.bfloat16)

    def flash(q, k, v, sm):
        out = _flash_bhsd(*(jnp.swapaxes(t, 1, 2) for t in (q, k, v)), sm)
        return jnp.swapaxes(out, 1, 2)

    for tag, (b, s, h, d) in {
        f"(32,{s},8,64)": (32, s, 8, 64) for s in args.seq
    }.items():
        for name, core in [("einsum", einsum), ("flash", flash)]:
            ms = _run(core, b, s, h, d, args.chain, args.repeats)
            # attention FLOPs: QK^T + AV = 4*b*h*s*s*d
            tfps = 4 * b * h * s * s * d / (ms * 1e-3) / 1e12
            print(f"{tag:36s} {name:6s} {ms:8.3f} ms/iter  {tfps:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
