"""Fused multi-head self-attention core (Pallas flash attention on TPU).

The einsum attention formulation materializes the ``(B, H, Sq, Skv)`` f32
score tensor in HBM. At Whisper's padded 30 s context (B 32, H 8, S 1500)
that is ~2.3 GB of score traffic per encoder layer — the measured reason
the padded flagship forward runs at ~19% MFU while hubert/wavlm (S≈199)
run at ~38% (BENCH_REPORT.md per-stage table: encoder = 92% of the padded
forward). The flash kernel (``jax.experimental.pallas.ops.tpu.
flash_attention``) keeps score tiles in VMEM with an online softmax, so
attention becomes MXU-bound instead of HBM-bound.

This module wraps the kernel behind the same backend gating pattern as
``ops.pallas_melspec`` (TPU/axon only, ``SEGMA_TPU_NO_PALLAS`` kill
switch) and handles what the kernel itself does not:

- sequence lengths that are not a multiple of the 128-lane block (Whisper's
  1500): inputs are padded up and the padding is masked out via
  ``SegmentIds`` (real tokens id 1, pads id 0 — pad queries attend only pad
  keys, so no row is fully masked, and their rows are sliced away);
- short contexts: the kernel only engages at ``seq_len >= _MIN_FLASH_SEQ``
  — on v5e the einsum path measures FASTER below the crossover (the
  199-frame fast_context/hubert/wavlm operating points; table below), so
  the gate is measured, not assumed;
- the encoders' ``(B, S, H, D)`` head-split layout (kernel wants BHSD);
- multi-device meshes: a data-axis-only mesh runs the kernel per-shard via
  ``shard_map`` (attention is purely batch-parallel); any mesh that shards
  heads/sequence (tp/sp) falls back to the einsum path, where XLA owns the
  collectives.

Numerics: online softmax accumulates in f32, like the einsum path's f32
``preferred_element_type`` scores — bit-close but not bit-identical;
parity is pinned in ``tests/test_ops_attention.py`` (kernel vs einsum in
Pallas interpret mode) and the encoder-level HF-torch parity suites are
unchanged because the einsum path remains the non-TPU default.

Reference context: the reference runs this attention inside the frozen HF
``WhisperEncoder`` (``src/segma/models/whisper/utils.py:7-12``); our flax
port is ``segma_tpu/models/whisper/encoder.py``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

_LANE = 128  # Pallas TPU flash kernel MIN_BLOCK_SIZE / lane width

# Measured crossover on the live v5e chip (scripts/bench_attention.py,
# chain-16 scan, bf16, (32, S, 8, 64)): einsum wins at short context
# where the score tensor is small enough for XLA's fusion to keep in
# check, flash wins once score traffic dominates —
#   S=199:  einsum 1.60 ms, flash 1.73 ms   (einsum 1.08x)
#   S=384:  einsum 1.99 ms, flash 1.91 ms   (~even)
#   S=512:  einsum 2.37 ms, flash 1.89 ms   (flash 1.26x)
#   S=768:  einsum 3.38 ms, flash 2.84 ms   (flash 1.19x)
#   S=1500: einsum 8.87 ms, flash 6.39 ms   (flash 1.39x)
# Gate the kernel to q/kv sequence lengths >= this; whisper's padded 30 s
# context (1500) takes the kernel, the 199-frame fast_context/hubert/wavlm
# operating points keep the (measured-faster) einsum formulation.
_MIN_FLASH_SEQ = 384

# test hook: force the flash path regardless of backend (used with
# pltpu.force_tpu_interpret_mode() so CPU tests execute the real kernel)
_FORCE_FLASH = False


def _backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu" or jax.devices()[0].platform in (
            "tpu",
            "axon",
        )
    except Exception:
        return False


def flash_eligible(
    mesh: Any = None, head_dim: int = 64, seq_len: int | None = None
) -> bool:
    """True when the fused kernel should run for this (backend, mesh, S).

    A data-only mesh is eligible (the kernel runs per batch shard under
    ``shard_map``); meshes that shard heads or sequence (tp/sp) keep the
    einsum path so XLA owns the collectives. Short sequences
    (``seq_len < _MIN_FLASH_SEQ``) keep the einsum path too — measured
    faster on v5e (crossover table above).
    """
    if os.environ.get("SEGMA_TPU_NO_PALLAS"):
        return False
    if head_dim % 8 != 0:
        return False
    if seq_len is not None and seq_len < _MIN_FLASH_SEQ and not _FORCE_FLASH:
        return False
    if mesh is not None and any(
        mesh.shape[a] > 1 for a in mesh.axis_names if a != "data"
    ):
        return False
    if _FORCE_FLASH:
        return True
    if mesh is None:
        # No mesh means the module was built without multi-device knowledge
        # (builders only pass one for seq/model layouts). If several devices
        # are visible the caller may still shard the batch under jit — the
        # partitioner would have to gather around the kernel — so only the
        # single-device case (this environment's real chip; typical
        # single-chip serving) takes the fused path. dp meshes go through
        # the explicit shard_map branch in attention_core.
        try:
            if jax.device_count() != 1:
                return False
        except Exception:
            return False
    return _backend_is_tpu()


def _block(padded: int, *, cap: int = 512) -> int:
    """Largest lane-multiple block size <= cap that divides ``padded``."""
    b = min(cap, padded)
    while b > _LANE and (padded % b or b % _LANE):
        b -= _LANE
    return max(b, _LANE)


def _block_sizes(padded_q: int, padded_kv: int, batch: int) -> Any:
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = _block(padded_q)
    bk = _block(padded_kv)
    return BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        # backward blocks so jax.grad works (unfrozen hubert-style encoders)
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk,
        block_k_dq=bk,
        block_q_dq=bq,
    )


def _flash_bhsd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: float) -> jnp.ndarray:
    """Flash attention on (B, H, S, D) with pad-to-lane + segment masking."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, _h, s, _d = q.shape
    pad = -s % _LANE
    seg = None
    if pad:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, widths) for t in (q, k, v))
        ids = jnp.concatenate(
            [jnp.ones((b, s), jnp.int32), jnp.zeros((b, pad), jnp.int32)],
            axis=-1,
        )
        seg = fa.SegmentIds(q=ids, kv=ids)
    out = fa.flash_attention(
        q,
        k,
        v,
        segment_ids=seg,
        sm_scale=sm_scale,
        block_sizes=_block_sizes(s + pad, s + pad, b),
    )
    return out[:, :, :s, :] if pad else out


def _einsum_core(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: float,
    dtype: jnp.dtype,
) -> jnp.ndarray:
    """The portable path: f32 scores on (B, S, H, D), XLA-tiled."""
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * sm_scale, k,
        preferred_element_type=jnp.float32,
    )
    attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: float,
    mesh: Any = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Softmax(q·kᵀ·sm_scale)·v over (B, S, H, D) head-split activations.

    Picks the fused Pallas kernel on TPU (per-shard via ``shard_map`` when a
    data-parallel mesh is active) and the einsum formulation elsewhere.
    Returns (B, S, H, D) in ``dtype``.
    """
    if not flash_eligible(mesh, head_dim=q.shape[-1], seq_len=q.shape[1]):
        return _einsum_core(q, k, v, sm_scale, dtype)

    def bshd(qq: jnp.ndarray, kk: jnp.ndarray, vv: jnp.ndarray) -> jnp.ndarray:
        out = _flash_bhsd(
            *(jnp.swapaxes(t, 1, 2) for t in (qq, kk, vv)), sm_scale
        )
        return jnp.swapaxes(out, 1, 2)

    if (
        mesh is not None
        and "data" in mesh.axis_names
        and mesh.shape["data"] > 1
        and q.shape[0] % mesh.shape["data"] == 0
    ):
        from jax.sharding import PartitionSpec as P

        spec = P("data", None, None, None)
        # check_vma=False: pallas_call cannot declare varying-mesh-axes
        # metadata; the kernel is purely batch-local so the check is moot
        bshd = jax.shard_map(
            bshd,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    return bshd(q, k, v).astype(dtype)
