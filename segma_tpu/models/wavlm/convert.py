"""Offline HF WavLM snapshot -> flax parameter converter.

Reads the directories produced by ``scripts/save_load_wavlm.py`` (an HF
``WavLMModel`` save_pretrained dir) and rewrites the tensors into the
``segma_tpu.models.wavlm.encoder`` parameter trees.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from segma_tpu.models.hubert.convert import (
    _dense,
    _layernorm,
    _load_raw,
    _normalize_keys,
    _pos_conv_weight,
)
from segma_tpu.models.wavlm.encoder import WavLMEncoderConfig


def read_wavlm_config(snapshot: Path) -> WavLMEncoderConfig:
    cfg_p = Path(snapshot) / "config.json"
    if not cfg_p.exists():
        return WavLMEncoderConfig.base()
    with cfg_p.open() as f:
        cfg = json.load(f)
    return WavLMEncoderConfig(
        hidden_size=cfg["hidden_size"],
        n_layers=cfg["num_hidden_layers"],
        n_heads=cfg["num_attention_heads"],
        ffn_dim=cfg["intermediate_size"],
        conv_dim=tuple(cfg["conv_dim"]),
        conv_kernels=tuple(cfg["conv_kernel"]),
        conv_strides=tuple(cfg["conv_stride"]),
        pos_conv_kernel=cfg.get("num_conv_pos_embeddings", 128),
        pos_conv_groups=cfg.get("num_conv_pos_embedding_groups", 16),
        num_buckets=cfg.get("num_buckets", 320),
        max_distance=cfg.get("max_bucket_distance", 800),
    )


def convert_wavlm_params(path: Path) -> tuple[WavLMEncoderConfig, dict, dict]:
    """(config, feature_extractor params, transformer params)."""
    cfg = read_wavlm_config(Path(path))
    sd = _normalize_keys(_load_raw(Path(path)))

    fe: dict = {}
    for i in range(len(cfg.conv_kernels)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        fe[f"conv_{i}"] = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    fe["group_norm"] = _layernorm(sd, "feature_extractor.conv_layers.0.layer_norm")

    tr: dict = {
        "feature_layer_norm": _layernorm(sd, "feature_projection.layer_norm"),
        "feature_projection": _dense(sd, "feature_projection.projection"),
        "pos_conv": {
            "kernel": _pos_conv_weight(sd),
            "bias": sd["encoder.pos_conv_embed.conv.bias"],
        },
        "layer_norm": _layernorm(sd, "encoder.layer_norm"),
    }
    for i in range(cfg.n_layers):
        pre = f"encoder.layers.{i}"
        attn: dict = {
            "q_proj": _dense(sd, f"{pre}.attention.q_proj"),
            "k_proj": _dense(sd, f"{pre}.attention.k_proj"),
            "v_proj": _dense(sd, f"{pre}.attention.v_proj"),
            "out_proj": _dense(sd, f"{pre}.attention.out_proj"),
            "gru_rel_pos_linear": _dense(sd, f"{pre}.attention.gru_rel_pos_linear"),
            "gru_rel_pos_const": sd[f"{pre}.attention.gru_rel_pos_const"],
        }
        if f"{pre}.attention.rel_attn_embed.weight" in sd:
            attn["rel_attn_embed"] = sd[f"{pre}.attention.rel_attn_embed.weight"]
        tr[f"layers_{i}"] = {
            "attention": attn,
            "layer_norm": _layernorm(sd, f"{pre}.layer_norm"),
            "intermediate_dense": _dense(sd, f"{pre}.feed_forward.intermediate_dense"),
            "output_dense": _dense(sd, f"{pre}.feed_forward.output_dense"),
            "final_layer_norm": _layernorm(sd, f"{pre}.final_layer_norm"),
        }
    return cfg, _as_f32(fe), _as_f32(tr)


def _as_f32(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _as_f32(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)
