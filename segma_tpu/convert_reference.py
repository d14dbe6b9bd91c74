"""Import trained reference (torch/Lightning) checkpoints into segma_tpu.

Migration path for users of the reference framework: a Lightning ``.ckpt``
from its ``scripts/train.py`` (state_dict keys like ``w_encoder.*``,
``lstm_shared.weight_ih_l0``, ``task_heads.linear_head_<label>.weight``,
``layer_weights`` — see reference ``src/segma/models/whisper/
surgical_hydra.py``) converts into this framework's flax parameter tree and
produces numerically matching logits (tested end-to-end against a torch
replica).

Weight mapping notes:
- torch ``nn.LSTM`` stacks gates [i, f, g, o] along dim 0 of
  ``weight_ih/hh`` and carries two bias vectors; the flax OptimizedLSTMCell
  keeps per-gate kernels (``i{i,f,g,o}`` input, no bias; ``h{i,f,g,o}``
  hidden, one bias) — so ``h{g}.bias = bias_ih[g] + bias_hh[g]``;
- the per-label ``Linear(h, 1)`` hydra heads concatenate into one fused
  ``Dense(h, n_labels)`` column-wise;
- the Whisper encoder reuses the HF converter on the ``w_encoder.`` keys.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from segma_tpu.models.base import SegmentationModel

_GATES = ("i", "f", "g", "o")


def _load_state_dict(ckpt_path: Path) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}


def _convert_lstm(sd: dict, prefix: str, num_layers: int, bidirectional: bool) -> dict:
    """torch nn.LSTM state -> flax BiLSTM param subtree."""
    out: dict[str, Any] = {}
    cell_idx = 0
    for layer in range(num_layers):
        directions = ["", "_reverse"] if bidirectional else [""]
        for suffix in directions:
            w_ih = sd[f"{prefix}.weight_ih_l{layer}{suffix}"]  # (4h, in)
            w_hh = sd[f"{prefix}.weight_hh_l{layer}{suffix}"]  # (4h, h)
            b_ih = sd[f"{prefix}.bias_ih_l{layer}{suffix}"]
            b_hh = sd[f"{prefix}.bias_hh_l{layer}{suffix}"]
            h = w_hh.shape[1]
            cell: dict[str, Any] = {}
            for gi, g in enumerate(_GATES):
                s = slice(gi * h, (gi + 1) * h)
                cell[f"i{g}"] = {"kernel": np.ascontiguousarray(w_ih[s].T)}
                cell[f"h{g}"] = {
                    "kernel": np.ascontiguousarray(w_hh[s].T),
                    "bias": b_ih[s] + b_hh[s],
                }
            out[f"OptimizedLSTMCell_{cell_idx}"] = cell
            cell_idx += 1
    return out


def _convert_hydra_heads(sd: dict, labels: tuple[str, ...]) -> dict:
    """per-label Linear(h, 1) heads -> fused Dense(h, n_labels)."""
    kernels, biases = [], []
    for label in labels:
        w = sd[f"task_heads.linear_head_{label}.weight"]  # (1, h)
        b = sd[f"task_heads.linear_head_{label}.bias"]  # (1,)
        kernels.append(w[0])
        biases.append(b[0])
    return {
        "heads": {
            "kernel": np.stack(kernels, axis=1),  # (h, n_labels)
            "bias": np.asarray(biases, np.float32),
        }
    }


def _convert_whisper_encoder(sd: dict) -> dict:
    """``w_encoder.``-prefixed HF WhisperEncoder state -> flax params."""
    from segma_tpu.models.whisper import convert as wc

    enc_sd = {
        k[len("w_encoder."):]: v for k, v in sd.items() if k.startswith("w_encoder.")
    }
    n_layers = (
        max(
            int(k.split(".")[1])
            for k in enc_sd
            if k.startswith("layers.")
        )
        + 1
    )
    params: dict = {
        "conv1": wc._conv(enc_sd, "conv1"),
        "conv2": wc._conv(enc_sd, "conv2"),
        "embed_positions": enc_sd["embed_positions.weight"],
        "layer_norm": wc._layernorm(enc_sd, "layer_norm"),
    }
    for i in range(n_layers):
        pre = f"layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn_layer_norm": wc._layernorm(enc_sd, f"{pre}.self_attn_layer_norm"),
            "self_attn": {
                "q_proj": wc._dense(enc_sd, f"{pre}.self_attn.q_proj"),
                "k_proj": wc._dense(enc_sd, f"{pre}.self_attn.k_proj", bias=False),
                "v_proj": wc._dense(enc_sd, f"{pre}.self_attn.v_proj"),
                "out_proj": wc._dense(enc_sd, f"{pre}.self_attn.out_proj"),
            },
            "final_layer_norm": wc._layernorm(enc_sd, f"{pre}.final_layer_norm"),
            "fc1": wc._dense(enc_sd, f"{pre}.fc1"),
            "fc2": wc._dense(enc_sd, f"{pre}.fc2"),
        }
    return params


def _convert_mlp_classifier(sd: dict, prefix: str = "classifier") -> dict:
    """torch ``nn.Sequential(Linear, ReLU, Linear)`` -> flax MLPHead params.

    Reference ``classifier.0`` / ``classifier.2`` (``whisperidou.py:24-28``,
    ``surgical.py:52-56``) bind in MLPHead's scope as ``Dense_0``/``Dense_1``.
    """
    out: dict[str, Any] = {}
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith(f"{prefix}.")}
    )
    for flax_i, torch_i in enumerate(idxs):
        out[f"Dense_{flax_i}"] = {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.{torch_i}.weight"].T),
            "bias": sd[f"{prefix}.{torch_i}.bias"],
        }
    return out


def _torch_linear(sd: dict, name: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
        "bias": sd[f"{name}.bias"],
    }


def _import_hubert(sd: dict, model: SegmentationModel) -> dict:
    """surgical_hubert_hydra Lightning checkpoint -> flax params.

    Reference checkpoints carry the FULL torchaudio ``wav2vec2.*`` tree
    (the state_dict filter at ``hubert/surgical_hydra.py:203-210`` matches
    an ``encoder.`` prefix that no key has), plus ``layer_weights`` and the
    per-label ``task_heads``.
    """
    from segma_tpu.models.hubert.convert import (
        _normalize_keys,
        convert_hubert_state_dict,
    )

    enc_sd = _normalize_keys(
        {k: v for k, v in sd.items() if k.startswith("wav2vec2.")}
    )
    fe, tr = convert_hubert_state_dict(enc_sd, model.module.enc_cfg)
    params: dict[str, Any] = {
        "feature_extractor": fe,
        "encoder": tr,
        "heads": _convert_hydra_heads(sd, model.label_encoder.base_labels),
    }
    # The reference's forward uses only hidden_states[-1] despite the
    # configured weighting (``hubert/surgical_hydra.py:99-102``); segma_tpu
    # applies weighting for real, so only a 'weighted' flax config needs the
    # learnable vector (configure encoder_layers=[n] + reduction=average to
    # reproduce the reference's actual last-layer behaviour).
    if model.module.reduction == "weighted" and "layer_weights" in sd:
        params["layer_mix"] = {"layer_weights": sd["layer_weights"]}
    return params


SUPPORTED_IMPORTS = (
    "whisperidou",
    "whisperimax",
    "surgical_whisper",
    "hydra_whisper",
    "surgical_hydra",
    "surgical_hubert_hydra",
)


def import_reference_checkpoint(
    ckpt_path: Path | str, model: SegmentationModel
) -> Any:
    """Convert a reference Lightning checkpoint into ``model``'s param tree.

    Supports all six reference variants (matching the universality of the
    reference's own checkpoint loading, reference ``inference.py:435-440``).
    Returns the full params (and stores them on ``model``).
    """
    if model.name not in SUPPORTED_IMPORTS:
        raise ValueError(
            f"reference import supports {'/'.join(SUPPORTED_IMPORTS)} "
            f"(e.g. surgical_hydra), got {model.name!r}"
        )
    sd = _load_state_dict(Path(ckpt_path))

    if model.name == "surgical_hubert_hydra":
        params = _import_hubert(sd, model)
    else:
        params = {"encoder": _convert_whisper_encoder(sd)}
        if model.name in ("surgical_hydra", "hydra_whisper"):
            lstm_cfg = model.module.lstm
            params["lstm_shared"] = _convert_lstm(
                sd, "lstm_shared", lstm_cfg.num_layers, lstm_cfg.bidirectional
            )
            params["heads"] = _convert_hydra_heads(
                sd, model.label_encoder.base_labels
            )
        elif model.name == "whisperimax":
            # reference attrs: self.lstm, self.linear (Sequential 0/2),
            # self.classifier (whisperimax.py:25-38)
            lstm_cfg = model.module.lstm
            params["lstm_shared"] = _convert_lstm(
                sd, "lstm", lstm_cfg.num_layers, lstm_cfg.bidirectional
            )
            params["linear_0"] = _torch_linear(sd, "linear.0")
            params["linear_1"] = _torch_linear(sd, "linear.2")
            params["classifier"] = _torch_linear(sd, "classifier")
        else:  # whisperidou / surgical_whisper: Sequential MLP classifier
            params["classifier"] = _convert_mlp_classifier(sd)
        if model.name in ("surgical_hydra", "surgical_whisper"):
            # 'average' stores a non-learnable buffer in the reference sd;
            # the flax average reduction has no parameter to fill
            if model.module.reduction == "weighted":
                params["layer_mix"] = {"layer_weights": sd["layer_weights"]}
    params = _as_f32(params)
    model.params = params
    return params


def _as_f32(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _as_f32(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)
