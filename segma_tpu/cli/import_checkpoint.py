"""Migration CLI: reference (torch/Lightning) checkpoint -> segma_tpu.

Converts a trained reference ``best.ckpt`` — any of the six reference
variants — into a segma_tpu checkpoint directory usable by
``segma-tpu predict --checkpoint``. Weight-mapping parity is covered per
variant by ``tests/test_convert_reference.py``.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv: list[str] | None = None) -> None:
    from segma_tpu.checkpoint import (
        frozen_fingerprint,
        init_key_for_seed,
        save_params,
    )
    from segma_tpu.config import load_config
    from segma_tpu.convert_reference import import_reference_checkpoint
    from segma_tpu.models import Models
    from segma_tpu.utils.cache import enable_compilation_cache
    from segma_tpu.utils.encoders import MultiLabelEncoder

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, help="reference .ckpt path")
    parser.add_argument("--config", required=True, help="segma_tpu config")
    parser.add_argument("--out", required=True, help="output checkpoint dir")
    args, extra = parser.parse_known_args(argv)

    cfg = load_config(args.config, extra)
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models[cfg.model.name](enc, cfg)
    # same init-key derivation as training/inference, so the frozen tree
    # the imported head will run over at predict time is the one we can
    # fingerprint here
    seed = int(getattr(cfg.train, "seed", None) or 0)
    model.init_params(init_key_for_seed(seed))
    params = import_reference_checkpoint(args.ckpt, model)

    # persist only the trainable subtree, like native checkpoints; the
    # frozen encoder weights reload from the snapshot/converter at use time
    trainable, frozen = model.split_params(params)
    meta = {"imported_from": str(args.ckpt), "model": cfg.model.name}
    if frozen:
        meta["frozen_fingerprint"] = frozen_fingerprint(frozen)
    save_params(Path(args.out), trainable, meta=meta)
    print(f"[log] - imported {args.ckpt} -> {args.out}")
