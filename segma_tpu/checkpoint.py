"""Checkpointing: trainable-params trees + metadata, top-k/best/last manager.

Mirrors the reference semantics (Lightning ``ModelCheckpoint`` with
``save_top_k``, ``save_last`` and best-symlinks, ``scripts/train.py:144-197``)
on a flax/orbax-style layout:

```
<run_dir>/checkpoints/
├── epoch=03-val_loss=0.123/    (one directory per kept checkpoint)
│   ├── params.msgpack           (trainable params only — frozen encoder
│   │                             weights are never written, matching the
│   │                             reference's encoder-excluded state_dicts,
│   │                             hubert/surgical_hydra.py:203-216)
│   └── meta.yaml                (epoch, monitored metric, config snapshot)
├── last/                        (copy of the most recent)
└── best.ckpt -> <best dir>      (symlink)
```
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import yaml
from flax import serialization

from segma_tpu.config import Config
from segma_tpu.models.base import SegmentationModel


def init_key_for_seed(seed: int) -> jax.Array:
    """THE PRNG key that initializes model params for a run seeded with
    ``seed`` — one definition shared by ``Trainer.fit`` and
    ``load_model_for_inference``.

    Checkpoints exclude frozen encoder params (see module docstring), so
    inference must *re-derive* them. With a pretrained snapshot they are
    grafted and any init key works; without one (random-encoder test/dev
    runs) the re-derived tree is only correct if inference draws the SAME
    key training did. Derivation: ``split(key(seed))[1]`` —
    ``split(key(seed))[0]`` seeds the training-time shuffle/dropout stream.
    """
    return jax.random.split(jax.random.key(seed))[1]


def frozen_fingerprint(frozen: Any) -> str:
    """Content hash of a frozen-params tree (leaf paths + raw bytes).

    Stored in checkpoint metadata at save and re-checked at
    ``load_model_for_inference`` so a frozen tree that drifted between
    training and inference (different seed, different snapshot, RNG
    derivation change) fails loudly instead of silently producing garbage
    logits under a perfectly-trained head."""
    import hashlib

    h = hashlib.sha256()
    leaves = jax.tree_util.tree_leaves_with_path(frozen)
    for path, leaf in sorted(leaves, key=lambda kv: jax.tree_util.keystr(kv[0])):
        arr = np.asarray(leaf)
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(arr.dtype).encode() + str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def save_params(path: Path, params: Any, meta: dict | None = None) -> Path:
    """Write one checkpoint directory: msgpack params + YAML metadata."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    params = jax.tree.map(np.asarray, params)
    (path / "params.msgpack").write_bytes(serialization.to_bytes(params))
    if meta is not None:
        with (path / "meta.yaml").open("w") as f:
            yaml.dump(meta, f, sort_keys=False)
    return path


def load_params(path: Path, template: Any) -> Any:
    """Restore a params tree (shape/dtype template required by msgpack)."""
    path = Path(path)
    if path.is_dir():
        blob = (path / "params.msgpack").read_bytes()
    else:
        blob = path.read_bytes()
    try:
        return serialization.from_bytes(template, blob)
    except Exception as e:
        try:  # distinguish corruption from a tree/template mismatch
            serialization.msgpack_restore(blob)
        except Exception:
            raise ValueError(
                f"{path}: corrupted checkpoint — params.msgpack does not "
                f"parse ({type(e).__name__}). Re-run from another "
                "checkpoint (auto-resume falls back automatically)."
            ) from e
        raise  # valid msgpack, wrong tree: flax's mismatch message is good


def load_opt_state(path: Path, template: Any) -> Any | None:
    """Restore optimizer state from a ``last/`` checkpoint, or None.

    Optimizer moments are an exactness extra, not a correctness
    requirement (top-k dirs never carry them): a torn/mismatched blob
    degrades to a fresh optimizer with a warning instead of turning an
    auto-requeue resume into a crash loop."""
    p = Path(path) / "opt_state.msgpack"
    if not p.exists():
        return None
    try:
        return serialization.from_bytes(template, p.read_bytes())
    except Exception as e:  # noqa: BLE001 — degrade, never crash resume
        from segma_tpu.utils.logging import log

        log(
            f"WARNING: {p}: optimizer state not restorable "
            f"({type(e).__name__}); resuming with fresh optimizer moments"
        )
        return None


def load_train_state(path: Path) -> dict:
    """Scheduler/early-stop counters from ``last/`` ({} when absent).
    Torn/alien YAML degrades to {} with a warning (same rationale as
    :func:`load_opt_state` — counters are exactness, not correctness)."""
    p = Path(path) / "train_state.yaml"
    if not p.exists():
        return {}
    try:
        with p.open() as f:
            data = yaml.safe_load(f)
        if data is None:
            return {}
        if not isinstance(data, dict):
            raise ValueError(f"expected a mapping, got {type(data).__name__}")
        return data
    except Exception as e:  # noqa: BLE001 — degrade, never crash resume
        from segma_tpu.utils.logging import log

        log(
            f"WARNING: {p}: train state not restorable "
            f"({type(e).__name__}); resuming with fresh scheduler counters"
        )
        return {}


def load_meta(path: Path) -> dict:
    """meta.yaml as a dict ({} when absent). A torn/alien file raises a
    clean ValueError (never a raw YAMLError traceback) so recovery paths
    can catch corruption uniformly."""
    meta_p = Path(path) / "meta.yaml"
    if not meta_p.exists():
        return {}
    try:
        with meta_p.open() as f:
            data = yaml.safe_load(f)
    except yaml.YAMLError as e:
        raise ValueError(
            f"{meta_p}: corrupted checkpoint metadata (does not parse as "
            "YAML)"
        ) from e
    if data is None:
        return {}
    if not isinstance(data, dict):
        raise ValueError(
            f"{meta_p}: corrupted checkpoint metadata (expected a mapping, "
            f"got {type(data).__name__})"
        )
    return data


class CheckpointManager:
    """top-k + last + best bookkeeping over checkpoint directories."""

    def __init__(
        self,
        dirpath: Path,
        monitor: str = "val/loss",
        mode: str = "min",
        save_top_k: int = 5,
        save_last: bool = True,
        write: bool = True,
    ) -> None:
        """``write=False`` makes this manager a non-writing replica: it
        keeps identical best/top-k bookkeeping (so every controller takes
        the same early-stop/scheduler decisions) but never touches disk.
        Multi-host training elects process 0 as the single writer — without
        the election, every process would race on the same ``last/`` swap
        and epoch dirs (all controllers compute identical replicated
        params, so one writer loses nothing)."""
        if save_top_k == 0:
            # In the Lightning convention 0 means "save none", which this
            # manager cannot honor (best.ckpt must point somewhere). Reject
            # rather than silently keeping one.
            raise ValueError(
                "save_top_k=0 (save no epoch checkpoints) is not supported: "
                "use save_top_k=1 to keep only the best, or -1 to keep all"
            )
        self.dirpath = Path(dirpath)
        self.write = write
        if write:
            self.dirpath.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        # [(score, path)]
        self.kept: list[tuple[float, Path]] = []
        self.best_path: Path | None = None
        self.best_score: float | None = None
        self._rediscover()

    def _rediscover(self) -> None:
        """Adopt checkpoints already present in the directory (resuming into
        an existing run dir keeps its top-k bookkeeping consistent). A dir
        with torn/alien metadata is left out of the bookkeeping (warned,
        never adopted as best) instead of crashing the resume — under SLURM
        auto-requeue a crash here loops forever."""
        from segma_tpu.utils.logging import log

        for p in sorted(self.dirpath.glob("epoch=*")):
            try:
                meta = load_meta(p)
                if "score" not in meta:
                    continue
                score = float(meta["score"])
            except (ValueError, TypeError):
                log(f"WARNING: skipping checkpoint with torn metadata: {p}")
                continue
            self.kept.append((score, p))
            if self.best_score is None or self._is_better(score, self.best_score):
                self.best_score = score
                self.best_path = p
        self.kept.sort(key=lambda t: t[0], reverse=(self.mode == "max"))

    def _is_better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def step(
        self,
        epoch: int,
        score: float,
        trainable_params: Any,
        meta: dict,
        opt_state: Any = None,
        train_state: dict | None = None,
    ) -> None:
        """Record one epoch's monitored score; persist/evict as needed.

        ``opt_state``/``train_state`` (optimizer moments, scheduler and
        early-stop counters) are persisted in ``last/`` only — they make
        resume exact (Lightning-checkpoint parity) without bloating the
        top-k dirs."""
        meta = {**meta, "epoch": epoch, "score": float(score)}
        if self.save_last and self.write:
            self._write_last(trainable_params, meta, opt_state, train_state)

        # keep the epoch directory only while it ranks within top-k
        name = f"epoch={epoch:02d}-{self.monitor.replace('/', '_')}={score:.3f}"
        path = self.dirpath / name
        if self.write:
            save_params(path, trainable_params, meta)
        self.kept.append((score, path))
        self.kept.sort(key=lambda t: t[0], reverse=(self.mode == "max"))
        if self.save_top_k > 0:  # Lightning convention: -1 keeps all
            while len(self.kept) > self.save_top_k:
                # best always ranks first, so it is never evicted and
                # best.ckpt can never dangle
                _, evicted = self.kept.pop()
                if self.write:
                    shutil.rmtree(evicted, ignore_errors=True)

        if self.best_score is None or self._is_better(score, self.best_score):
            self.best_score = float(score)
            self.best_path = path
            if self.write:
                best_link = self.dirpath / "best.ckpt"
                best_link.unlink(missing_ok=True)
                best_link.symlink_to(path.resolve())

    def _write_last(
        self,
        trainable_params: Any,
        meta: dict,
        opt_state: Any = None,
        train_state: dict | None = None,
    ) -> None:
        """Atomically replace ``last/`` (write to a tmp dir, then rename)."""
        assert self.write, (
            "non-writer CheckpointManager replica must never reach disk "
            "(multi-host single-writer election)"
        )
        last = self.dirpath / "last"
        tmp = self.dirpath / ".last.tmp"
        # a stale tmp from a crashed earlier write could carry an old
        # opt_state.msgpack/train_state.yaml into the new last/ when this
        # write omits them — always start from an empty tmp
        shutil.rmtree(tmp, ignore_errors=True)
        save_params(tmp, trainable_params, meta)
        if opt_state is not None:
            host_opt = jax.tree.map(np.asarray, opt_state)
            (tmp / "opt_state.msgpack").write_bytes(
                serialization.to_bytes(host_opt)
            )
        if train_state is not None:
            with (tmp / "train_state.yaml").open("w") as f:
                yaml.dump(train_state, f)
        # swap via a second rename so there is never a moment with no
        # resumable last/ on disk (a crash mid-replace loses at most the
        # epoch being written, not the previous one)
        old = self.dirpath / ".last.old"
        shutil.rmtree(old, ignore_errors=True)
        if last.exists():
            last.rename(old)
        tmp.rename(last)
        shutil.rmtree(old, ignore_errors=True)

    def refresh_last(
        self,
        epoch: int,
        trainable_params: Any,
        meta: dict,
        opt_state: Any = None,
        train_state: dict | None = None,
    ) -> None:
        """Refresh ``last/`` without top-k accounting — for epochs that
        skip validation (``train.val_every_n_epochs`` > 1): resume stays
        exact every epoch while best/top-k rank only scored epochs."""
        meta = {**meta, "epoch": epoch}
        if self.save_last and self.write:
            self._write_last(trainable_params, meta, opt_state, train_state)

    @property
    def last_path(self) -> Path:
        return recover_last_dir(self.dirpath)


def resolve_checkpoint(path: Path | str) -> Path:
    """Follow best.ckpt symlinks / accept run dirs or checkpoint dirs."""
    path = Path(path)
    if path.is_symlink():
        path = path.resolve()
    if (path / "params.msgpack").exists():
        return path
    if (path / "checkpoints").exists():
        return resolve_checkpoint(path / "checkpoints" / "best.ckpt")
    raise FileNotFoundError(f"no checkpoint found at {path}")


def load_model_for_inference(
    cfg: Config, checkpoint: Path | str | None, seed: int | None = None
) -> SegmentationModel:
    """Build the configured model, init params (grafting pretrained encoder
    weights when configured), and overlay trained head params from a
    checkpoint (when given).

    The init key defaults to the run's ``train.seed`` through the same
    derivation ``Trainer.fit`` uses (``init_key_for_seed``), so frozen
    params excluded from the checkpoint come back bit-identical. When the
    checkpoint metadata carries a ``frozen_fingerprint``, the rebuilt
    frozen tree is verified against it."""
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    if seed is None:
        seed = getattr(cfg.train, "seed", None)
        seed = 0 if seed is None else int(seed)
    l_encoder = MultiLabelEncoder(labels=cfg.data.classes)
    model = Models[cfg.model.name](l_encoder, cfg)
    params = model.init_params(init_key_for_seed(seed))
    if checkpoint is not None:
        ckpt_path = resolve_checkpoint(checkpoint)
        trainable, frozen = model.split_params(params)
        expected = load_meta(ckpt_path).get("frozen_fingerprint")
        if expected is not None and frozen:
            actual = frozen_fingerprint(frozen)
            if actual != expected:
                raise ValueError(
                    f"frozen params rebuilt for inference do not match the "
                    f"tree this checkpoint was trained against "
                    f"(fingerprint {actual[:12]} != recorded {expected[:12]}, "
                    f"checkpoint {ckpt_path}). The trained head is only "
                    f"valid over the exact training-time encoder — check "
                    f"that the encoder snapshot, train.seed ({seed}) and "
                    f"platform match the training run."
                )
        trainable = load_params(ckpt_path, trainable)
        model.params = {**trainable, **frozen}
    return model


def checkpoint_is_loadable(path: Path | str) -> bool:
    """Structural validity of a checkpoint dir: params.msgpack exists and
    unpacks (no shape template needed) AND meta.yaml (when present) parses
    — resume reads both, so a torn meta is as unresumable as torn params.
    Catches truncated/corrupted blobs without building a model."""
    try:
        blob = (Path(path) / "params.msgpack").read_bytes()
        serialization.msgpack_restore(blob)
        load_meta(Path(path))
        return True
    except Exception:  # noqa: BLE001 — any parse failure means "not valid"
        return False


def find_resumable(checkpoints_dir: Path | str) -> Path | None:
    """Newest structurally VALID resume point under a run's checkpoints.

    ``last/`` when it parses; otherwise the newest surviving ``epoch=*``
    directory that does (losing only opt-state exactness — top-k dirs
    don't carry it); None when nothing is salvageable. Keeps a corrupted
    ``last/`` (torn disk, partial copy) from turning an auto-requeue loop
    into a crash loop: resume degrades instead of failing forever.
    """
    from segma_tpu.utils.logging import log

    checkpoints_dir = Path(checkpoints_dir)
    last = recover_last_dir(checkpoints_dir)
    if last.exists():
        if checkpoint_is_loadable(last):
            return last
        log(
            f"WARNING: {last} is corrupted (params.msgpack does not parse);"
            " falling back to the newest epoch checkpoint"
        )
    def epoch_of(p: Path) -> int:
        # a torn meta.yaml (invalid YAML, non-dict payload, garbage epoch)
        # must rank the dir last, not crash the recovery path itself
        try:
            meta = load_meta(p)
            return int(meta.get("epoch", -1)) if isinstance(meta, dict) else -1
        except Exception:  # noqa: BLE001 — any parse failure ranks last
            return -1

    epochs = sorted(
        (p for p in checkpoints_dir.glob("epoch=*") if p.is_dir()),
        key=epoch_of,
        reverse=True,
    )
    for p in epochs:
        if checkpoint_is_loadable(p):
            return p
        log(f"WARNING: skipping corrupted checkpoint {p}")
    return None


def recover_last_dir(checkpoints_dir: Path | str) -> Path:
    """``last/`` under ``checkpoints_dir``, adopting a stranded
    ``.last.old`` from ``_write_last``'s two-rename crash window (last/ was
    moved aside but the replacement never landed — the previous epoch is
    still a fully valid resume point). THE one home for the swap-recovery
    protocol; auto_train and CheckpointManager.last_path both use it.
    """
    checkpoints_dir = Path(checkpoints_dir)
    last = checkpoints_dir / "last"
    old = checkpoints_dir / ".last.old"
    if not last.exists() and old.exists():
        old.rename(last)
    return last
