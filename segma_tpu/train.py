"""Training loop: optax AdamW + plateau LR schedule, jitted SPMD train step,
checkpoint top-k/best/last, early stopping, metrics.

Functional re-design of the reference Lightning stack (``scripts/train.py:
48-200``): one jitted, donation-friendly ``train_step`` (forward + loss +
grads + optimizer) compiled once and driven by the host loop; frozen encoder
params are masked out of the optimizer (the reference freezes via
``requires_grad=False``); ``ReduceLROnPlateau`` is reproduced by scaling the
learning rate through ``optax.inject_hyperparams`` between epochs, which
changes NO compiled code.

Multi-chip: batches shard over the mesh ``data`` axis and parameters follow
the tensor-parallel rules (``parallel/sharding.py``: encoder attention/MLP
over ``model``, everything else replicated) — XLA inserts the gradient
psums and TP collectives. The same ``fit`` runs on 1 TPU chip, N chips, or
a host-simulated CPU mesh.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from segma_tpu.checkpoint import CheckpointManager
from segma_tpu.config import Config
from segma_tpu.models.base import SegmentationModel
from segma_tpu.ops.metrics import binary_counts, f1_from_counts
from segma_tpu.parallel.mesh import shard_batch
from segma_tpu.utils.logging import MetricsLogger


def get_metric(metric: str) -> tuple[str, str]:
    """(mode, monitor key) for a validation metric name
    (reference ``scripts/train.py:34-45``)."""
    table = {
        "loss": ("min", "val/loss"),
        "f1_score": ("max", "val/f1_score"),
        "auroc": ("max", "val/auroc"),
    }
    if metric not in table:
        raise ValueError(
            f"metric '{metric}' is not supported, please use 'loss', 'auroc' "
            "or 'f1_score'."
        )
    return table[metric]


def make_optimizer(
    model: SegmentationModel, lr: float, grad_accum_steps: int = 1
) -> optax.GradientTransformation:
    """AdamW over trainable params only; LR injected as a runtime
    hyperparameter so plateau scaling never recompiles.

    ``grad_accum_steps > 1`` wraps the transformation in
    ``optax.MultiSteps``: every train step processes one micro-batch and
    parameters update once per k steps with the averaged gradient — the
    single-chip route to reference-scale effective batches (segma_tpu
    extension; the reference trainer has no accumulation).
    """
    opt = optax.inject_hyperparams(optax.adamw)(learning_rate=lr)
    # callable mask: resolved lazily at optimizer.init time
    opt = optax.masked(opt, model.trainable_mask)
    if grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum_steps)
    return opt


def _masked_state(opt_state: Any) -> Any:
    """Unwrap to the masked-AdamW state (through MultiSteps if present)."""
    if hasattr(opt_state, "inner_opt_state"):  # optax.MultiStepsState
        return opt_state.inner_opt_state
    return opt_state


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Update the injected learning rate in a masked-optimizer state."""
    inner = _masked_state(opt_state).inner_state
    new = jnp.asarray(lr, jnp.float32)
    prev = inner.hyperparams.get("learning_rate")
    sharding = getattr(prev, "sharding", None)
    if sharding is not None:
        # keep the previous placement — under a multi-host mesh the scalar
        # is replicated over ALL devices, and a fresh default-placed array
        # would make the next train_step's inputs device-incompatible
        new = jax.device_put(new, sharding)
    inner.hyperparams["learning_rate"] = new
    return opt_state


def get_learning_rate(opt_state: Any) -> float:
    return float(_masked_state(opt_state).inner_state.hyperparams["learning_rate"])


def cosine_lr(
    step: int,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr_ratio: float = 0.0,
) -> float:
    """Linear warmup then cosine decay to ``min_lr_ratio * base_lr``."""
    import math

    if warmup_steps > 0 and step < warmup_steps:
        return base_lr * (step + 1) / warmup_steps
    span = max(1, total_steps - warmup_steps)
    t = min(1.0, max(0.0, (step - warmup_steps) / span))
    floor = min_lr_ratio
    return base_lr * (floor + (1.0 - floor) * 0.5 * (1.0 + math.cos(math.pi * t)))


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics: ``factor`` scale after
    ``patience`` epochs without improvement)."""

    def __init__(self, mode: str, patience: int, factor: float = 0.1) -> None:
        self.mode = mode
        self.patience = patience
        self.factor = factor
        self.best: float | None = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, value: float) -> bool:
        """Returns True when the LR was just reduced."""
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best)
            or (self.mode == "max" and value > self.best)
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.scale *= self.factor
            self.bad_epochs = 0
            return True
        return False


class EarlyStopping:
    """Stop after ``patience`` epochs without improvement
    (reference ``scripts/train.py:154-161``, patience 10, min_delta 0)."""

    def __init__(self, mode: str, patience: int = 10, min_delta: float = 0.0):
        self.mode = mode
        self.patience = patience
        self.min_delta = min_delta
        self.best: float | None = None
        self.bad_epochs = 0

    def step(self, value: float) -> bool:
        """Returns True when training should stop."""
        improved = self.best is None or (
            value < self.best - self.min_delta
            if self.mode == "min"
            else value > self.best + self.min_delta
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs >= self.patience


def _device_waveform(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize an int16 training-transport batch on device.

    ``train.transport=int16`` ships the raw PCM crop (half the host->device
    bytes); ``x * 2^-15`` here is bit-identical to the loader's host-side
    ``/ 32768.0`` for the same samples. f32 batches pass through."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (1.0 / 32768.0)
    return x


def _waveform_source(cache: Any) -> Callable:
    """How a batch's input becomes device waveforms inside the jitted steps.

    Host path: ``x`` IS the waveform batch (f32, or int16 normalized on
    device); ``buf`` is ignored. Device-cache path
    (``train.data_cache=device``): ``x`` is a ``(B,)`` int32 vector of
    flat-buffer offsets and ``buf`` is the HBM-resident audio buffer,
    passed as an ARGUMENT (a multi-host global array may not be closed
    over inside jit) — only offsets and labels ever cross the
    host->device link."""
    if cache is None:

        def host(x: jnp.ndarray, buf: Any = None) -> jnp.ndarray:
            return _device_waveform(x)

        return host
    gather = cache.gather_fn()

    def from_cache(x: jnp.ndarray, buf: Any) -> jnp.ndarray:
        return _device_waveform(gather(buf, x))

    return from_cache


def _bind_cache_buf(jitted: Any, cache: Any) -> Callable:
    """Bind the placed cache buffer as a jitted step's trailing argument.

    JAX forbids closing over arrays that span non-addressable devices
    (the multi-host row buffer), so cached steps take ``cache_buf``
    explicitly; this wrapper keeps every call site's signature unchanged
    and forwards ``.lower`` for the HLO-contract tests."""

    def bound(*args: Any) -> Any:
        return jitted(*args, cache.buf)

    bound.lower = lambda *args: jitted.lower(*args, cache.buf)
    return bound


def _batch_input(batch: dict, cache: Any) -> Any:
    """The step's input array from a loader batch, contract-checked.

    Host batches carry waveforms under ``"x"``; device-cache batches carry
    flat-buffer offsets under ``"offsets"`` (``loaders.sample_batch``).
    Wiring one into a step built for the other raises a typed
    :class:`~segma_tpu.data.loaders.BatchContractError` at trace time —
    never a shape error inside the model. Runs under jit: dict keys are
    pytree STRUCTURE, so this costs nothing per step."""
    from segma_tpu.data.loaders import BatchContractError

    if cache is None:
        if "x" not in batch:
            raise BatchContractError(
                "batch carries device-cache offsets (key 'offsets') but "
                "this step was built without one — pass the loader's cache "
                "(make_train_step(..., cache=loader.device_cache) after "
                "cache.place()) or set train.data_cache=host"
            )
        return batch["x"]
    if "offsets" not in batch:
        raise BatchContractError(
            "step was built with a device cache but the batch carries host "
            "waveforms (key 'x') — use the device-cache loader's batches, "
            "or build the step with cache=None"
        )
    return batch["offsets"]


def make_train_step(
    model: SegmentationModel,
    optimizer: optax.GradientTransformation,
    cache: Any = None,
) -> Callable:
    """Build the jitted train step (donated params/opt_state)."""
    waveforms = _waveform_source(cache)

    def train_step(params, opt_state, batch, dropout_key, cache_buf=None):
        def loss_fn(p):
            logits = model.apply(
                p, waveforms(_batch_input(batch, cache), cache_buf),
                train=True,
                rngs={"dropout": dropout_key},
            )
            total, per_label = model.loss(logits, batch["y"])
            return total, per_label

        (loss, per_label), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, per_label

    jitted = jax.jit(train_step, donate_argnums=(0, 1))
    return jitted if cache is None else _bind_cache_buf(jitted, cache)


def _set_lr_traced(opt_state: Any, lr: jnp.ndarray) -> Any:
    """Traced twin of :func:`set_learning_rate` for use inside jit/scan.

    No placement logic: inside a traced region the scalar inherits its
    sharding from the carry, and ``lax.scan`` unflattens a fresh state
    pytree every iteration so the dict write never aliases across steps."""
    inner = _masked_state(opt_state).inner_state
    inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def make_epoch_fn(
    model: SegmentationModel,
    optimizer: optax.GradientTransformation,
    cache: Any,
) -> Callable:
    """Build the jitted WHOLE-EPOCH function (``train.dispatch=epoch``).

    One ``lax.scan`` over the step body replaces ``n_batches`` separate
    dispatches: with the audio already HBM-resident
    (``train.data_cache=device``) a full epoch's inputs are just
    ``(S, B)`` int32 offsets + ``(S, B, T, L)`` labels + ``(S,)`` learning
    rates, shipped in ONE transfer, and the host pays ONE dispatch
    round-trip per epoch instead of one per step. The step body is the
    same computation as :func:`make_train_step` — same rng split order,
    same lr injection point — so trajectories match step dispatch to
    ulp-level (XLA fuses a scan body slightly differently from the
    standalone step program; ``tests/test_device_cache.py`` pins the
    tolerance).

    The reference has no analog (its Lightning loop is host-driven per
    step); this is the TPU-native formulation — compiler-visible control
    flow via ``lax.scan``, no data-dependent host round-trips.
    """
    waveforms = _waveform_source(cache)

    def epoch_fn(params, opt_state, key, offsets_e, y_e, lrs_e, cache_buf):
        def one_step(carry, xs):
            params, opt_state, key = carry
            offsets, y, lr = xs
            opt_state = _set_lr_traced(opt_state, lr)
            key, sub = jax.random.split(key)

            def loss_fn(p):
                logits = model.apply(
                    p,
                    waveforms(offsets, cache_buf),
                    train=True,
                    rngs={"dropout": sub},
                )
                total, per_label = model.loss(logits, y)
                return total, per_label

            (loss, per_label), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), (loss, per_label)

        (params, opt_state, key), (losses, per_label) = jax.lax.scan(
            one_step, (params, opt_state, key), (offsets_e, y_e, lrs_e)
        )
        return params, opt_state, key, losses, per_label

    return _bind_cache_buf(jax.jit(epoch_fn, donate_argnums=(0, 1)), cache)


def _make_eval_body(model: SegmentationModel, waveforms: Callable) -> Callable:
    """The validation computation, shared by per-batch dispatch
    (:func:`make_eval_step`) and the whole-epoch scan
    (:func:`make_val_epoch_fn`): loss terms + F1 sufficient statistics.

    Powerset models additionally return subset-class statistics for the
    reference's ``partial_*`` validation metrics (``models/base.py:204-317``:
    metrics restricted to classes holding < 2 base labels). With the
    reference's plain ``MultiLabelEncoder`` those metrics average over zero
    classes (labels are strings, so ``len(label) < 2`` never holds) — they
    are only meaningful under a powerset encoding, which is where this
    build implements them.
    """

    def eval_body(params, x, y, cache_buf=None):
        logits = model.apply(params, waveforms(x, cache_buf), train=False)
        total, per_label = model.loss(logits, y)
        # per-base-label probabilities (powerset models marginalize here)
        frame_logits = model.inference_transform(logits)
        probs = jax.nn.sigmoid(frame_logits).reshape(-1, frame_logits.shape[-1])
        targets = y.reshape(-1, y.shape[-1])
        counts = binary_counts(probs, targets)

        subset_stats = None
        if model.powerset is not None:
            n_classes = logits.shape[-1]
            lut = jnp.asarray(model.powerset.multihot_lut())
            bits = 2 ** jnp.arange(y.shape[-1], dtype=jnp.int32)
            class_ids = lut[(y > 0.5).astype(jnp.int32) @ bits].reshape(-1)
            flat_logits = logits.reshape(-1, n_classes)
            target_oh = jax.nn.one_hot(class_ids, n_classes)
            # CE weighted onto the single-label class prefix (torch
            # cross_entropy(weight=[1]*n_single + [0]*rest) semantics)
            single = jnp.asarray(
                [1.0 if len(s) < 2 else 0.0 for s in model.powerset.labels],
                jnp.float32,
            )
            from segma_tpu.models.base import weighted_index_ce

            partial_loss = weighted_index_ce(flat_logits, class_ids, single)
            pred_oh = (
                jax.nn.one_hot(jnp.argmax(flat_logits, axis=-1), n_classes)
                > 0.5
            )
            t_oh = target_oh > 0.5
            subset_counts = {
                "tp": jnp.sum(pred_oh & t_oh, axis=0),
                "fp": jnp.sum(pred_oh & ~t_oh, axis=0),
                "fn": jnp.sum(~pred_oh & t_oh, axis=0),
            }
            subset_probs = jax.nn.softmax(flat_logits, axis=-1)
            subset_stats = (partial_loss, subset_counts, subset_probs, class_ids)
        return total, per_label, counts, probs, subset_stats

    return eval_body


def make_eval_step(model: SegmentationModel, cache: Any = None) -> Callable:
    """Jitted per-batch validation step (see :func:`_make_eval_body`)."""
    body = _make_eval_body(model, _waveform_source(cache))

    def eval_step(params, batch, cache_buf=None):
        return body(params, _batch_input(batch, cache), batch["y"], cache_buf)

    jitted = jax.jit(eval_step)
    return jitted if cache is None else _bind_cache_buf(jitted, cache)


def make_val_epoch_fn(
    model: SegmentationModel, cache: Any, need_scores: bool = False
) -> Callable:
    """Build the jitted whole-VALIDATION-pass function (``train.dispatch=
    epoch``): one ``lax.scan`` over :func:`_make_eval_body` replaces one
    dispatch per val batch. With the audio HBM-resident
    (``train.data_cache=device``) the whole pass uploads just ``(S, B)``
    int32 offsets + ``(S, B, T, L)`` labels.

    Outputs are the per-step eval tuples stacked along the step axis, so
    the host aggregation in ``Trainer._val_epoch`` consumes them with the
    SAME formulas as per-batch dispatch. The full per-frame score matrices
    (``probs``/``subset_probs``/``class_ids``) are only materialized when
    ``need_scores`` (auroc/roc requested) — otherwise XLA dead-code
    eliminates them and only scalars/counters leave the device.
    """
    body = _make_eval_body(model, _waveform_source(cache))

    def val_epoch(params, offsets_e, y_e, cache_buf):
        def one_step(carry, xs):
            offsets, y = xs
            total, per_label, counts, probs, subset_stats = body(
                params, offsets, y, cache_buf
            )
            if not need_scores:
                probs = None
                if subset_stats is not None:
                    p_loss, s_counts, _, _ = subset_stats
                    subset_stats = (p_loss, s_counts, None, None)
            return carry, (total, per_label, counts, probs, subset_stats)

        _, outs = jax.lax.scan(one_step, 0, (offsets_e, y_e))
        return outs

    return _bind_cache_buf(jax.jit(val_epoch), cache)


@dataclass
class Trainer:
    """Host training driver (role of ``pl.Trainer`` in the reference)."""

    model: SegmentationModel
    config: Config
    run_dir: Path
    mesh: Mesh | None = None
    logger: MetricsLogger | None = None
    max_epochs: int | None = None
    state: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.run_dir = Path(self.run_dir)
        # multi-host: every controller runs the identical fit loop on its
        # data shard; process 0 is elected the single writer for the run
        # dir (checkpoints, metrics.jsonl, figures) — the others keep
        # identical in-memory bookkeeping so scheduler/early-stop decisions
        # never diverge across controllers
        self.n_processes = jax.process_count()
        self.is_main_process = jax.process_index() == 0
        if self.is_main_process:
            self.run_dir.mkdir(parents=True, exist_ok=True)
        if self.logger is None:
            self.logger = MetricsLogger(
                self.run_dir / "metrics.jsonl" if self.is_main_process else None,
                echo=self.is_main_process,
            )
        tc = self.config.train
        if self.n_processes > 1:
            score_metrics = {"auroc", "roc"} & (
                {tc.validation_metric} | set(tc.extra_val_metrics)
            )
            if score_metrics:
                # these need the full per-frame score matrix on the host;
                # under multi-host that array is sharded across controllers
                # and not addressable from any single one
                raise ValueError(
                    f"validation metrics {sorted(score_metrics)} are not "
                    "supported under multi-host training — use loss/f1_score "
                    "(computed from globally-reduced statistics)"
                )
        self.mode, self.monitor = get_metric(tc.validation_metric)
        self.optimizer = make_optimizer(
            self.model, tc.lr, grad_accum_steps=tc.grad_accum_steps
        )
        self.train_step = make_train_step(self.model, self.optimizer)
        self.eval_step = make_eval_step(self.model)
        # train.dispatch=epoch: built in fit() once the device cache is
        # placed (the scan bodies gather crops from it)
        self.epoch_fn: Callable | None = None
        self.val_epoch_fn: Callable | None = None
        if tc.dispatch not in ("step", "epoch"):
            raise ValueError(
                f"train.dispatch must be 'step' or 'epoch', got {tc.dispatch!r}"
            )
        if tc.dispatch == "epoch" and tc.data_cache == "host":
            # "auto" passes here; if it resolves to host at fit() time
            # (budget exceeded / multi-host) the loader-side check there
            # rejects it with the resolution in the message
            raise ValueError(
                "train.dispatch=epoch scans over HBM-resident crops — it "
                "requires train.data_cache=device (or auto within budget)"
            )
        self.ckpt = CheckpointManager(
            self.run_dir / "checkpoints",
            monitor=self.monitor,
            mode=self.mode,
            save_top_k=tc.save_top_k,
            save_last=True,
            write=self.is_main_process,
        )
        self.scheduler = ReduceLROnPlateau(self.mode, tc.scheduler.patience)
        self.early_stopping = EarlyStopping(
            self.mode, patience=tc.early_stop_patience
        )
        self._preempt_requested = False

    # -- preemption ---------------------------------------------------------------
    def request_preemption(self) -> None:
        """Ask the training loop to stop after the current step and write a
        resumable ``last/`` checkpoint. Called by the SIGTERM handler (SLURM
        sends SIGTERM ahead of the hard kill); safe to call from anywhere."""
        self._preempt_requested = True

    def _handle_preempt_signal(self, signum: int, _frame: Any) -> None:
        # async-signal-safe: only set flags — logging (stdout/wandb I/O) from
        # signal context can raise a reentrant-call RuntimeError at the
        # interrupted bytecode and kill the loop before the interrupt
        # checkpoint is written; the training loop logs when it sees the flag
        self._preempt_signum = int(signum)
        self.request_preemption()

    # -- data placement ---------------------------------------------------------
    def _put(self, batch: dict[str, np.ndarray]) -> dict[str, jnp.ndarray]:
        if self.mesh is not None:
            if self.n_processes > 1:
                # each controller holds only its process-local rows of the
                # global batch (the loader shards files and batch size by
                # process); assemble the global sharded array from them
                from segma_tpu.parallel.mesh import batch_sharding

                sharding = batch_sharding(self.mesh)
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding, np.asarray(x)
                    ),
                    batch,
                )
            return shard_batch(batch, self.mesh)
        return jax.tree.map(jnp.asarray, batch)

    # -- epochs -------------------------------------------------------------------
    def _train_epoch_scan(
        self, params: Any, opt_state: Any, loader: Any, key: jax.Array
    ) -> tuple:
        """One dispatch per epoch (``train.dispatch=epoch``): stack the
        loader's (offsets, labels) batches on the host, compute the
        per-step learning rates, and hand the whole epoch to the jitted
        ``lax.scan``. Same values, same order as the step loop — only the
        dispatch granularity changes."""
        tc = self.config.train
        self._epoch_completed = False
        if self._preempt_requested:  # signal arrived between epochs
            return params, opt_state, float("nan"), key
        offs, ys = [], []
        for batch in loader:
            offs.append(batch["offsets"])
            ys.append(batch["y"])
        n_steps = len(offs)
        if n_steps == 0:
            return params, opt_state, float("nan"), key
        step0 = getattr(self, "_global_step", 0)
        if tc.scheduler.type == "cosine":
            lrs = np.asarray(
                [
                    cosine_lr(
                        step0 + i,
                        tc.lr,
                        self._total_steps,
                        tc.scheduler.warmup_steps,
                        tc.scheduler.min_lr_ratio,
                    )
                    for i in range(n_steps)
                ],
                np.float32,
            )
        else:  # plateau: constant within an epoch (rescaled between epochs)
            lrs = np.full(n_steps, get_learning_rate(opt_state), np.float32)
        offsets_e, y_e = np.stack(offs), np.stack(ys)
        if self.mesh is not None:
            # step axis stays unsharded (scan iterates it); batch axis
            # shards over data like every per-step batch does
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
            rep = NamedSharding(self.mesh, PartitionSpec())
            if self.n_processes > 1:
                # each controller holds only its (S, B/n) rows of the
                # global epoch; lrs are identical everywhere (cosine is
                # deterministic, plateau reads a replicated scalar)
                offsets_e = jax.make_array_from_process_local_data(
                    sh, offsets_e
                )
                y_e = jax.make_array_from_process_local_data(sh, y_e)
                lrs = jax.make_array_from_process_local_data(rep, lrs)
            else:
                offsets_e = jax.device_put(offsets_e, sh)
                y_e = jax.device_put(y_e, sh)
                lrs = jax.device_put(lrs, rep)
        params, opt_state, key, losses, per_label = self.epoch_fn(
            params, opt_state, key, offsets_e, y_e, lrs
        )
        self._global_step = step0 + n_steps
        every = tc.log_every_n_steps
        if every:
            labels = self.model.label_encoder.base_labels
            losses_h, per_label_h = np.asarray(losses), np.asarray(per_label)
            for i in range(n_steps):
                gs = step0 + i + 1
                if gs % every:
                    continue
                step_metrics = {
                    "step": gs,
                    "train/loss_step": float(losses_h[i]),
                }
                for j, label in enumerate(labels):
                    step_metrics[f"train/loss_step_{label}"] = float(
                        per_label_h[i, j]
                    )
                self.logger.log(step_metrics)
        # same program as the step loop's jnp.mean(jnp.stack(losses))
        mean_loss = float(jnp.mean(losses)) if n_steps else float("nan")
        # the scan always runs the WHOLE epoch (a signal inside the single
        # dispatch can't interrupt it) — the preempt branch may checkpoint
        # this epoch as a completed boundary
        self._epoch_completed = True
        return params, opt_state, mean_loss, key

    def _train_epoch(
        self, params: Any, opt_state: Any, loader: Any, key: jax.Array
    ) -> tuple:
        if self.epoch_fn is not None:
            return self._train_epoch_scan(params, opt_state, loader, key)
        self._epoch_completed = False
        losses = []
        n_seen = 0
        tc = self.config.train
        every = tc.log_every_n_steps
        labels = self.model.label_encoder.base_labels
        cosine = tc.scheduler.type == "cosine"
        for batch in loader:
            if cosine:
                opt_state = set_learning_rate(
                    opt_state,
                    cosine_lr(
                        getattr(self, "_global_step", 0),
                        tc.lr,
                        self._total_steps,
                        tc.scheduler.warmup_steps,
                        tc.scheduler.min_lr_ratio,
                    ),
                )
            key, sub = jax.random.split(key)
            params, opt_state, loss, per_label = self.train_step(
                params, opt_state, self._put(batch), sub
            )
            losses.append(loss)
            self._global_step = getattr(self, "_global_step", 0) + 1
            if every and self._global_step % every == 0:
                # per-step total + per-head losses (reference on_step logs,
                # models/base.py:171-187). Blocks on the device — cadence is
                # config.train.log_every_n_steps.
                step_metrics = {
                    "step": self._global_step,
                    "train/loss_step": float(loss),
                }
                per_label = np.asarray(per_label)
                for i, label in enumerate(labels):
                    step_metrics[f"train/loss_step_{label}"] = float(per_label[i])
                self.logger.log(step_metrics)
            n_seen += 1
            if self._preempt_requested:
                break
        # every step ran: a completed boundary the preempt branch may
        # checkpoint — counted (not for/else) so a signal landing during
        # the FINAL step still classifies the epoch as complete (the break
        # fires on the last iteration too and would skip an else-clause)
        if n_seen == len(loader):
            self._epoch_completed = True
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        return params, opt_state, mean_loss, key

    def _need_scores(self) -> bool:
        """Whether validation needs full per-frame score matrices on the
        host (auroc/roc) — THE single definition, used both when building
        the epoch-scan program (``fit``) and when aggregating
        (``_val_epoch``); divergent copies would yield probs=None into an
        aggregation that expects arrays."""
        tc = self.config.train
        return (
            tc.validation_metric == "auroc"
            or "auroc" in tc.extra_val_metrics
            or "roc" in tc.extra_val_metrics
        )

    def _val_outputs(self, params: Any, loader: Any) -> Any:
        """Yield ``(eval outputs, targets)`` per val batch.

        Per-batch dispatch path: one jitted ``eval_step`` per batch.
        Scan path (``train.dispatch=epoch`` with a device-cached val set):
        ONE ``lax.scan`` dispatch for the whole pass, its stacked outputs
        sliced back into per-step tuples so the caller's aggregation is
        byte-for-byte the same code either way."""
        if self.val_epoch_fn is None:
            for batch in loader:
                yield self.eval_step(params, self._put(batch)), batch["y"]
            return
        offs, ys = [], []
        for batch in loader:
            offs.append(batch["offsets"])
            ys.append(batch["y"])
        if not offs:
            return
        offsets_e, y_e = np.stack(offs), np.stack(ys)
        if self.mesh is not None:
            # step axis unsharded (scan iterates it); batch axis over data
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
            if self.n_processes > 1:
                offsets_e = jax.make_array_from_process_local_data(
                    sh, offsets_e
                )
                y_e = jax.make_array_from_process_local_data(sh, y_e)
            else:
                offsets_e = jax.device_put(offsets_e, sh)
                y_e = jax.device_put(y_e, sh)
        totals, per_labels, counts, probs, subset_stats = self.val_epoch_fn(
            params, offsets_e, y_e
        )
        for i in range(len(offs)):
            step_subset = None
            if subset_stats is not None:
                p_loss, s_counts, s_probs, s_ids = subset_stats
                step_subset = (
                    p_loss[i],
                    jax.tree.map(lambda a: a[i], s_counts),
                    None if s_probs is None else s_probs[i],
                    None if s_ids is None else s_ids[i],
                )
            yield (
                totals[i],
                per_labels[i],
                jax.tree.map(lambda a: a[i], counts),
                None if probs is None else probs[i],
                step_subset,
            ), ys[i]

    def _val_epoch(self, params: Any, loader: Any) -> dict[str, float]:
        tc = self.config.train
        labels = self.model.label_encoder.base_labels
        wants = lambda m: (  # noqa: E731
            tc.validation_metric == m or m in tc.extra_val_metrics
        )
        need_scores = self._need_scores()

        losses, per_labels = [], []
        counts_acc: dict[str, Any] | None = None
        all_probs, all_targets = [], []
        partial_losses: list = []
        subset_counts_acc: dict[str, Any] | None = None
        all_subset_probs, all_subset_ids = [], []
        for (total, per_label, counts, probs, subset_stats), y in (
            self._val_outputs(params, loader)
        ):
            losses.append(total)
            per_labels.append(per_label)
            if counts_acc is None:
                counts_acc = counts
            else:
                counts_acc = jax.tree.map(lambda a, b: a + b, counts_acc, counts)
            if need_scores:
                all_probs.append(np.asarray(probs))
                all_targets.append(np.asarray(y).reshape(-1, len(labels)))
            if subset_stats is not None:
                p_loss, s_counts, s_probs, s_ids = subset_stats
                partial_losses.append(p_loss)
                if subset_counts_acc is None:
                    subset_counts_acc = s_counts
                else:
                    subset_counts_acc = jax.tree.map(
                        lambda a, b: a + b, subset_counts_acc, s_counts
                    )
                if wants("auroc"):
                    all_subset_probs.append(np.asarray(s_probs))
                    all_subset_ids.append(np.asarray(s_ids))
        metrics: dict[str, float] = {}
        if losses:
            metrics["val/loss"] = float(jnp.mean(jnp.stack(losses)))
            per_label = np.asarray(jnp.mean(jnp.stack(per_labels), axis=0))
            for i, label in enumerate(labels):
                metrics[f"val/loss_{label}"] = float(per_label[i])
        if counts_acc is not None and wants("f1_score"):
            f1 = f1_from_counts(jax.tree.map(np.asarray, counts_acc))
            metrics["val/f1_score"] = float(f1.mean())
            for i, label in enumerate(labels):
                metrics[f"val/f1_{label}"] = float(f1[i])
        if need_scores and all_probs:
            from segma_tpu.ops.metrics import binary_auroc_np

            probs = np.concatenate(all_probs)
            targets = np.concatenate(all_targets)
            if wants("auroc"):
                auroc = binary_auroc_np(probs, targets)
                metrics["val/auroc"] = float(auroc.mean())
                for i, label in enumerate(labels):
                    metrics[f"val/auroc_{label}"] = float(auroc[i])
            if "roc" in tc.extra_val_metrics:
                self._plot_roc(probs, targets, labels)
        # partial_* metrics (powerset models): restrict to the subset-class
        # prefix holding < 2 base labels (reference models/base.py:204-317)
        if partial_losses:
            n_single = self.model.powerset.n_single_classes
            if "partial_loss" in tc.extra_val_metrics:
                metrics["val/partial_loss"] = float(
                    jnp.mean(jnp.stack(partial_losses))
                )
            if subset_counts_acc is not None and wants("f1_score"):
                subset_f1 = f1_from_counts(
                    jax.tree.map(np.asarray, subset_counts_acc)
                )
                metrics["val/partial_f1_score"] = float(
                    subset_f1[:n_single].mean()
                )
            if wants("auroc") and all_subset_probs:
                from segma_tpu.ops.metrics import binary_auroc_np

                s_probs = np.concatenate(all_subset_probs)
                s_ids = np.concatenate(all_subset_ids)
                s_onehot = np.eye(s_probs.shape[-1])[s_ids]
                s_auroc = binary_auroc_np(s_probs, s_onehot)
                metrics["val/partial_auroc"] = float(s_auroc[:n_single].mean())
        return metrics

    def _plot_roc(
        self, probs: np.ndarray, targets: np.ndarray, labels: tuple[str, ...]
    ) -> None:
        """Per-label ROC curves -> <run_dir>/roc_epoch.png (role of the
        reference's wandb ROC figures, models/base.py:319-357)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        from segma_tpu.ops.metrics import binary_auroc_np, roc_curve_np

        auroc = binary_auroc_np(probs, targets)
        fig, ax = plt.subplots(figsize=(10, 5))
        for i, label in enumerate(labels):
            fpr, tpr = roc_curve_np(probs[:, i], targets[:, i])
            ax.plot(fpr, tpr, label=f"{label} - AUC={auroc[i]:.4f}")
        ax.plot([0, 1], [0, 1], "k--", label="Random classifier: AUC=0.5")
        ax.set_xlabel("False Positive Rate")
        ax.set_ylabel("True Positive Rate")
        ax.legend(loc="lower right")
        fig.tight_layout()
        fig.savefig(self.run_dir / "roc_latest.png", dpi=120)
        plt.close(fig)

    def _ckpt_meta(self) -> dict:
        """Metadata written with every checkpoint: config snapshot, the
        monitored metric name, and the frozen-params fingerprint that lets
        inference verify its re-derived encoder tree."""
        meta = {"config": self.config.as_dict(), "monitor": self.monitor}
        if getattr(self, "_frozen_fp", None) is not None:
            meta["frozen_fingerprint"] = self._frozen_fp
        return meta

    # -- fit -------------------------------------------------------------------
    def fit(
        self,
        datamodule: Any,
        resume_from: Path | None = None,
    ) -> dict[str, Any]:
        tc = self.config.train
        seed = tc.seed if tc.seed is not None else 0
        key = jax.random.key(seed)

        params = self.model.params
        if params is None:
            # advance the stream exactly as before; the init key itself
            # comes from the SAME derivation load_model_for_inference uses,
            # so checkpoint-excluded frozen params are reconstructible
            key = jax.random.split(key)[0]
            from segma_tpu.checkpoint import init_key_for_seed

            params = self.model.init_params(init_key_for_seed(seed))
        # fingerprint BEFORE mesh sharding: TP-sharded leaves are not
        # fully addressable on multi-host, and resume never changes the
        # frozen tree. Recorded in every checkpoint's metadata; verified
        # when inference re-derives the frozen tree.
        from segma_tpu.checkpoint import frozen_fingerprint

        _, frozen_pre = self.model.split_params(params)
        self._frozen_fp = frozen_fingerprint(frozen_pre) if frozen_pre else None
        start_epoch = 0

        resume_ckpt = None
        if resume_from is not None:
            from segma_tpu.checkpoint import load_meta, load_params, resolve_checkpoint

            resume_ckpt = resolve_checkpoint(resume_from)
            trainable, frozen = self.model.split_params(params)
            trainable = load_params(resume_ckpt, trainable)
            params = {**trainable, **frozen}
            start_epoch = int(load_meta(resume_ckpt).get("epoch", -1)) + 1

        if self.mesh is not None:
            # tensor-parallel rules where they apply, replication elsewhere;
            # optimizer state inherits the param shardings through jit
            from jax.sharding import NamedSharding, PartitionSpec
            from segma_tpu.parallel.sharding import shard_params

            params = shard_params(params, self.mesh)
            # moments inherit the param shardings through data flow; scalar
            # state (step counters, injected lr) has no input to inherit
            # from and would land on one device — replicate it over the
            # mesh so multi-host controllers all address it
            replicated = NamedSharding(self.mesh, PartitionSpec())

            def _init(p):
                return jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, replicated)
                    if getattr(x, "ndim", None) == 0
                    else x,
                    self.optimizer.init(p),
                )

            opt_state = jax.jit(_init)(params)
        else:
            opt_state = self.optimizer.init(params)

        if resume_ckpt is not None:
            # exact resume: optimizer moments + scheduler/early-stop counters
            # (Lightning-checkpoint parity); older checkpoints without these
            # files resume with fresh state
            from segma_tpu.checkpoint import load_opt_state, load_train_state

            restored = load_opt_state(resume_ckpt, opt_state)
            if restored is not None:
                if self.mesh is not None:
                    # from_bytes yields host numpy leaves; re-place each on
                    # the sharding jit(optimizer.init) established (moments
                    # follow the TP param layout) — otherwise the first
                    # step replicates them across the model axis
                    opt_state = jax.tree.map(
                        lambda r, init: jax.device_put(r, init.sharding)
                        if hasattr(init, "sharding")
                        else r,
                        restored,
                        opt_state,
                    )
                else:
                    opt_state = restored
            ts = load_train_state(resume_ckpt)
            if ts:
                for obj, section in (
                    (self.scheduler, "scheduler"),
                    (self.early_stopping, "early_stopping"),
                ):
                    for attr, val in (ts.get(section) or {}).items():
                        setattr(obj, attr, val)

        # parameter accounting (role of the reference's parameter-table
        # printer, auto_train.py:35-52)
        trainable0, frozen0 = self.model.split_params(params)
        self.logger.log(
            {
                "n_params_trainable": sum(
                    int(x.size) for x in jax.tree.leaves(trainable0)
                ),
                "n_params_frozen": sum(
                    int(x.size) for x in jax.tree.leaves(frozen0)
                ),
            }
        )

        base_lr = tc.lr
        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()

        # train.data_cache=device: each subset's audio was flattened by the
        # loader; upload it ONCE (replicated over the mesh) and rebuild the
        # jitted steps so they gather crops from HBM — per batch, only
        # (offsets, labels) cross the host->device link from here on
        t_cache = getattr(train_loader, "device_cache", None)
        v_cache = getattr(val_loader, "device_cache", None)
        for which, ldr in (("train", train_loader), ("val", val_loader)):
            note = getattr(ldr, "data_cache_decision", None)
            if note:  # data_cache=auto: record how each subset resolved
                self.logger.log({f"data_cache_{which}": note})
        if tc.dispatch == "epoch" and t_cache is None:
            # fail loudly: silently falling back to per-step dispatch would
            # ignore the requested mode (and its one-round-trip-per-epoch
            # saving) with nothing in the logs
            resolved = getattr(train_loader, "data_cache_decision", None)
            raise ValueError(
                "train.dispatch=epoch requires the train loader to carry a "
                "device_cache (train.data_cache=device through "
                "SegmentationDataLoader); this loader has none"
                + (f" — data_cache resolved {resolved}" if resolved else "")
            )
        if t_cache is not None:
            t_cache.place(self.mesh)
            self.train_step = make_train_step(
                self.model, self.optimizer, cache=t_cache
            )
            if tc.dispatch == "epoch":
                self.epoch_fn = make_epoch_fn(
                    self.model, self.optimizer, cache=t_cache
                )
            self.logger.log(
                {"device_cache_mb": round(t_cache.nbytes / 1e6, 1)}
            )
        if v_cache is not None:
            v_cache.place(self.mesh)
            self.eval_step = make_eval_step(self.model, cache=v_cache)
            if tc.dispatch == "epoch":
                self.val_epoch_fn = make_val_epoch_fn(
                    self.model, v_cache, need_scores=self._need_scores()
                )
        max_epochs = self.max_epochs or tc.max_epochs
        # cosine schedule state: the global step counter survives resume
        self._global_step = start_epoch * len(train_loader)
        self._total_steps = max_epochs * len(train_loader)

        # config-gated profiler (role of the reference's pl.Trainer
        # profiler slot, scripts/train.py:175): trace the first post-compile
        # epoch to <run_dir>/profile, xprof-compatible
        profile_epoch = start_epoch + 1 if tc.profiler else None

        # preemption safety: SLURM/k8s send SIGTERM before the hard kill;
        # stop after the in-flight step and write a resumable last/ (only
        # the main thread may install handlers)
        import signal
        import threading

        installed: list[tuple[int, Any]] = []
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM,):
                installed.append((sig, signal.getsignal(sig)))
                signal.signal(sig, self._handle_preempt_signal)

        def train_state_snapshot() -> dict:
            return {
                "scheduler": {
                    "best": self.scheduler.best,
                    "bad_epochs": self.scheduler.bad_epochs,
                    "scale": self.scheduler.scale,
                },
                "early_stopping": {
                    "best": self.early_stopping.best,
                    "bad_epochs": self.early_stopping.bad_epochs,
                },
            }

        # self-recycle guard: a leaky host stack (e.g. this environment's
        # relay client retains every transfer payload) must end in a clean
        # interrupted-stop + requeue, not the kernel OOM killer
        from segma_tpu.utils import host_mem_total_gb, host_rss_gb

        rss_limit = tc.host_rss_limit_gb
        if rss_limit is None:
            rss_limit = 0.9 * host_mem_total_gb()  # 0 when /proc absent

        history = []
        interrupted = False
        # trajectory-exact resume: each epoch's dropout key and crop rng
        # derive from (seed, epoch) rather than a stream position, so a run
        # preempted at epoch N and resumed reproduces the uninterrupted
        # run's batches and masks exactly (bit-identical at num_workers=1;
        # pinned by tests/test_train.py::test_resume_trajectory_exact).
        base_key = key
        try:
            for epoch in range(start_epoch, max_epochs):
                for ldr in (train_loader, val_loader):
                    set_ep = getattr(ldr, "set_epoch", None)
                    if set_ep is not None:
                        set_ep(epoch)
                key = jax.random.fold_in(base_key, epoch)
                if epoch == profile_epoch:
                    jax.profiler.start_trace(str(self.run_dir / "profile"))
                t0 = time.perf_counter()
                params, opt_state, train_loss, key = self._train_epoch(
                    params, opt_state, train_loader, key
                )
                if epoch == profile_epoch:
                    jax.block_until_ready(params)
                    jax.profiler.stop_trace()
                    self.logger.log({"profile_dir": str(self.run_dir / "profile")})
                if self._preempt_requested:
                    signum = getattr(self, "_preempt_signum", None)
                    if signum is not None:
                        self.logger.log({"preempt_signal": signum})
                    # Trajectory-exact preemption: resume must continue from
                    # an EPOCH BOUNDARY — replaying an epoch on top of
                    # partially-advanced params double-applies its first
                    # steps and diverges from the uninterrupted run (caught
                    # live by the r4 exact-resume chaos soak). Two cases:
                    if self._epoch_completed:
                        # the epoch ran to completion before the flag check
                        # (always true under dispatch=epoch — a signal can't
                        # interrupt the single scan dispatch): checkpoint it
                        # as the boundary, losing nothing. Validation is
                        # skipped, matching the non-val refresh_last path.
                        trainable, _ = self.model.split_params(params)
                        self.ckpt.refresh_last(
                            epoch,
                            trainable,
                            meta=self._ckpt_meta(),
                            opt_state=opt_state,
                            train_state=train_state_snapshot(),
                        )
                    # else: mid-epoch stop — params are NOT persisted; last/
                    # already holds the end-of-previous-epoch state
                    # (refreshed after every completed epoch), so resume
                    # redoes this epoch from that boundary bit-exactly; if
                    # no epoch completed yet, the exact redo is a fresh
                    # start.
                    last = self.ckpt.last_path
                    self.logger.log(
                        {
                            "preempted_at_epoch": epoch,
                            "epoch_completed": self._epoch_completed,
                            "resume_from": str(last)
                            if (last / "params.msgpack").exists()
                            else "fresh",
                        }
                    )
                    interrupted = True
                    break
                # validation cadence: every N epochs + always the last one
                # (train.val_every_n_epochs; non-val epochs still refresh
                # last/ so resume stays exact)
                val_n = max(1, tc.val_every_n_epochs)
                do_val = (epoch + 1) % val_n == 0 or epoch == max_epochs - 1
                metrics = self._val_epoch(params, val_loader) if do_val else {}
                metrics["train/loss"] = train_loss
                metrics["lr"] = get_learning_rate(opt_state)
                metrics["epoch"] = epoch
                metrics["time_s"] = time.perf_counter() - t0
                n_train_samples = len(train_loader) * tc.batch_size
                metrics["samples_per_s"] = round(
                    n_train_samples / max(metrics["time_s"], 1e-9), 2
                )
                self.logger.log(metrics)
                history.append(metrics)

                trainable, _ = self.model.split_params(params)
                if not do_val:
                    self.ckpt.refresh_last(
                        epoch,
                        trainable,
                        meta=self._ckpt_meta(),
                        opt_state=opt_state,
                        train_state=train_state_snapshot(),
                    )
                else:
                    monitored = metrics.get(self.monitor)
                    if monitored is None:
                        raise ValueError(
                            f"monitored metric {self.monitor!r} missing "
                            "from val metrics"
                        )

                    # plateau scheduler -> scale injected LR (no
                    # recompiles); cosine sets the LR per step instead
                    if tc.scheduler.type == "plateau" and self.scheduler.step(
                        monitored
                    ):
                        opt_state = set_learning_rate(
                            opt_state, base_lr * self.scheduler.scale
                        )

                    self.ckpt.step(
                        epoch,
                        monitored,
                        trainable,
                        meta=self._ckpt_meta(),
                        opt_state=opt_state,
                        train_state=train_state_snapshot(),
                    )

                    if self.early_stopping.step(monitored):
                        self.logger.log({"early_stop": epoch})
                        break

                rss = host_rss_gb() if rss_limit else 0.0
                if rss_limit and rss > rss_limit:
                    # last/ was just written by ckpt.step: resume is exact.
                    # interrupted=True keeps the requeue contract alive
                    # (the runner must NOT mark the run finished).
                    self.logger.log(
                        {
                            "recycle_at_epoch": epoch,
                            "host_rss_gb": round(rss, 2),
                            "host_rss_limit_gb": round(rss_limit, 2),
                        }
                    )
                    interrupted = True
                    break

        finally:
            for sig, prev in installed:
                signal.signal(sig, prev)
        self.model.params = params
        return {
            "params": params,
            "history": history,
            "interrupted": interrupted,
            "best_score": self.ckpt.best_score,
            "best_path": str(self.ckpt.best_path)
            if self.ckpt.best_path is not None
            else None,
        }
