"""Model wrapper: flax module + receptive-field geometry + loss semantics.

Role of the reference ``BaseSegmentationModel`` (``src/segma/models/base.py:
145-360``) re-cut for JAX: the wrapper is a thin, picklable description —
parameters live in explicit pytrees and all compute goes through pure
functions so entry points can ``jit``/``pjit`` them.

Loss parity notes:
- hydra models: per-head ``binary_cross_entropy_with_logits`` summed over
  heads, mean over (batch x windows) rows (``surgical_hydra.py:126-133``);
- multiclass models: softmax cross-entropy against multi-hot targets with
  optional class weights (``models/base.py:171-187``). The reference applies
  ``cross_entropy`` to already-softmaxed outputs (a double-softmax quirk);
  segma_tpu models return raw logits and use a proper CE — documented
  deviation, strictly better conditioned.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from segma_tpu.config import Config
from segma_tpu.models.geometry import ConvolutionSettings
from segma_tpu.utils.encoders import LabelEncoder

__all__ = [
    "ConvolutionSettings",
    "SegmentationModel",
    "bce_with_logits",
    "hydra_loss",
    "softmax_ce_loss",
]


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise numerically-stable binary cross-entropy with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def hydra_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hydra objective: per-label BCE means, summed across labels.

    Args:
        logits: (..., n_labels) raw head logits.
        targets: (..., n_labels) multi-hot.
        class_weights: optional (n_labels,) loss weights (role of the
            reference's ``weight_loss`` vector ``[0.4, 1, 1, ...]``,
            ``models/base.py:152-161`` — without its hardcoded-device bug).

    Returns:
        (total_loss scalar, per_label (n_labels,) losses)
    """
    elt = bce_with_logits(logits, targets)
    flat = elt.reshape(-1, elt.shape[-1])
    per_label = flat.mean(axis=0)
    if class_weights is not None:
        per_label = per_label * class_weights
    return per_label.sum(), per_label


def softmax_ce_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax cross-entropy against (possibly multi-hot) target rows,
    normalized like ``torch.nn.functional.cross_entropy`` with probabilistic
    targets and optional per-class weights."""
    return softmax_ce_loss_per_class(logits, targets, class_weights)[0]


def softmax_ce_loss_per_class(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(total, per_class) softmax CE — the per-class terms are the exact
    decomposition of the total (``per_class.sum() == total``): each class's
    summed -t*log p share over the common normalizer. Gives real per-label
    observability for multiclass models (the reference logs only the
    total)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    flat_lp = logp.reshape(-1, logp.shape[-1])
    flat_t = targets.reshape(-1, targets.shape[-1])
    if class_weights is not None:
        flat_t = flat_t * class_weights[None, :]
    # torch cross_entropy with probabilistic targets, reduction='mean':
    # mean over ROWS. Normalizing by target mass instead would scale the
    # loss (and the effective LR) with batch activity — half for
    # all-overlap rows, huge for mostly-silent batches.
    norm = flat_lp.shape[0]
    per_class = -(flat_t * flat_lp).sum(axis=0) / norm
    return per_class.sum(), per_class


def weighted_index_ce(
    logits: jnp.ndarray,
    class_ids: jnp.ndarray,
    class_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Softmax CE with class-INDEX targets and per-class weights,
    normalized like ``torch.nn.functional.cross_entropy(weight=w,
    reduction='mean')``: by ``sum(w[y_i])``, not by row count. Zero when
    no row's target class carries weight. Backs the powerset
    ``partial_loss`` metric (reference ``models/base.py:204-317``
    restricts the CE to single-label subset classes)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    row_nll = -jnp.take_along_axis(logp, class_ids[:, None], axis=1)[:, 0]
    row_w = class_weights[class_ids]
    return (row_w * row_nll).sum() / jnp.maximum(row_w.sum(), 1.0)


@dataclass
class SegmentationModel:
    """A segmentation model = flax module + geometry + objective.

    Attributes:
        name: registry name.
        module: flax module mapping raw waveforms (B, T) f32 -> frame logits
            (B, n_windows, n_labels) f32. Feature extraction (log-mel) runs
            inside the module, on device.
        conv_settings: receptive-field geometry linking output frames to
            sample indices.
        label_encoder: the label vocabulary.
        config: full framework config.
        loss_type: 'hydra' (per-label BCE) or 'multiclass' (softmax CE).
        frozen_prefixes: top-level param collections excluded from training
            and from checkpoints (pretrained encoders), mirroring the
            reference's frozen-encoder + checkpoint-exclusion behaviour
            (``hubert/surgical_hydra.py:203-216``).
    """

    name: str
    module: nn.Module
    conv_settings: ConvolutionSettings
    label_encoder: LabelEncoder
    config: Config
    loss_type: str = "hydra"
    frozen_prefixes: tuple[str, ...] = ()
    # optional (n_labels,) per-class loss weights
    class_weights: Any = None
    # powerset models: the PowersetEncoder driving subset<->label mapping;
    # module outputs subset logits, `inference_transform` marginalizes them
    # back to per-label logits so the decode pipeline is unchanged
    powerset: Any = None
    # populated by init_params / load
    params: Any = None
    # optional callable loading pretrained encoder params into a fresh tree
    pretrained_loader: Callable[[Any], Any] | None = field(default=None, repr=False)

    @property
    def n_labels(self) -> int:
        return len(self.label_encoder.base_labels)

    @property
    def n_windows(self) -> int:
        return self.conv_settings.n_windows(
            self.config.audio.chunk_duration_f,
            strict=self.config.audio.strict_frames,
        )

    def with_module(self, module: nn.Module) -> "SegmentationModel":
        """Copy of this model with a replaced flax module — e.g. one
        carrying a sequence-parallel ``mesh`` — sharing the same params
        (pure-function modules make this safe)."""
        import dataclasses

        return dataclasses.replace(self, module=module)

    # -- parameter management -------------------------------------------------
    def init_params(self, key: jax.Array) -> Any:
        """Initialize the full parameter tree (random heads; pretrained
        encoder weights grafted in when a loader is configured)."""
        wav = jnp.zeros((1, self.config.audio.chunk_duration_f), jnp.float32)
        # One compiled program, not op-by-op eager: with a seq/model mesh on
        # the module, eager init would execute each attention einsum as its
        # own 8-partition program on resharded arrays (collective soup; the
        # CPU backend's permute rendezvous is flaky under virtual-device
        # oversubscription). Jitted, XLA propagates the constraints and emits
        # zero collectives for the batch-1 init trace.
        init_fn = jax.jit(lambda k: self.module.init({"params": k}, wav, train=False))
        params = init_fn(key)["params"]
        if self.pretrained_loader is not None:
            params = self.pretrained_loader(params)
        self.params = params
        return params

    def trainable_mask(self, params: Any | None = None) -> Any:
        """Pytree of bools: True where the optimizer should update."""
        params = params if params is not None else self.params

        def mask_subtree(path_head: str, subtree):
            trainable = path_head not in self.frozen_prefixes
            return jax.tree.map(lambda _: trainable, subtree)

        return {k: mask_subtree(k, v) for k, v in params.items()}

    def split_params(self, params: Any | None = None) -> tuple[dict, dict]:
        """(trainable, frozen) top-level split used by checkpointing."""
        params = params if params is not None else self.params
        trainable = {
            k: v for k, v in params.items() if k not in self.frozen_prefixes
        }
        frozen = {k: v for k, v in params.items() if k in self.frozen_prefixes}
        return trainable, frozen

    # -- forward / loss --------------------------------------------------------
    def apply(
        self,
        params: Any,
        wav: jnp.ndarray,
        train: bool = False,
        rngs: dict | None = None,
    ) -> jnp.ndarray:
        """Forward pass: (B, T) waveforms -> (B, n_windows, n_labels) logits."""
        return self.module.apply({"params": params}, wav, train=train, rngs=rngs)

    def inference_transform(self, logits: jnp.ndarray) -> jnp.ndarray:
        """Map raw module outputs to per-base-label logits for decode.

        Identity for hydra/multiclass; powerset models marginalize subset
        probabilities back to per-label probabilities and re-logit them so
        thresholding/decoding stays identical downstream.
        """
        if self.powerset is None:
            return logits
        member = jnp.asarray(self.powerset.membership_matrix())
        probs = jax.nn.softmax(logits, axis=-1)
        marg = jnp.clip(probs @ member, 1e-7, 1 - 1e-7)
        return jnp.log(marg) - jnp.log1p(-marg)

    def loss(
        self, logits: jnp.ndarray, targets: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(total, per_label) training loss for this model's objective.

        ``targets`` are always (B, T, n_base) multi-hot from the data
        pipeline; powerset models convert them to subset class ids here.
        """
        weights = (
            jnp.asarray(self.class_weights, jnp.float32)
            if self.class_weights is not None
            else None
        )
        if self.loss_type == "powerset":
            lut = jnp.asarray(self.powerset.multihot_lut())
            bits = 2 ** jnp.arange(targets.shape[-1], dtype=jnp.int32)
            masks = (targets > 0.5).astype(jnp.int32) @ bits  # (B, T)
            class_ids = lut[masks]
            onehot = jax.nn.one_hot(class_ids, logits.shape[-1])
            total = softmax_ce_loss(logits, onehot)
            # per-label DIAGNOSTIC: BCE of the marginalized per-base-label
            # probabilities vs the multi-hot targets (the subset CE itself
            # has no per-base-label decomposition; this is what
            # val/loss_<label> reports for powerset models)
            marg_logits = self.inference_transform(logits)
            elt = bce_with_logits(marg_logits, targets)
            per_label = elt.reshape(-1, elt.shape[-1]).mean(axis=0)
            return total, per_label
        if self.loss_type == "hydra":
            return hydra_loss(logits, targets, class_weights=weights)
        return softmax_ce_loss_per_class(logits, targets, class_weights=weights)
