"""Config system: YAML -> per-model auto-merge -> dotlist CLI overrides ->
strict dataclass validation.

Capability parity with ``src/segma/config/base.py:10-219`` without dacite or
OmegaConf: ``_from_dict`` performs strict, recursive dataclass instantiation
with union matching, and ``_apply_dotlist`` implements
``model.config.encoder_layers=[1,3]``-style CLI overrides (values parsed as
YAML).
"""

from __future__ import annotations

import dataclasses
import types
import typing
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any, Literal, Union

import yaml


class ConfigError(ValueError):
    """Raised on invalid / non-strict config input."""


@dataclass
class BaseConfig:
    def as_dict(self) -> dict:
        return asdict(self)

    def save(self, file_path: str | Path) -> None:
        """Round-trip the config to a YAML file (experiment snapshots)."""
        file_path = Path(file_path)
        try:
            with file_path.open("w") as f:
                yaml.dump(asdict(self), f, default_flow_style=False, sort_keys=False)
        except IOError as e:
            raise IOError(f"Failed to write configuration to {file_path}: {e}")


# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------


@dataclass
class WandbConfig(BaseConfig):
    offline: bool
    project: str
    name: str


@dataclass
class DataConfig(BaseConfig):
    dataset_path: str
    classes: list[str]
    dataset_multiplier: float = 1.0


@dataclass
class AudioConfig(BaseConfig):
    chunk_duration_s: float
    sample_rate: int
    strict_frames: bool
    # Bit-faithful tail compat: emit a FULL chunk of frames for the
    # >=400-sample end-of-file tail, computed from zero-padding, exactly as
    # the reference's Whisper tail pass does (reference inference.py:191-207
    # forwards the padded tail and the model truncates to a full chunk's
    # n_windows). Default False: only frames backed by real audio.
    reference_tail: bool = False

    @property
    def chunk_duration_f(self) -> int:
        """Number of samples in one chunk."""
        return int(self.chunk_duration_s * self.sample_rate)


@dataclass
class DataloaderConfig(BaseConfig):
    num_workers: int


@dataclass
class SchedulerConfig(BaseConfig):
    patience: int
    # "plateau" (reference parity: ReduceLROnPlateau on the monitored
    # metric) or "cosine" (segma_tpu extension: per-step warmup + cosine
    # decay to min_lr_ratio * lr over the full run)
    type: str = "plateau"
    warmup_steps: int = 0
    min_lr_ratio: float = 0.0


@dataclass
class LSTMConfig(BaseConfig):
    hidden_size: int
    num_layers: int
    bidirectional: bool
    dropout: float
    # lax.scan unroll factor for the sequential LSTM loop: unrolling lets
    # XLA fuse consecutive per-step matmuls/elementwise into fewer, larger
    # kernels (the step math is unchanged — same ops, same order). Measured
    # on the chip at (32, 199, 512): see BENCH_REPORT.md LSTM-unroll row.
    unroll: int = 1


@dataclass
class WhisperidouConfig(BaseConfig):
    encoder: str
    linear: list[int]
    classifier: int
    # run the encoder on just the chunk's frames instead of Whisper's fixed
    # 30 s context (~7.5x less attention/MLP work at 4 s; numerics differ
    # slightly from the padded reference behaviour)
    fast_context: bool = False


@dataclass
class WhisperimaxConfig(BaseConfig):
    encoder: str
    lstm: LSTMConfig
    linear: list[int]
    classifier: int
    # run the encoder on just the chunk's frames instead of Whisper's fixed
    # 30 s context (~7.5x less attention/MLP work at 4 s; numerics differ
    # slightly from the padded reference behaviour)
    fast_context: bool = False


@dataclass
class SurgicalWhisperConfig(BaseConfig):
    encoder: str
    encoder_layers: list[int]
    reduction: Literal["average", "weighted"]
    linear: list[int]
    classifier: int
    # run the encoder on just the chunk's frames instead of Whisper's fixed
    # 30 s context (~7.5x less attention/MLP work at 4 s; numerics differ
    # slightly from the padded reference behaviour)
    fast_context: bool = False


@dataclass
class HydraWhisperConfig(BaseConfig):
    encoder: str
    lstm: LSTMConfig
    classifier: int
    # run the encoder on just the chunk's frames instead of Whisper's fixed
    # 30 s context (~7.5x less attention/MLP work at 4 s; numerics differ
    # slightly from the padded reference behaviour)
    fast_context: bool = False


@dataclass
class SurgicalHydraConfig(BaseConfig):
    encoder: str
    encoder_layers: list[int]
    reduction: Literal["average", "weighted"]
    lstm: LSTMConfig
    classifier: int
    # run the encoder on just the chunk's frames instead of Whisper's fixed
    # 30 s context (~7.5x less attention/MLP work at 4 s; numerics differ
    # slightly from the padded reference behaviour)
    fast_context: bool = False


@dataclass
class SurgicalHubertHydraConfig(BaseConfig):
    wav_encoder: str
    encoder_layers: list[int]
    reduction: str
    classifier: int
    freeze_encoder: bool = False


@dataclass
class ConvVADConfig(BaseConfig):
    """TPU-first conv-frontend VAD/segmentation model (no pretrained encoder).

    New in segma_tpu: a purely convolutional mel-frontend model whose rf_step
    matches the Whisper path (320 samples / 20 ms) so it drops into the same
    chunk geometry; used as the speed-of-light inference baseline.
    """

    hidden: int = 256
    depth: int = 4
    dtype: str = "bf16"  # compute dtype: bf16 | f32
    # powerset_vad only: max simultaneous labels modeled per subset class
    max_set_size: int = 2


@dataclass
class SincNetHydraConfig(BaseConfig):
    """Learnable band-pass (SincNet) frontend + BiLSTM + hydra heads.

    The reference declares a ``SincNetConfig`` (``config/base.py:83-85``)
    but ships no SincNet model; segma_tpu implements it
    (``segma_tpu/models/sincnet.py``). ``stride`` keeps the reference's
    field name; rf_step = 32 * stride (320 = 20 ms grid at default 10).
    """

    stride: int = 10
    filters: int = 80
    kernel_size: int = 251
    hidden: int = 128
    lstm: LSTMConfig | None = None
    dtype: str = "bf16"  # compute dtype: bf16 | f32


@dataclass
class ModelConfig(BaseConfig):
    name: str
    chkp_path: str | None = None
    config: (
        None
        | WhisperidouConfig
        | WhisperimaxConfig
        | SurgicalWhisperConfig
        | HydraWhisperConfig
        | SurgicalHydraConfig
        | SurgicalHubertHydraConfig
        | SincNetHydraConfig
        | ConvVADConfig
    ) = None


# model.name -> its config dataclass. Used to resolve the ``config`` union
# by NAME instead of structural arbitration: all-default dataclasses (e.g.
# ConvVADConfig vs SincNetHydraConfig) structurally accept the same minimal
# dicts ({hidden: 256}, {}), which strict_unions_match would reject as
# ambiguous even though the model name pins the intent.
_MODEL_CONFIG_TYPES: dict[str, type] = {
    "whisperidou": WhisperidouConfig,
    "whisperimax": WhisperimaxConfig,
    "surgical_whisper": SurgicalWhisperConfig,
    "hydra_whisper": HydraWhisperConfig,
    "surgical_hydra": SurgicalHydraConfig,
    "surgical_hubert_hydra": SurgicalHubertHydraConfig,
    "surgical_wavlm_hydra": SurgicalHubertHydraConfig,
    "sincnet_hydra": SincNetHydraConfig,
    "conv_vad": ConvVADConfig,
    "powerset_vad": ConvVADConfig,
}


@dataclass
class TrainConfig(BaseConfig):
    lr: float
    batch_size: int
    max_epochs: int
    validation_metric: str
    extra_val_metrics: list[str]
    profiler: str | None

    dataloader: DataloaderConfig
    scheduler: SchedulerConfig
    seed: int | None = None
    precision: str = "bf16"  # compute dtype on TPU: bf16 | f32
    # per-step train logging cadence (reference: Lightning on_step logs of
    # the total and per-head losses, models/base.py:171-187). 0 disables.
    # Each step log forces a device sync, so keep the cadence coarse.
    log_every_n_steps: int = 50
    # accumulate gradients over k micro-batches before each optimizer
    # update (effective batch = k * batch_size); 1 = off
    grad_accum_steps: int = 1
    early_stop_patience: int = 10
    save_top_k: int = 5
    # rematerialize encoder transformer layers in the backward pass
    # (jax.checkpoint): trades compute for activation memory when an
    # encoder is trainable
    remat: bool = False
    # optional per-class loss weights (reference weight_loss vector)
    class_weights: list[float] | None = None
    # numerical-sanity debug mode (the TPU analog of the reference's
    # deterministic-algorithms switch, utils/__init__.py:17-18): aborts on
    # the first NaN produced by any jitted computation
    debug_nans: bool = False
    # host->device encoding of train/val batches: "f32" ships normalized
    # float32; "int16" ships the raw PCM16 crop and normalizes ON DEVICE
    # (half the bytes per batch; bit-identical for 16-bit PCM sources —
    # x * 2^-15 on device equals the host division exactly). Samples whose
    # source is not 16-bit PCM fall back to f32 transparently.
    transport: str = "f32"
    # "host" ships each batch's waveforms from the host; "device" uploads
    # the whole subset's audio to HBM ONCE (int16 when all sources are
    # 16-bit PCM) and ships only (crop offsets, labels) per batch — the
    # jitted steps gather crops on device. Bit-identical trajectories
    # (tests/test_device_cache.py). Multi-host composes: each controller
    # uploads its file shard as one row of a global buffer and crops
    # gather locally inside shard_map (tests/test_multihost.py). Biggest
    # win when the host->device link is slow or leaky (CLAUDE.md relay
    # retention). "auto" (the default) picks per subset from header
    # probes alone: "device" when the projected per-chip buffer fits the
    # remaining device_cache_budget_gb, stays under the int32
    # gather-offset range (2^31 samples), and — single-controller only,
    # since MemAvailable must not steer a cross-host decision — fits
    # available host RAM (building decodes ~1x the buffer on the host
    # before the upload); else "host" (the decision is logged, and is
    # bit-deterministic across controllers). Auto never errors. Within
    # budget, auto IS the device path — same code, same pinned
    # bit-identical trajectory — so the measured ~5x epoch-time win on
    # transfer-bound models is on by default; set "host" to opt out.
    # Batch contract: device-path batches carry {"offsets", "y"}; host-path
    # batches carry {"x", "y"} (loaders.BatchContractError on a mismatch).
    data_cache: str = "auto"
    # data_cache=auto HBM budget for ALL subsets' audio buffers JOINTLY
    # (train + val), leaving the rest of the chip for params/optimizer/
    # activations (v5e: 16 GB). Building also needs up to this much host
    # RAM transiently. Explicit data_cache=device ignores this (you asked,
    # it uploads).
    device_cache_budget_gb: float = 12.0
    # "step" dispatches one jitted call per batch; "epoch" (requires
    # data_cache=device) runs the WHOLE epoch as one lax.scan dispatch —
    # every batch's (offsets, labels) upload in one transfer and zero
    # per-step host round-trips. Same math and rng stream as "step";
    # XLA fuses the scan body slightly differently, so trajectories are
    # ulp-equivalent rather than bit-exact (tests/test_device_cache.py).
    # Trade-offs: per-step loss logging arrives at epoch end, and SIGTERM
    # preemption is honored at epoch granularity (the in-flight scan
    # completes first).
    dispatch: str = "step"
    # self-recycle guard: when host RSS exceeds this many GB at an epoch
    # boundary, stop with interrupted=True (last/ already holds the exact
    # resume state) so the requeue loop restarts the process instead of
    # the kernel OOM killer. null = auto (90% of MemTotal); 0 disables.
    host_rss_limit_gb: float | None = None
    # run validation (and therefore scoring/top-k/scheduler/early-stop
    # decisions) every N epochs instead of every epoch; the final epoch
    # always validates and last/ stays fresh every epoch (exact resume).
    val_every_n_epochs: int = 1


@dataclass
class MeshConfig(BaseConfig):
    """Device-mesh layout for SPMD execution (segma_tpu addition; the
    reference is single-GPU only, ``scripts/train.py:163-166``)."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1
    # sequence parallelism: shard the TIME axis of encoder activations
    # (whisper's padded 1500-position context) over this many chips —
    # attention/MLP compute per chip drops accordingly and XLA inserts the
    # collectives around attention. For latency-bound serving of single
    # requests; throughput work scales better over `data` (windows are
    # embarrassingly parallel, SURVEY.md §5.7).
    seq: int = 1


@dataclass
class Config(BaseConfig):
    wandb: WandbConfig
    data: DataConfig
    audio: AudioConfig
    model: ModelConfig
    train: TrainConfig
    mesh: MeshConfig = field(default_factory=MeshConfig)


# ---------------------------------------------------------------------------
# Strict dict -> dataclass instantiation (dacite-equivalent, built here)
# ---------------------------------------------------------------------------


def _type_matches(value: Any, tp: Any) -> bool:
    """Best-effort strict type check used for union arbitration."""
    origin = typing.get_origin(tp)
    if tp is typing.Any:
        return True
    if tp is None or tp is type(None):
        return value is None
    if origin is Literal:
        return value in typing.get_args(tp)
    if origin in (Union, types.UnionType):
        return any(_type_matches(value, a) for a in typing.get_args(tp))
    if origin in (list, tuple):
        if not isinstance(value, (list, tuple)):
            return False
        args = typing.get_args(tp)
        if not args:
            return True
        return all(_type_matches(v, args[0]) for v in value)
    if origin is dict:
        return isinstance(value, dict)
    if dataclasses.is_dataclass(tp):
        if isinstance(value, tp):  # already constructed (name-resolved)
            return True
        return isinstance(value, dict) and _dataclass_accepts(tp, value)
    if tp is float:
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if tp is int:
        return isinstance(value, int) and not isinstance(value, bool)
    if tp is bool:
        return isinstance(value, bool)
    if isinstance(tp, type):
        return isinstance(value, tp)
    return True


def _dataclass_accepts(cls, data: dict) -> bool:
    """True iff ``data`` strictly matches dataclass ``cls`` (keys and types)."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    if any(k not in fields for k in data):
        return False
    hints = typing.get_type_hints(cls)
    for name, f in fields.items():
        if name in data:
            if not _type_matches(data[name], hints[name]):
                return False
        elif (
            f.default is dataclasses.MISSING
            and f.default_factory is dataclasses.MISSING
        ):
            return False
    return True


def _convert(value: Any, tp: Any, path: str) -> Any:
    origin = typing.get_origin(tp)
    if tp is typing.Any:
        return value
    if tp is None or tp is type(None):
        if value is not None:
            raise ConfigError(f"{path}: expected null, got {value!r}")
        return None
    if origin is Literal:
        if value not in typing.get_args(tp):
            raise ConfigError(
                f"{path}: {value!r} not one of {typing.get_args(tp)}"
            )
        return value
    if origin in (Union, types.UnionType):
        matches = [a for a in typing.get_args(tp) if _type_matches(value, a)]
        if len(matches) == 0:
            raise ConfigError(f"{path}: {value!r} matches no member of {tp}")
        if len(matches) > 1:
            # strict_unions_match semantics: ambiguity is an error unless all
            # matches collapse to the same terminal type.
            if len(set(matches)) > 1 and any(
                dataclasses.is_dataclass(m) for m in matches
            ):
                raise ConfigError(
                    f"{path}: {value!r} ambiguously matches several union "
                    f"members: {matches}"
                )
        return _convert(value, matches[0], path)
    if origin in (list, tuple):
        if not isinstance(value, (list, tuple)):
            # without this, a string iterates into characters ('speech' ->
            # ['s','p','e','e','c','h']) and a scalar raises a bare
            # TypeError instead of naming the bad path
            raise ConfigError(
                f"{path}: expected a list, got {value!r} "
                "(forgot the [] brackets?)"
            )
        args = typing.get_args(tp)
        elem_tp = args[0] if args else typing.Any
        seq = [
            _convert(v, elem_tp, f"{path}[{i}]") for i, v in enumerate(value)
        ]
        return tuple(seq) if origin is tuple else seq
    if dataclasses.is_dataclass(tp):
        if isinstance(value, tp):  # already constructed (name-resolved)
            return value
        if not isinstance(value, dict):
            raise ConfigError(f"{path}: expected mapping for {tp.__name__}")
        return _from_dict(tp, value, path)
    if tp is float and isinstance(value, int) and not isinstance(value, bool):
        return float(value)
    if not _type_matches(value, tp):
        raise ConfigError(f"{path}: {value!r} is not a valid {tp}")
    return value


def _from_dict(cls: type, data: dict, path: str = "config") -> Any:
    """Strict recursive dataclass instantiation (unknown keys are errors)."""
    if cls is ModelConfig:
        # resolve the config union by model name, sidestepping structural
        # ambiguity between all-default config dataclasses
        known = _MODEL_CONFIG_TYPES.get(data.get("name"))
        if known is not None and isinstance(data.get("config"), dict):
            data = {
                **data,
                "config": _from_dict(known, data["config"], f"{path}.config"),
            }
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = [k for k in data if k not in fields]
    if unknown:
        raise ConfigError(f"{path}: unknown keys {unknown} for {cls.__name__}")
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for name, f in fields.items():
        if name in data:
            kwargs[name] = _convert(data[name], hints[name], f"{path}.{name}")
        elif (
            f.default is dataclasses.MISSING
            and f.default_factory is dataclasses.MISSING
        ):
            raise ConfigError(f"{path}.{name}: missing required field")
    return cls(**kwargs)


# ---------------------------------------------------------------------------
# Dotlist CLI overrides (omegaconf-equivalent, built here)
# ---------------------------------------------------------------------------


def _deep_merge(base: dict, override: dict) -> dict:
    """Recursively merge ``override`` into ``base`` (dicts merge key-wise,
    anything else replaces). Matches omegaconf's dotlist-over-YAML merge
    semantics (reference ``config/base.py:191-219``): a CLI
    ``model.config.lstm.unroll=8`` must override ONE nested field, not
    replace the whole ``lstm`` subtree from the per-model YAML."""
    out = dict(base)
    for key, value in override.items():
        if (
            key in out
            and isinstance(out[key], dict)
            and isinstance(value, dict)
        ):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = value
    return out


def _apply_dotlist(config_d: dict, dotlist: list[str]) -> dict:
    """Apply ``a.b.c=value`` overrides in place; values parsed as YAML."""
    for item in dotlist:
        if "=" not in item:
            raise ConfigError(
                f"CLI override {item!r} is not of the form key.path=value"
            )
        key_path, _, raw = item.partition("=")
        value = yaml.safe_load(raw) if raw != "" else None
        node = config_d
        keys = key_path.strip().split(".")
        for key in keys[:-1]:
            node = node.setdefault(key, {})
            if not isinstance(node, dict):
                raise ConfigError(f"cannot override non-mapping node {key!r}")
        node[keys[-1]] = value
    return config_d


# ---------------------------------------------------------------------------
# Loader
# ---------------------------------------------------------------------------

_CONFIG_DIR = Path(__file__).parent


def load_config(config_path: Path | str, cli_extra_args: list[str] = []) -> Config:
    """Load a YAML config, auto-merging the per-model hparam YAML when
    ``model.config`` is absent, then applying dotlist CLI overrides, then
    validating strictly into the ``Config`` dataclass tree.

    Mirrors reference semantics (``config/base.py:191-219``) but resolves the
    per-model YAML relative to this package, not the CWD.
    """
    config_path = Path(config_path)
    with config_path.open("r") as f:
        config_d = yaml.safe_load(f)

    # whether the YAML itself carried a model.config (CLI overrides may
    # create a partial one, which still needs the per-model defaults)
    had_config = isinstance(config_d.get("model", {}).get("config"), dict)
    # overrides first, so a CLI `model.name=...` selects the right
    # per-model YAML below
    config_d = _apply_dotlist(config_d, list(cli_extra_args))
    if not had_config:
        name = config_d["model"]["name"]
        model_c_p = _CONFIG_DIR / f"{name}.yml"
        if not model_c_p.exists():
            raise ConfigError(
                f"Model config dict of model {name}, could not be loaded"
            )
        with model_c_p.open("r") as f:
            merged = yaml.safe_load(f)
        # CLI-supplied model.config.* values win over per-model defaults,
        # deep-merged so a nested override keeps its siblings
        partial = config_d["model"].get("config") or {}
        config_d["model"]["config"] = _deep_merge(merged, partial)
    cfg = _from_dict(Config, config_d)
    _validate_mesh_seq(cfg)
    return cfg


# model families whose encoder time axis can shard (whisper's conv
# frontend halves an even mel grid; the hubert/wavlm/sincnet stacks emit
# ODD time lengths at every chunk size, so seq constraints always degrade
# to replication — SCALING.md has the analysis)
_SEQ_SHARDABLE_MODELS = frozenset(
    {"whisperidou", "whisperimax", "surgical_whisper", "hydra_whisper",
     "surgical_hydra"}
)


def _validate_mesh_seq(cfg: "Config") -> None:
    """Reject unsatisfiable ``mesh.seq`` at load time (round-3 VERDICT
    item 9: a seq that cannot divide the encoder time grid silently
    degraded to replication with only a trace-time warning)."""
    seq = cfg.mesh.seq
    if seq <= 1:
        return
    name = cfg.model.name
    if name not in _SEQ_SHARDABLE_MODELS:
        raise ConfigError(
            f"mesh.seq={seq}: sequence parallelism is only available for "
            f"the whisper family {sorted(_SEQ_SHARDABLE_MODELS)}; "
            f"'{name}' emits odd encoder time lengths at every chunk size, "
            "so its time axis cannot shard (see SCALING.md) — use "
            "mesh.data/mesh.model instead"
        )
    if getattr(cfg.model.config, "fast_context", False):
        grid = int(round(cfg.audio.chunk_duration_f / 320))
        ctx = f"fast_context time grid {grid} (chunk_f/320)"
    else:
        grid = 1500
        ctx = "padded 30 s context time grid 1500"
    if grid % seq:
        divisors = [d for d in range(2, min(grid, 33)) if grid % d == 0]
        raise ConfigError(
            f"mesh.seq={seq} does not divide the whisper encoder's {ctx}: "
            "the sharding would silently degrade to seq-fold replication. "
            f"Valid seq values here: {divisors}"
        )
