"""SPMD tests on the virtual 8-device CPU mesh: dp+tp training step,
mesh-sharded inference parity, sharding rules."""

from pathlib import Path

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from segma_tpu.config import load_config
from segma_tpu.inference import InferencePipeline
from segma_tpu.models import Models
from segma_tpu.parallel.mesh import make_mesh, shard_batch
from segma_tpu.parallel.sharding import param_shardings, shard_params, spec_for_path
from segma_tpu.utils.encoders import MultiLabelEncoder

CONFIG_DIR = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"


def _require_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_make_mesh_shapes():
    _require_8_devices()
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "seq": 1, "model": 2}
    mesh = make_mesh(data=-1, model=2)
    assert mesh.shape == {"data": 4, "seq": 1, "model": 2}
    mesh = make_mesh(data=-1, seq=2, model=2)
    assert mesh.shape == {"data": 2, "seq": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_tp_rules_match_encoder_paths():
    # whisper paths
    class K:
        def __init__(self, key):
            self.key = key

    def path(*parts):
        return tuple(K(p) for p in parts)

    assert spec_for_path(
        path("encoder", "layers_0", "self_attn", "q_proj", "kernel")
    ) == P(None, "model")
    assert spec_for_path(
        path("encoder", "layers_0", "self_attn", "out_proj", "kernel")
    ) == P("model", None)
    assert spec_for_path(path("encoder", "layers_0", "fc1", "kernel")) == P(
        None, "model"
    )
    # hubert paths
    assert spec_for_path(
        path("encoder", "layers_1", "attention", "v_proj", "kernel")
    ) == P(None, "model")
    assert spec_for_path(
        path("encoder", "layers_1", "output_dense", "kernel")
    ) == P("model", None)
    # replicated leftovers
    assert spec_for_path(path("heads", "kernel")) == P()
    assert spec_for_path(path("encoder", "conv1", "kernel")) == P()


@pytest.fixture(scope="module")
def tp_model():
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_hydra",
            "model.config.encoder=missing_tiny",
            "model.config.lstm={hidden_size: 16, num_layers: 1, bidirectional: true, dropout: 0.0}",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models["surgical_hydra"](enc, cfg)
    from segma_tpu.models.whisper.encoder import WhisperEncoderConfig

    model.module = model.module.clone(
        enc_cfg=WhisperEncoderConfig(d_model=64, n_heads=2, n_layers=2, ffn_dim=128)
    )
    model.init_params(jax.random.key(0))
    return model


def test_shard_params_places_tp(tp_model):
    _require_8_devices()
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(tp_model.params, mesh)
    q = shardings["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert q.spec == P(None, "model")
    placed = shard_params(tp_model.params, mesh)
    qk = placed["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    # sharded over the model axis: each shard holds half the columns
    assert qk.sharding.spec == P(None, "model")


def test_dp_tp_train_step(tp_model):
    """Full train step over a 4x2 (data x model) mesh executes and returns a
    finite loss with params still correctly sharded."""
    _require_8_devices()
    from segma_tpu.train import make_optimizer, make_train_step

    import jax.numpy as jnp

    mesh = make_mesh(data=4, model=2)
    optimizer = make_optimizer(tp_model, 1e-3)
    train_step = make_train_step(tp_model, optimizer)

    # deep copy: the train step donates its inputs, and device_put may alias
    # the fixture's buffers
    params = shard_params(jax.tree.map(jnp.array, tp_model.params), mesh)
    opt_state = jax.jit(optimizer.init)(params)

    batch = shard_batch(
        {
            "x": np.random.default_rng(0)
            .standard_normal((8, 16_000))
            .astype(np.float32),
            "y": np.zeros((8, 49, 4), np.float32),
        },
        mesh,
    )
    params, opt_state, loss, per_label = train_step(
        params, opt_state, batch, jax.random.key(0)
    )
    assert np.isfinite(float(loss))
    qk = params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, "model")


def test_mesh_sharded_inference_matches_single_device(tp_model):
    """Window-axis-sharded inference must produce the same logits."""
    _require_8_devices()
    mesh = make_mesh(data=4, model=2)
    audio = (
        np.random.default_rng(1).standard_normal(50_000) * 0.1
    ).astype(np.float32)

    single = InferencePipeline(tp_model, tp_model.params, batch_size=4)
    got_single = single.logits_for_audio(audio)

    sharded = InferencePipeline(tp_model, tp_model.params, batch_size=4, mesh=mesh)
    got_sharded = sharded.logits_for_audio(audio)

    assert got_single.shape == got_sharded.shape
    np.testing.assert_allclose(got_single, got_sharded, rtol=2e-4, atol=2e-5)


def test_dp_sp_tp_train_step_and_parity(tp_model):
    """Sequence parallelism: the full train step over a 2x2x2
    (data x seq x model) mesh — with the whisper encoder's per-layer
    time-axis constraints active — executes, and its loss matches the
    unsharded step (the constraints only move data, never change math)."""
    _require_8_devices()
    import jax.numpy as jnp

    from segma_tpu.train import make_optimizer, make_train_step

    mesh = make_mesh(data=2, seq=2, model=2)
    sp_model = tp_model.with_module(tp_model.module.clone(mesh=mesh))
    optimizer = make_optimizer(sp_model, 1e-3)

    batch_np = {
        "x": np.random.default_rng(0)
        .standard_normal((8, 16_000))
        .astype(np.float32),
        "y": np.zeros((8, 49, 4), np.float32),
    }

    # unsharded reference loss (same params, no mesh on the module)
    ref_step = make_train_step(tp_model, optimizer)
    ref_params = jax.tree.map(jnp.array, tp_model.params)
    ref_opt = jax.jit(optimizer.init)(ref_params)
    _, _, ref_loss, _ = ref_step(
        ref_params, ref_opt, jax.tree.map(jnp.asarray, batch_np), jax.random.key(0)
    )

    sp_step = make_train_step(sp_model, optimizer)
    params = shard_params(jax.tree.map(jnp.array, tp_model.params), mesh)
    opt_state = jax.jit(optimizer.init)(params)
    params, opt_state, loss, _ = sp_step(
        params, opt_state, shard_batch(batch_np, mesh), jax.random.key(0)
    )
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_seq_sharded_inference_matches_single_device(tp_model):
    """Latency-mode mesh (seq=4, model=2): encoder time axis sharded; the
    logits must match the single-device pipeline."""
    _require_8_devices()
    mesh = make_mesh(data=1, seq=4, model=2)
    sp_model = tp_model.with_module(tp_model.module.clone(mesh=mesh))
    audio = (
        np.random.default_rng(1).standard_normal(50_000) * 0.1
    ).astype(np.float32)

    single = InferencePipeline(tp_model, tp_model.params, batch_size=4)
    got_single = single.logits_for_audio(audio)

    sharded = InferencePipeline(
        sp_model, tp_model.params, batch_size=4, mesh=mesh
    )
    got_sharded = sharded.logits_for_audio(audio)

    assert got_single.shape == got_sharded.shape
    np.testing.assert_allclose(got_single, got_sharded, rtol=2e-4, atol=2e-5)


def test_predict_cli_mesh_end_to_end(tmp_path, synthetic_dataset):
    """SURVEY §7 step 8 reachable from the user-facing CLI: the predict
    entry point with --mesh auto (8-device CPU mesh) writes RTTMs
    byte-identical to the single-device run."""
    _require_8_devices()
    import yaml

    from segma_tpu.checkpoint import save_params
    from segma_tpu.config import load_config
    from segma_tpu.inference import main as predict_main
    from segma_tpu.models import Models
    from segma_tpu.utils.encoders import MultiLabelEncoder

    config_dir = Path(__file__).resolve().parent.parent / "segma_tpu" / "config"
    cfg = load_config(
        config_dir / "default.yml",
        [
            "model.name=conv_vad",
            "model.config={hidden: 32, depth: 1, dtype: f32}",
            "audio.chunk_duration_s=1.0",
        ],
    )
    model = Models["conv_vad"](MultiLabelEncoder(cfg.data.classes), cfg)
    params = model.init_params(jax.random.key(3))
    trainable, _ = model.split_params(params)
    ckpt = save_params(tmp_path / "ckpt", trainable)
    cfg_path = tmp_path / "config.yml"
    with cfg_path.open("w") as f:
        yaml.dump(cfg.as_dict(), f)

    def run(mesh_flag: str, out: Path) -> dict[str, str]:
        predict_main(
            [
                "--config", str(cfg_path),
                "--wavs", str(synthetic_dataset / "wav"),
                "--uris", str(synthetic_dataset / "test.txt"),
                "--checkpoint", str(ckpt),
                "--output", str(out),
                "--batch_size", "4",
                "--mesh", mesh_flag,
            ]
        )
        return {
            p.name: p.read_text()
            for p in sorted((out / "raw_rttm").glob("*.rttm"))
        }

    single = run("off", tmp_path / "single")
    sharded = run("auto", tmp_path / "sharded")
    assert single and single == sharded


def test_maybe_init_distributed_noop(monkeypatch):
    """Single-host environments must be a clean no-op."""
    from segma_tpu.parallel.distributed import maybe_init_distributed, process_shard

    monkeypatch.delenv("SEGMA_TPU_MULTIHOST", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert maybe_init_distributed() is False
    # single process: shard = identity
    assert process_shard([1, 2, 3]) == [1, 2, 3]
    assert process_shard([1, 2, 3, 4], process_index=0) == [1, 2, 3, 4]


def test_seq_config_builds_without_matching_devices(tp_model):
    """A config trained with mesh.seq>1 must still construct (and run
    meshless) when the visible devices don't fit the layout — e.g.
    single-chip serving of a pod-trained config (regression: round-2
    review; build_whisper_model used to raise in make_mesh)."""
    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            "model.name=surgical_hydra",
            "model.config.encoder=missing_tiny",
            "model.config.lstm={hidden_size: 16, num_layers: 1, "
            "bidirectional: true, dropout: 0.0}",
            "audio.chunk_duration_s=1.0",
            "train.precision=f32",
            "mesh.seq=3",  # 8 CPU devices % (3*1) != 0 -> no mesh baked
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with pytest.warns(UserWarning):
        model = Models["surgical_hydra"](enc, cfg)
    assert getattr(model.module, "mesh", None) is None


def test_meshless_pipeline_strips_module_mesh(tp_model):
    """InferencePipeline without a mesh over a module that baked seq
    constraints in at build time: the module mesh is stripped so the
    jitted program stays single-device; logits match the plain model."""
    _require_8_devices()
    mesh = make_mesh(data=2, seq=2, model=2)
    sp_model = tp_model.with_module(tp_model.module.clone(mesh=mesh))
    audio = (
        np.random.default_rng(7).standard_normal(20_000) * 0.1
    ).astype(np.float32)

    plain = InferencePipeline(tp_model, tp_model.params, batch_size=4)
    stripped = InferencePipeline(sp_model, tp_model.params, batch_size=4)
    assert getattr(stripped.model.module, "mesh", None) is None
    np.testing.assert_allclose(
        plain.logits_for_audio(audio),
        stripped.logits_for_audio(audio),
        rtol=1e-6,
        atol=1e-6,
    )


def test_resume_under_mesh_restores_sharded_opt_state(tp_model, tmp_path):
    """Restoring optimizer moments from a checkpoint must re-place them on
    the shardings jit(optimizer.init) established — not leave host numpy
    leaves that replicate across the model axis (regression: round-2
    review)."""
    _require_8_devices()
    import jax.numpy as jnp
    from flax import serialization

    from segma_tpu.checkpoint import load_opt_state
    from segma_tpu.train import make_optimizer

    import dataclasses

    mesh = make_mesh(data=4, seq=1, model=2)
    # trainable encoder so some moments carry TP shardings (copy — don't
    # mutate the module-scoped fixture)
    model = dataclasses.replace(tp_model, frozen_prefixes=())
    optimizer = make_optimizer(model, 1e-3)
    params = shard_params(jax.tree.map(jnp.array, tp_model.params), mesh)
    opt_state = jax.jit(optimizer.init)(params)

    ckpt = tmp_path / "last"
    ckpt.mkdir(parents=True)
    host = jax.tree.map(np.asarray, opt_state)
    (ckpt / "opt_state.msgpack").write_bytes(serialization.to_bytes(host))

    restored = load_opt_state(ckpt, opt_state)
    # mirror the fit() resume path
    resharded = jax.tree.map(
        lambda r, init: jax.device_put(r, init.sharding)
        if hasattr(init, "sharding")
        else r,
        restored,
        opt_state,
    )
    init_shardings = jax.tree.map(
        lambda x: getattr(x, "sharding", None), opt_state
    )
    got_shardings = jax.tree.map(
        lambda x: getattr(x, "sharding", None), resharded
    )
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a == b, init_shardings, got_shardings)
    )


@pytest.mark.parametrize("family", ["hubert", "wavlm"])
def test_raw_waveform_families_tp_inference_parity(family):
    """dp x tp mesh inference for the raw-waveform encoder families
    (hubert/wavlm attention paths carry the TP rules; seq stays 1 — their
    conv stacks produce odd time axes, SCALING.md): logits must match the
    single-device pipeline."""
    _require_8_devices()
    import warnings as _w

    from segma_tpu.inference import InferencePipeline

    if family == "hubert":
        from segma_tpu.models.hubert.encoder import HubertEncoderConfig

        tiny = HubertEncoderConfig(
            hidden_size=64, n_layers=2, n_heads=2, ffn_dim=128,
            conv_dim=(32,) * 7, pos_conv_kernel=16, pos_conv_groups=4,
        )
        name, flag = "surgical_hubert_hydra", "model.config.wav_encoder=missing"
    else:
        from segma_tpu.models.wavlm.encoder import WavLMEncoderConfig

        tiny = WavLMEncoderConfig(
            hidden_size=64, n_layers=2, n_heads=2, ffn_dim=128,
            conv_dim=(32,) * 7, pos_conv_kernel=16, pos_conv_groups=4,
            num_buckets=32, max_distance=80,
        )
        name, flag = "surgical_wavlm_hydra", "model.config.wav_encoder=missing"

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            f"model.name={name}", flag,
            "audio.chunk_duration_s=1.0",
            "audio.strict_frames=true",
            "train.precision=f32",
        ],
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        model = Models[name](enc, cfg)
    model.module = model.module.clone(enc_cfg=tiny)
    model.init_params(jax.random.key(0))

    audio = (
        np.random.default_rng(3).standard_normal(40_000) * 0.1
    ).astype(np.float32)
    single = InferencePipeline(model, model.params, batch_size=4)
    ref = single.logits_for_audio(audio)

    mesh = make_mesh(data=4, seq=1, model=2)
    sharded = InferencePipeline(model, model.params, batch_size=4, mesh=mesh)
    got = sharded.logits_for_audio(audio)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_packed_multifile_under_mesh_matches_per_file(tp_model):
    """--pack-files combined with --mesh: packed multi-file dispatch over a
    (data, model) mesh must match single-device per-file logits (the packed
    window axis folds into the same sharded dimension)."""
    _require_8_devices()
    rng = np.random.default_rng(5)
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (20_000, 33_000, 20_500, 47_000)
    ]
    single = InferencePipeline(tp_model, tp_model.params, batch_size=4)
    refs = [single.logits_for_audio(a) for a in audios]

    mesh = make_mesh(data=4, seq=1, model=2)
    packed_pipe = InferencePipeline(
        tp_model, tp_model.params, batch_size=4, mesh=mesh
    )
    outs = packed_pipe.logits_for_audios_async(audios, pack_files=4)
    for (lg, tf), ref in zip(outs, refs):
        np.testing.assert_allclose(
            np.asarray(lg[:tf]), ref, rtol=2e-4, atol=2e-5
        )


def test_adpcm_transport_under_mesh_matches_single(tp_model):
    """ADPCM byte transport + mesh: the on-device block decode runs before
    the window-axis sharding constraint, so logits must match the
    single-device ADPCM path bit-for-bit."""
    _require_8_devices()
    from segma_tpu.ops.adpcm import adpcm_encode_audio

    rng = np.random.default_rng(6)
    wav = (rng.standard_normal(40_000) * 3000).astype(np.int16)
    enc = adpcm_encode_audio(wav)

    single = InferencePipeline(tp_model, tp_model.params, batch_size=4)
    ref = single.logits_for_audio(enc)

    mesh = make_mesh(data=4, seq=1, model=2)
    sharded = InferencePipeline(
        tp_model, tp_model.params, batch_size=4, mesh=mesh
    )
    got = sharded.logits_for_audio(enc)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# HLO collective-contract tests (round-4): a sharding regression (a dropped
# with_sharding_constraint, a TP rule that stops matching after a rename)
# passes every NUMERIC test by silently replicating — only the compiled
# program's collective inventory exposes it. Contract: gradient/TP psums
# present, and ZERO collective-permutes (the round-2 CPU-mesh rendezvous
# lesson, which is also better TPU design: permutes serialize on ICI hops).
# ---------------------------------------------------------------------------


def _collective_counts(hlo: str) -> dict[str, int]:
    import re

    ops = (
        "collective-permute",
        "all-reduce",
        "all-gather",
        "reduce-scatter",
        "all-to-all",
    )
    return {
        op: len(re.findall(rf"\b{op}(?:-start)?\(", hlo)) for op in ops
    }


def _train_step_hlo(tp_model, mesh, batch, shard_the_params=True):
    """Compiled-HLO text of the full train step under `mesh`."""
    import jax.numpy as jnp

    from segma_tpu.parallel.mesh import replicate
    from segma_tpu.train import make_optimizer, make_train_step

    optimizer = make_optimizer(tp_model, 1e-3)
    train_step = make_train_step(tp_model, optimizer)
    fresh = jax.tree.map(jnp.array, tp_model.params)
    params = (
        shard_params(fresh, mesh)
        if shard_the_params
        else replicate(fresh, mesh)
    )
    opt_state = jax.jit(optimizer.init)(params)
    compiled = train_step.lower(
        params, opt_state, batch, jax.random.key(0)
    ).compile()
    return compiled.as_text()


def test_train_step_collective_contract_dp_tp(tp_model):
    """dp=4 x tp=2: gradient psums + TP reductions present, no permutes."""
    _require_8_devices()
    mesh = make_mesh(data=4, model=2)
    batch = shard_batch(
        {
            "x": np.zeros((8, 16_000), np.float32),
            "y": np.zeros((8, 49, 4), np.float32),
        },
        mesh,
    )
    counts = _collective_counts(_train_step_hlo(tp_model, mesh, batch))
    assert counts["collective-permute"] == 0, counts
    assert counts["all-to-all"] == 0, counts
    # dp gradient psums + row-parallel TP activation reductions
    assert counts["all-reduce"] >= 2, counts


def test_broken_sharding_changes_the_inventory(tp_model):
    """The regression this contract catches: fully-replicated params AND
    batch (what a dropped sharding degrades to) compile to a program with
    ZERO cross-device collectives — the exact signature the contract test
    above would go red on."""
    _require_8_devices()
    from segma_tpu.parallel.mesh import replicate

    mesh = make_mesh(data=4, model=2)
    batch = replicate(
        {
            "x": np.zeros((8, 16_000), np.float32),
            "y": np.zeros((8, 49, 4), np.float32),
        },
        mesh,
    )
    counts = _collective_counts(
        _train_step_hlo(tp_model, mesh, batch, shard_the_params=False)
    )
    assert counts["all-reduce"] == 0, counts  # silently replicating


def test_train_step_collective_contract_dp_sp_tp(tp_model):
    """The full dryrun_multichip mesh (data=2 x seq=2 x model=2) keeps the
    permute-free contract — seq sharding of whisper's time axis must ride
    all-gathers around attention, never halo permutes."""
    _require_8_devices()
    mesh = make_mesh(data=2, seq=2, model=2)
    seq_model = type(tp_model).__new__(type(tp_model))
    seq_model.__dict__.update(tp_model.__dict__)
    seq_model.module = tp_model.module.clone(mesh=mesh)
    batch = shard_batch(
        {
            "x": np.zeros((4, 16_000), np.float32),
            "y": np.zeros((4, 49, 4), np.float32),
        },
        mesh,
    )
    counts = _collective_counts(_train_step_hlo(seq_model, mesh, batch))
    assert counts["collective-permute"] == 0, counts
    assert counts["all-reduce"] >= 2, counts


def test_tp_forward_collective_contract(tp_model):
    """Inference forward under tp=2: row-parallel out_proj/fc2 reductions
    present (the program IS tensor-parallel), zero permutes."""
    _require_8_devices()
    import jax.numpy as jnp

    mesh = make_mesh(data=4, model=2)
    params = shard_params(jax.tree.map(jnp.array, tp_model.params), mesh)
    x = shard_batch({"x": np.zeros((8, 16_000), np.float32)}, mesh)["x"]
    fwd = jax.jit(lambda p, w: tp_model.apply(p, w, train=False))
    counts = _collective_counts(fwd.lower(params, x).compile().as_text())
    assert counts["collective-permute"] == 0, counts
    assert counts["all-reduce"] >= 1, counts


def test_device_cache_train_step_no_gather_collectives(
    tp_model, synthetic_dataset
):
    """train.data_cache=device under a data=8 mesh: the HBM buffer is
    replicated and offsets are batch-sharded, so the crop gather must
    compile to a LOCAL dynamic-slice on every chip — no all-gathers, no
    permutes; the only collectives are the gradient psums."""
    _require_8_devices()
    import jax.numpy as jnp

    from segma_tpu.data.device_cache import DeviceAudioCache
    from segma_tpu.data.file_dataset import SegmaFileDataset
    from segma_tpu.train import make_optimizer, make_train_step

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            f"data.dataset_path={synthetic_dataset}",
            "data.classes=[male,female,key_child,other_child]",
            "audio.chunk_duration_s=1.0",
        ],
    )
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    mesh = make_mesh(data=8, model=1)
    cache = DeviceAudioCache.build(ds.train, synthetic_dataset, 16_000)
    cache.place(mesh)

    optimizer = make_optimizer(tp_model, 1e-3)
    train_step = make_train_step(tp_model, optimizer, cache=cache)
    params = shard_params(jax.tree.map(jnp.array, tp_model.params), mesh)
    opt_state = jax.jit(optimizer.init)(params)
    batch = shard_batch(
        {
            "offsets": np.zeros(8, np.int32),  # flat-buffer offsets
            "y": np.zeros((8, 49, 4), np.float32),
        },
        mesh,
    )
    hlo = train_step.lower(
        params, opt_state, batch, jax.random.key(0)
    ).compile().as_text()
    counts = _collective_counts(hlo)
    assert counts["collective-permute"] == 0, counts
    assert counts["all-gather"] == 0, counts
    assert counts["all-to-all"] == 0, counts
    assert counts["all-reduce"] >= 1, counts  # dp gradient psum

    # and it must actually run: one sharded step, finite loss
    params, opt_state, loss, _ = train_step(
        params, opt_state, batch, jax.random.key(0)
    )
    assert np.isfinite(float(loss))


def test_epoch_scan_under_mesh_contract_and_run(tp_model, synthetic_dataset):
    """train.dispatch=epoch under a data=8 mesh: the whole-epoch lax.scan
    keeps the same collective contract as the per-step program (local crop
    gathers, dp gradient psums, zero permutes) and executes one 3-step
    epoch to finite losses."""
    _require_8_devices()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from segma_tpu.data.device_cache import DeviceAudioCache
    from segma_tpu.data.file_dataset import SegmaFileDataset
    from segma_tpu.train import make_epoch_fn, make_optimizer

    cfg = load_config(
        CONFIG_DIR / "default.yml",
        [
            f"data.dataset_path={synthetic_dataset}",
            "data.classes=[male,female,key_child,other_child]",
            "audio.chunk_duration_s=1.0",
        ],
    )
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    mesh = make_mesh(data=8, model=1)
    cache = DeviceAudioCache.build(ds.train, synthetic_dataset, 16_000)
    cache.place(mesh)

    optimizer = make_optimizer(tp_model, 1e-3)
    epoch_fn = make_epoch_fn(tp_model, optimizer, cache=cache)
    params = shard_params(jax.tree.map(jnp.array, tp_model.params), mesh)
    opt_state = jax.jit(optimizer.init)(params)
    sh = NamedSharding(mesh, PartitionSpec(None, "data"))
    offsets_e = jax.device_put(np.zeros((3, 8), np.int32), sh)
    y_e = jax.device_put(np.zeros((3, 8, 49, 4), np.float32), sh)
    lrs = jax.device_put(
        np.full(3, 1e-3, np.float32), NamedSharding(mesh, PartitionSpec())
    )
    key = jax.random.key(0)
    hlo = (
        epoch_fn.lower(params, opt_state, key, offsets_e, y_e, lrs)
        .compile()
        .as_text()
    )
    counts = _collective_counts(hlo)
    assert counts["collective-permute"] == 0, counts
    assert counts["all-gather"] == 0, counts
    assert counts["all-to-all"] == 0, counts
    assert counts["all-reduce"] >= 1, counts  # dp gradient psum

    params, opt_state, key, losses, per_label = epoch_fn(
        params, opt_state, key, offsets_e, y_e, lrs
    )
    assert losses.shape == (3,) and np.all(np.isfinite(np.asarray(losses)))
