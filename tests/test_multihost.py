"""REAL multi-host validation without a cluster: two OS processes, each
with 4 virtual CPU devices, joined by jax.distributed into one 8-device
mesh, running the actual segma_tpu train step on process-local batch
shards (SURVEY.md §4's "multi-node-without-a-cluster" test plan)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["SEGMA_REPO"])

from segma_tpu.parallel.distributed import maybe_init_distributed, process_shard

assert maybe_init_distributed(), "distributed init did not trigger"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from segma_tpu.config import load_config
from segma_tpu.models import Models
from segma_tpu.parallel.mesh import make_mesh
from segma_tpu.train import make_optimizer, make_train_step
from segma_tpu.utils.encoders import MultiLabelEncoder

cfg = load_config(
    os.path.join(os.environ["SEGMA_REPO"], "segma_tpu/config/default.yml"),
    [
        "model.name=conv_vad",
        "model.config={hidden: 16, depth: 1, dtype: f32}",
        "audio.chunk_duration_s=1.0",
        "train.batch_size=8",
    ],
)
enc = MultiLabelEncoder(cfg.data.classes)
model = Models["conv_vad"](enc, cfg)
params = model.init_params(jax.random.key(0))  # same seed -> same params
mesh = make_mesh(devices=jax.devices(), data=8, model=1)

# replicate params globally (identical on every host by construction)
params = jax.device_put(params, NamedSharding(mesh, P()))
optimizer = make_optimizer(model, cfg.train.lr)
train_step = make_train_step(model, optimizer)
opt_state = jax.jit(optimizer.init)(params)

# each process materializes ONLY its half of the global batch
batch_sharding = NamedSharding(mesh, P("data"))
pid = jax.process_index()
rows = process_shard(list(range(8)), pid)  # 4 global rows per process
rng = np.random.default_rng(42)
gx = rng.standard_normal((8, 16_000)).astype(np.float32)  # global view
gy = (rng.random((8, model.n_windows, 4)) > 0.8).astype(np.float32)
batch = {
    "x": jax.make_array_from_process_local_data(batch_sharding, gx[rows]),
    "y": jax.make_array_from_process_local_data(batch_sharding, gy[rows]),
}

loss = None
for step in range(2):
    params, opt_state, loss, per_label = train_step(
        params, opt_state, batch, jax.random.key(step)
    )
print(f"MULTIHOST_OK pid={pid} loss={float(loss):.6f}", flush=True)
"""


FIT_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["SEGMA_REPO"])

from segma_tpu.parallel.distributed import maybe_init_distributed

assert maybe_init_distributed(), "distributed init did not trigger"
assert jax.process_count() == 2

from pathlib import Path
from segma_tpu.config import load_config
from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
from segma_tpu.models import Models
from segma_tpu.parallel.mesh import make_mesh
from segma_tpu.train import Trainer
from segma_tpu.utils.encoders import MultiLabelEncoder

cfg = load_config(
    os.path.join(os.environ["SEGMA_REPO"], "segma_tpu/config/default.yml"),
    [
        f"data.dataset_path={os.environ['SEGMA_DATASET']}",
        "data.classes=[male,female,key_child,other_child]",
        "data.dataset_multiplier=0.2",
        "model.name=conv_vad",
        "model.config={hidden: 16, depth: 1, dtype: f32}",
        "audio.chunk_duration_s=1.0",
        "train.batch_size=8",
        "train.max_epochs=1",
        "train.seed=0",
        "train.validation_metric=f1_score",
        "train.extra_val_metrics=[loss]",
        "wandb.offline=true",
    ],
)
enc = MultiLabelEncoder(cfg.data.classes)
model = Models["conv_vad"](enc, cfg)
model.init_params(jax.random.key(0))  # same seed everywhere
mesh = make_mesh(devices=jax.devices(), data=8, model=1)

run_dir = Path(os.environ["SEGMA_RUN_DIR"])
ds = SegmaFileDataset.from_config(cfg)
ds.load(use_cache=False)
dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)

# ---- fit #1: one epoch; process 0 is the single checkpoint writer ----
trainer = Trainer(model=model, config=cfg, run_dir=run_dir, mesh=mesh)
assert trainer.ckpt.write == (jax.process_index() == 0)
r1 = trainer.fit(dm)
assert len(r1["history"]) == 1 and r1["history"][0]["epoch"] == 0

# the writer must have produced last/ + best.ckpt before anyone resumes;
# barrier so the non-writer cannot race ahead
import jax.numpy as jnp
jnp.zeros(()).block_until_ready()
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpt-written")
last = run_dir / "checkpoints" / "last"
assert last.exists(), "writer did not produce last/"

# ---- fit #2: resume from last/ (the auto_train contract) ----
model2 = Models["conv_vad"](enc, cfg)
model2.init_params(jax.random.key(1))  # different init: must be overwritten
t2 = Trainer(model=model2, config=cfg, run_dir=run_dir, mesh=mesh, max_epochs=2)
r2 = t2.fit(dm, resume_from=last)
assert [h["epoch"] for h in r2["history"]] == [1], r2["history"]

m = r2["history"][0]
print("FITHOST_OK " + json.dumps({
    "pid": jax.process_index(),
    "val_loss": m["val/loss"],
    "val_f1": m["val/f1_score"],
    "train_loss": m["train/loss"],
}), flush=True)
"""


DEVCACHE_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["SEGMA_REPO"])

from segma_tpu.parallel.distributed import maybe_init_distributed

assert maybe_init_distributed(), "distributed init did not trigger"
assert jax.process_count() == 2

from pathlib import Path
from segma_tpu.config import load_config
from segma_tpu.data import SegmaFileDataset, SegmentationDataLoader
from segma_tpu.models import Models
from segma_tpu.parallel.mesh import make_mesh
from segma_tpu.train import Trainer
from segma_tpu.utils.encoders import MultiLabelEncoder

BASE = [
    f"data.dataset_path={os.environ['SEGMA_DATASET']}",
    "data.classes=[male,female,key_child,other_child]",
    "data.dataset_multiplier=0.5",
    "model.name=conv_vad",
    "model.config={hidden: 16, depth: 1, dtype: f32}",
    "audio.chunk_duration_s=1.0",
    "train.batch_size=8",
    "train.max_epochs=2",
    "train.seed=0",
    "train.dataloader.num_workers=1",  # deterministic batch order
    "train.validation_metric=f1_score",
    "train.extra_val_metrics=[loss]",
    "wandb.offline=true",
]
mesh = make_mesh(devices=jax.devices(), data=8, model=1)
run_root = Path(os.environ["SEGMA_RUN_DIR"])


def fit(tag, *overrides):
    cfg = load_config(
        os.path.join(os.environ["SEGMA_REPO"], "segma_tpu/config/default.yml"),
        BASE + list(overrides),
    )
    enc = MultiLabelEncoder(cfg.data.classes)
    model = Models["conv_vad"](enc, cfg)
    model.init_params(jax.random.key(0))  # same seed everywhere
    ds = SegmaFileDataset.from_config(cfg)
    ds.load(use_cache=False)
    dm = SegmentationDataLoader(ds, enc, cfg, model.conv_settings)
    trainer = Trainer(model=model, config=cfg, run_dir=run_root / tag, mesh=mesh)
    r = trainer.fit(dm)
    tl = dm.train_dataloader()
    return {
        "train_loss": [h["train/loss"] for h in r["history"]],
        "val_loss": [h["val/loss"] for h in r["history"]],
        "val_f1": [h["val/f1_score"] for h in r["history"]],
        "decision": tl.data_cache_decision,
        "cached": tl.device_cache is not None,
    }


# the SAME two-controller run three ways: host sampling, HBM-resident
# device cache (per-process sharded rows), and device cache + whole-epoch
# lax.scan dispatch
host = fit("host", "train.data_cache=host")
dev = fit("dev", "train.data_cache=device")
dev_epoch = fit(
    "dev_epoch", "train.data_cache=device", "train.dispatch=epoch"
)
assert dev["cached"] and dev_epoch["cached"]
assert not host["cached"]

print("DEVCACHE_OK " + json.dumps({
    "pid": jax.process_index(),
    "host": host, "dev": dev, "dev_epoch": dev_epoch,
}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_multihost_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "SEGMA_REPO": str(REPO),
            "SEGMA_TPU_MULTIHOST": "1",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "PROCESS_COUNT": "2",
            "PROCESS_ID": str(pid),
        }
        env.pop("JAX_PLATFORMS", None)  # the worker pins cpu itself
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MULTIHOST_OK")]
        assert line, out[-2000:]
        losses.append(float(line[0].split("loss=")[1]))
    # the globally-psum'd loss must be identical on both controllers
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)


def test_two_process_multihost_fit_and_resume(tmp_path):
    """Full Trainer.fit under 2 controllers: per-process data shards,
    process-0-only checkpoint writing, resume from last/, identical
    val metrics on both controllers (round-3 VERDICT item 2)."""
    import json as _json

    from scripts.generate_data import gen_classification

    dataset = tmp_path / "ds"
    gen_classification(
        output=dataset, per_split=4, seed=77, audio_duration_s=10.0
    )
    script = tmp_path / "fit_worker.py"
    script.write_text(FIT_WORKER)
    run_dir = tmp_path / "run"
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "SEGMA_REPO": str(REPO),
            "SEGMA_DATASET": str(dataset),
            "SEGMA_RUN_DIR": str(run_dir),
            "SEGMA_TPU_MULTIHOST": "1",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "PROCESS_COUNT": "2",
            "PROCESS_ID": str(pid),
        }
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                cwd=str(tmp_path),  # any stray relative writes stay here
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"fit worker {pid} failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("FITHOST_OK")]
        assert line, out[-2000:]
        results.append(_json.loads(line[0].split(" ", 1)[1]))
    # identical globally-reduced metrics on both controllers
    for key in ("val_loss", "val_f1", "train_loss"):
        assert results[0][key] == pytest.approx(results[1][key], abs=1e-6), key
    # single writer: exactly one metrics.jsonl / checkpoints tree, written
    # by process 0; both epochs' checkpoints + best.ckpt + last/ exist
    ckpts = run_dir / "checkpoints"
    assert (run_dir / "metrics.jsonl").exists()
    assert (ckpts / "best.ckpt").exists() and (ckpts / "last").exists()
    epochs = sorted(p.name for p in ckpts.glob("epoch=*"))
    assert len(epochs) == 2, epochs


def test_two_process_device_cache_fit_matches_host(tmp_path):
    """train.data_cache=device under 2 controllers (round-4 VERDICT item
    3): each process uploads its file shard as one row of a global
    (data_axis, L_pad) buffer, crops gather locally inside shard_map, and
    the training trajectory is BIT-IDENTICAL to the multi-host host-path
    run (same rng draws, same on-device x*2^-15 normalization). The
    whole-epoch lax.scan dispatch composes on top and stays within scan
    fusion tolerance of the step-dispatch trajectory."""
    import json as _json

    from scripts.generate_data import gen_classification

    dataset = tmp_path / "ds"
    gen_classification(
        output=dataset, per_split=4, seed=77, audio_duration_s=10.0
    )
    script = tmp_path / "devcache_worker.py"
    script.write_text(DEVCACHE_WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "SEGMA_REPO": str(REPO),
            "SEGMA_DATASET": str(dataset),
            "SEGMA_RUN_DIR": str(tmp_path / "runs"),
            "SEGMA_TPU_MULTIHOST": "1",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "PROCESS_COUNT": "2",
            "PROCESS_ID": str(pid),
        }
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                cwd=str(tmp_path),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"devcache worker {pid} failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("DEVCACHE_OK")]
        assert line, out[-2000:]
        results.append(_json.loads(line[0].split(" ", 1)[1]))
    r0, r1 = results
    # both controllers observe identical globally-reduced metrics
    for mode in ("host", "dev", "dev_epoch"):
        for key in ("train_loss", "val_loss", "val_f1"):
            assert r0[mode][key] == pytest.approx(r1[mode][key], abs=1e-6), (
                mode,
                key,
            )
    # the device-cache trajectory IS the host trajectory (same crops, same
    # normalization — only the transport differs)
    assert r0["dev"]["train_loss"] == pytest.approx(
        r0["host"]["train_loss"], abs=1e-6
    )
    assert r0["dev"]["val_loss"] == pytest.approx(
        r0["host"]["val_loss"], abs=1e-6
    )
    # epoch-scan dispatch: same values, one dispatch — scan fuses the body
    # slightly differently, so ulp-level drift is allowed
    assert r0["dev_epoch"]["train_loss"] == pytest.approx(
        r0["host"]["train_loss"], rel=1e-4
    )
