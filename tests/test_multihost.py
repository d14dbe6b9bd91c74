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
