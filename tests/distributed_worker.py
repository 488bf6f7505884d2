"""Multi-host worker for tests/test_distributed.py.

Launched twice (NODE_RANK 0/1) with 2 virtual CPU devices per process: a
4-device, 2-process data-parallel training run that must reproduce the
single-process trajectory bit-for-bit up to float reduction order.

Usage: python distributed_worker.py <rank> <port> <log_dir> [mode]

mode: "dp" (default) — data-parallel trainer;
      "ring" — --edge-partition trainer (atom rows of one molecule sharded
      over the 2-process x 2-device mesh through the ring schedule);
      "fused_ring" — --edge-partition x --fused-attention ET (the fused
      Pallas kernels, interpret mode on CPU, with ring-scheduled source
      tables across the 2-process mesh; force loss, so the second-order
      kernels ride the ring too).
"""

import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
log_dir = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "dp"

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from torchmdnet_tpu.parallel.distributed import initialize_distributed  # noqa: E402

initialize_distributed(2, coordinator="localhost", port=port, rank=rank)
assert jax.process_count() == 2 and len(jax.devices()) == 4

import numpy as np  # noqa: E402

from torchmdnet_tpu.data.datasets import DummyDataset  # noqa: E402
from torchmdnet_tpu.data.module import DataModule  # noqa: E402
from torchmdnet_tpu.models.potential import create_model  # noqa: E402
from torchmdnet_tpu.parallel.mesh import make_mesh  # noqa: E402
from torchmdnet_tpu.train.trainer import Trainer  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from distributed_config import (  # noqa: E402
    make_fused_ring_hparams,
    make_hparams,
    make_ring_hparams,
)

if mode == "fused_ring":
    os.environ["TORCHMDNET_TPU_INTERPRET_FUSED"] = "1"
    h = make_fused_ring_hparams(log_dir)
    ds = DummyDataset(num_samples=4, num_atoms=64, seed=3)
elif mode == "ring":
    h = make_ring_hparams(log_dir)
    ds = DummyDataset(num_samples=8, num_atoms=14, seed=3)
else:
    h = make_hparams(log_dir)
    ds = DummyDataset(num_samples=16, num_atoms=5, seed=3)
data = DataModule(h, dataset=ds)
data.setup()
model = create_model(h)
mesh = make_mesh(-1)
assert mesh is not None and mesh.shape["dp"] == 4
trainer = Trainer(model, h, mesh=mesh)
state = trainer.fit(data)

if jax.process_index() == 0:
    trainer.save_checkpoint(os.path.join(log_dir, "final.ckpt"), state)
print(f"worker {rank}: done, global_step={state.global_step}", flush=True)
