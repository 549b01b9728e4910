"""Worker for the 2-process jax.distributed CPU test.

Spawned by tests/test_parallel.py::TestMultiHost with
``python tests/_multihost_worker.py <process_id> <port> <outfile>``.
Each process owns 4 virtual CPU devices; together they form the same
8-device global 'data' mesh the single-process tests use, so the sharded
train step's results must match those tests bit-for-float-noise.

This is the executed form of the SURVEY §2.3 DCN claim: the scene tables
and train state are placed with the SAME shard_scene/replicated_sharding
helpers the runner uses — under jax.distributed they become global arrays
spanning both processes, and XLA reduces gradients across the process
boundary (Gloo on CPU; ICI/DCN collectives on a real pod).
"""

import json
import os
import sys

process_id = int(sys.argv[1])
port = sys.argv[2]
outfile = sys.argv[3]

# env must be pinned before jax import; the parent also sets these but be
# self-sufficient when run by hand
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=process_id,
)

import numpy as np  # noqa: E402

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))  # repo root (neat_tpu package)
sys.path.insert(0, _here)  # tests/ (test_parallel helpers)
from test_parallel import N_DEV, _tiny_cfg, _tiny_scene, _run_steps  # noqa: E402

from neat_tpu.parallel.mesh import make_mesh  # noqa: E402

assert len(jax.devices()) == N_DEV, jax.devices()
assert jax.process_count() == 2

state, aux = _run_steps(_tiny_cfg(), _tiny_scene(), mesh=make_mesh(), n_steps=2)

# loss/psnr are replicated scalars; params fully replicated — both are
# host-fetchable from any process
flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
param_norms = {
    jax.tree_util.keystr(path): float(
        np.linalg.norm(np.asarray(leaf, dtype=np.float64))
    )
    for path, leaf in flat
}

result = {
    "process_id": process_id,
    "n_devices": len(jax.devices()),
    "process_count": jax.process_count(),
    "loss": float(np.asarray(aux["loss"])),
    "psnr": float(np.asarray(aux["psnr"])),
    "param_norms": param_norms,
}
with open(outfile, "w") as f:
    json.dump(result, f)

jax.distributed.shutdown()
