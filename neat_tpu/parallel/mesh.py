"""Device mesh and sharding utilities.

The scaling axis of this workload is rays x samples-per-ray (SURVEY.md
§2.3): the ray batch shards embarrassingly over a 1-D 'data' mesh axis via
GSPMD sharding constraints, parameters stay replicated, and XLA inserts the
psum for gradient reduction over ICI. Multi-host runs initialize
jax.distributed before building the mesh (DCN handled by JAX).

There is no sequence/pipeline/expert axis in this model family — a single
'data' axis saturates ICI for the reference's workload. The mesh helpers
still accept an (dp,) shape tuple so larger topologies can subdivide later.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def ray_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_scene(scene: Dict, mesh: Mesh) -> Dict:
    """Place packed scene arrays on the mesh.

    Per-pixel tables (views x pixels x ...) are sharded over the pixel axis
    so the HBM footprint divides across chips; small per-view tables are
    replicated. Device-side gathers during batch sampling then produce
    ray-sharded batches directly.
    """
    per_pixel = ("rgb", "labels", "uv_proj", "mask", "depth", "support_idx")
    n = mesh.devices.size
    out = {}
    for k, v in scene.items():
        arr = np.asarray(v)
        if arr.ndim >= 2 and k in per_pixel:
            # the sharded axis must divide over the mesh; support_idx is
            # packed to the max support count (arbitrary), so pad. Batch
            # sampling gathers with indices < the true size, so the pad
            # columns are never read.
            pad = (-arr.shape[1]) % n
            if pad:
                arr = np.concatenate(
                    [arr, np.zeros((arr.shape[0], pad) + arr.shape[2:], arr.dtype)],
                    axis=1,
                )
            spec = P(None, "data")
        else:
            spec = P()
        # hand device_put the HOST array: it shards host-side, each chip
        # receiving only its slice. Staging through jnp.asarray first
        # would materialize the full table on the default device —
        # defeating the cross-chip HBM split (and OOMing on scenes larger
        # than one chip's HBM).
        out[k] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out


def place_chunk_inputs(inputs: Dict, mesh: Mesh) -> Dict:
    """Place one chunked-inference input dict on the mesh: the per-pixel
    arrays (leading axis = rays) shard over 'data', per-view camera
    matrices and the dummy vertex tables replicate. The chunk evaluators
    are plain jit functions — GSPMD partitions them automatically when
    their inputs arrive sharded, so offline distillation/rendering scale
    over the same mesh as training without separate code paths."""
    ray_keys = ("uv", "uv_proj")
    out = {}
    for k, v in inputs.items():
        s = ray_sharding(mesh) if k in ray_keys else replicated_sharding(mesh)
        out[k] = jax.device_put(v, s)
    return out


def round_chunk_to_mesh(chunksize: int, mesh: Optional[Mesh]) -> int:
    """Chunk sizes must divide evenly over the mesh's data axis."""
    if mesh is None:
        return chunksize
    n = mesh.devices.size
    return -(-chunksize // n) * n
