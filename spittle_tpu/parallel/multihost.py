"""Multi-host (multi-process) mesh support — the DCN half of ICI/DCN.

The reference has no distributed layer (SURVEY.md §2.8); this is a
north-star obligation: data-parallel sharding across chips AND hosts via
jax.sharding + pjit. A multi-process mesh differs from the single-process
one in exactly one way that matters to the code: most devices are NOT
addressable from any one process, so `jax.device_put(host_array,
NamedSharding(...))` cannot place remote shards. Every placement of host
data onto a process-spanning mesh must instead go through
`jax.make_array_from_callback` (replicated-on-every-host sources, e.g.
parameters) or `jax.make_array_from_process_local_data` (per-host batch
rows, e.g. serving windows / training batches).

Recommended topology (scaling-book recipe): put the model axes (tp/sp)
inside a host — they ride ICI — and let the data axis span hosts over DCN;
`make_mesh` already yields that layout because `jax.devices()` orders by
process, so tp-adjacent devices share a host.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids=None,
) -> None:
    """jax.distributed.initialize wrapper (call BEFORE any jax op)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh contains devices this process cannot address."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def global_put(leaf, mesh: Mesh, spec: P):
    """Place host data (identical on every process) onto a mesh that may
    span processes. Single-process meshes take the fast jax.device_put
    path; process-spanning meshes build the global jax.Array from each
    process's addressable shards only."""
    sharding = NamedSharding(mesh, spec)
    if not mesh_is_multiprocess(mesh):
        return jax.device_put(leaf, sharding)
    arr = np.asarray(leaf)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def global_batch_from_local(local_rows, mesh: Mesh, spec: Optional[P] = None):
    """Assemble a leading-axis-sharded global batch from each process's
    local rows (the serving/training ingest path across hosts: every host
    stages its own requests; the global batch is their concatenation in
    process order)."""
    spec = spec if spec is not None else P(mesh.axis_names[0])
    sharding = NamedSharding(mesh, spec)
    local_rows = np.asarray(local_rows)
    if not mesh_is_multiprocess(mesh):
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(sharding, local_rows)


def replicated_to_host(x) -> np.ndarray:
    """Read back a fully-replicated global array (e.g. a loss scalar) on
    any process."""
    if hasattr(x, "is_fully_replicated") and not x.is_fully_replicated:
        raise ValueError("array is not fully replicated across the mesh")
    if hasattr(x, "addressable_shards"):
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)
