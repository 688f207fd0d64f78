"""Multi-host / multi-slice initialization and corpus sharding plans.

The reference's "multi-node" story was an application-level LAN mesh
(SURVEY.md §2.3); the TPU-native equivalent is ``jax.distributed`` — every
host joins one runtime, the global Mesh spans all chips, and the sharded
search program (``sharded_search.py``) runs unchanged with collectives
riding ICI within a slice and DCN across slices.

Host-side data placement: each host feeds only the index rows of its
addressable shards — :func:`host_row_range` computes that slice of the
global corpus, and :func:`make_global_sharded_array` assembles the global
device array from per-host chunks without materializing the full corpus
anywhere.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "is_multi_host",
    "host_row_range",
    "make_global_sharded_array",
]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict[str, Any]:
    """Join the JAX distributed runtime (idempotent, env-var driven).

    With no arguments, reads the standard JAX env vars (set by TPU pod
    launchers) and no-ops on single-process setups.

    NOTE: must run before any backend-initializing JAX call (including
    jax.process_count()) — initialize() is attempted FIRST and a failure
    because the runtime is already initialized is tolerated.
    """
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError:
            # already initialized (or backends already up) — proceed with
            # whatever topology the runtime has
            pass
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_multi_host() -> bool:
    return jax.process_count() > 1


def host_row_range(n_rows: int, mesh: Mesh, axis: str = "index") -> tuple[int, int]:
    """[start, end) of global index rows this host's devices own.

    Rows shard evenly over ``axis``; a host owns the union of its devices'
    shards (contiguous for the standard device order).
    """
    n_dev = mesh.shape[axis]
    rows_per_dev = -(-n_rows // n_dev)
    mesh_devices = mesh.devices.reshape(-1)
    my_ids = sorted(
        i for i, d in enumerate(mesh_devices)
        if d.process_index == jax.process_index()
    )
    if not my_ids:
        return (0, 0)
    if my_ids != list(range(my_ids[0], my_ids[-1] + 1)):
        raise ValueError(
            "host's devices are not contiguous in the mesh's flat order "
            f"({my_ids}); build the mesh with process-contiguous device "
            "ordering (the default jax.devices() order) before sharding rows"
        )
    start = my_ids[0] * rows_per_dev
    end = min((my_ids[-1] + 1) * rows_per_dev, n_rows)
    return (min(start, n_rows), end)


def make_global_sharded_array(
    local_rows: np.ndarray,
    n_global_rows: int,
    mesh: Mesh,
    axis: str = "index",
    dtype: Any = None,
):
    """Assemble a global row-sharded device array from this host's chunk.

    ``local_rows`` must be exactly this host's ``host_row_range`` slice
    (padded shard granularity). Uses
    ``jax.make_array_from_process_local_data`` so no host ever holds the
    global corpus.
    """
    import jax.numpy as jnp

    sharding = NamedSharding(mesh, P(axis, None))
    if dtype is not None:
        local_rows = np.asarray(local_rows)
        if str(dtype) == "bfloat16":
            local_rows = jnp.asarray(local_rows, jnp.bfloat16)
    global_shape = (n_global_rows, np.asarray(local_rows).shape[-1])
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows), global_shape
    )
