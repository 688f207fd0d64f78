"""Device mesh construction and topology helpers."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["MeshSpec", "create_mesh", "device_info"]


@dataclass(frozen=True)
class MeshSpec:
    """Named mesh layout.

    Axes used across the framework:
    - ``data``  — batch sharding for embedding throughput (DP)
    - ``index`` — row sharding of the search database
    - ``model`` — tensor-parallel sharding of tower weights (training)
    """

    axis_names: tuple[str, ...] = ("data", "index")
    shape: tuple[int, ...] | None = None  # None -> (1, ..., n_devices)

    def resolve_shape(self, n_devices: int) -> tuple[int, ...]:
        if self.shape is not None:
            total = int(np.prod(self.shape))
            if total != n_devices:
                raise ValueError(
                    f"mesh shape {self.shape} needs {total} devices, "
                    f"have {n_devices}"
                )
            return tuple(self.shape)
        return (1,) * (len(self.axis_names) - 1) + (n_devices,)


def create_mesh(
    spec: MeshSpec | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh over available devices (or an explicit subset)."""
    spec = spec or MeshSpec()
    devs = list(devices) if devices is not None else jax.devices()
    shape = spec.resolve_shape(len(devs))
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, spec.axis_names)


def device_info() -> dict[str, Any]:
    """Host-visible device topology summary (for /api/stats and logs)."""
    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "num_devices": len(devs),
        "num_local_devices": jax.local_device_count(),
        "process_index": jax.process_index(),
        "num_processes": jax.process_count(),
        "devices": [
            {
                "id": d.id,
                "platform": d.platform,
                "kind": getattr(d, "device_kind", "unknown"),
            }
            for d in devs
        ],
    }
