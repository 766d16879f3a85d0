"""Device-mesh and sharding helpers.

The reference has no distributed layer (SURVEY.md §2.4); scaling here means
`jax.sharding.Mesh` + NamedSharding over ICI/DCN. Conventions:

  dp — data parallel: windows / chains / particle blocks
  mp — model parallel: point/residual axis of one big reduction (psum'd)

Multi-host entry: `initialize_distributed()` wraps `jax.distributed` for
N>=2 hosts; on a single host a mesh over local devices behaves identically.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str] = ("dp", "mp")) -> Mesh:
    devices = np.asarray(jax.devices()[: int(np.prod(axis_sizes))]).reshape(*axis_sizes)
    return Mesh(devices, tuple(axis_names))


def data_parallel_mesh(n: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n or len(devs)
    return Mesh(np.asarray(devs[:n]), ("dp",))


def shard_batch(mesh: Mesh, x, axis_name: str = "dp"):
    """Put a batched array with leading axis sharded over `axis_name`."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up (no-op when already initialized / single host)."""
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator, num_processes, process_id)
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass
    return jax.process_index(), jax.process_count()
