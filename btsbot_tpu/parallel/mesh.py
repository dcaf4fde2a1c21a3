"""Device mesh construction.

The reference's only model-execution parallelism is single-process
``torch.nn.DataParallel`` (train.py:238-240) — replicate + scatter/gather.
The TPU-native equivalent is a ``jax.sharding.Mesh`` over ICI with
batch-sharded data ("data" axis) and optionally tensor-sharded wide dense
layers ("model" axis); XLA inserts the gradient all-reduces that
DataParallel's gather performed on the host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh.  Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           heartbeat_timeout_seconds: int | None = None
                           ) -> None:
    """Multi-host setup: one call per host before any jax use.

    On TPU pods with standard environment variables, bare
    ``jax.distributed.initialize()`` auto-discovers the topology; arguments
    are for manual (e.g. GPU/DCN) setups.  After this, ``make_mesh`` sees
    every chip in the slice and the data axis spans hosts — batches are fed
    per-host (each host supplies its local shard of the global batch) and
    XLA routes gradient collectives over ICI within a slice and DCN across
    slices.  The BTSbot workload is batch-parallel only (SURVEY.md §5), so
    no cross-host model sharding is configured by default.
    """
    import jax as _jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if heartbeat_timeout_seconds is not None:
        # failure-detection SLO: how quickly surviving hosts notice a dead
        # peer and abort (instead of hanging in its collectives)
        kwargs["heartbeat_timeout_seconds"] = heartbeat_timeout_seconds
    _jax.distributed.initialize(**kwargs)
