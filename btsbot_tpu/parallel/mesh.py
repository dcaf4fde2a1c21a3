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
