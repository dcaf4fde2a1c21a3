"""Parameter sharding rules.

BTSbot-class models are small (≤ ~30M params), so the dominant strategy is
pure data parallelism with replicated params (the TPU-native analog of the
reference's DataParallel — SURVEY.md §2 "Native / accelerator components").
When the mesh has a non-trivial "model" axis we additionally tensor-shard the
wide Dense kernels (ConvNeXt/MaxViT MLP expansions, backbone 1×1 convs) on
their output feature axis, which keeps each matmul local and lets XLA insert
the reduce-scatter/all-gather pairs over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Don't bother sharding tiny leaves — replication is cheaper than the
# collectives it would induce.
_MIN_SHARDED_SIZE = 1 << 16


def param_spec(path_leaf: Any, leaf, model_size: int) -> P:
    """PartitionSpec for one param leaf under a (data, model) mesh."""
    if (
        model_size > 1
        and hasattr(leaf, "ndim") and leaf.ndim >= 2
        and leaf.size >= _MIN_SHARDED_SIZE
        and leaf.shape[-1] % model_size == 0
    ):
        # shard output features of dense/conv kernels on the model axis
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def variables_shardings(variables, mesh: Mesh):
    """NamedSharding tree matching a flax variables (or params) tree."""
    model_size = mesh.shape.get("model", 1)

    def leaf_sharding(path, leaf):
        return NamedSharding(mesh, param_spec(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, variables)


def shard_variables(variables, mesh: Mesh):
    """Place a variables tree onto the mesh per the rules above."""
    shardings = variables_shardings(variables, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), variables, shardings)
