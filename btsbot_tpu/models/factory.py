"""Model registry and construction.

The reference instantiates architectures by name with
``getattr(architectures, model_name)(config)`` (train.py:218-222,
from_HF.py:71-73, val.py:61-68).  We keep that contract through an explicit
registry keyed by the same model names.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import Config, normalize_config
from .cnn import MmCnn, UmCnn
from .convnext import ConvNeXtClassifier, MmConvNeXt
from .maxvit import MaxViTClassifier, MmMaxViT
from .mlp import UmNN

MODEL_REGISTRY: dict[str, Any] = {
    "mm_cnn": MmCnn,
    "um_cnn": UmCnn,
    "um_nn": UmNN,
    "ConvNeXt": ConvNeXtClassifier,
    "mm_ConvNeXt": MmConvNeXt,
    "MaxViT": MaxViTClassifier,
    "mm_MaxViT": MmMaxViT,
}


def build_model(config, dtype=jnp.float32):
    """Construct (but do not initialize) the flax module for a config."""
    if not isinstance(config, Config):
        config = normalize_config(config)
    name = config["model_name"]
    if name == "frozen_fusion":
        from .fusion import FrozenFusion
        return FrozenFusion(config=dict(config), dtype=dtype)
    try:
        cls = MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(f"Could not find model of name {name}") from None
    return cls(config=dict(config), dtype=dtype)


from .common import check_inputs  # noqa: E402, F401 — re-export


def example_inputs(config, batch_size: int = 1, dtype=jnp.float32):
    """Dummy (image, metadata) inputs matching the config's modality."""
    if not isinstance(config, Config):
        config = normalize_config(config)
    image = None
    metadata = None
    if config.need_triplets:
        s = config.get("image_size", 63)
        image = jnp.zeros((batch_size, s, s, 3), dtype)
    if config.need_metadata:
        n = len(config.get("metadata_cols", []))
        metadata = jnp.zeros((batch_size, n), dtype)
    return image, metadata


def init_model(config, rng: jax.Array | int = 0, dtype=jnp.float32):
    """Build and initialize a model; returns (module, variables).

    ``init_scheme`` (default "torch") redraws kernel/bias leaves at torch's
    module defaults — the reference's from-scratch starting point, which
    trains measurably better than flax defaults (models/init.py docstring);
    "flax" keeps flax's lecun_normal/zeros.
    """
    if not isinstance(config, Config):
        config = normalize_config(config)
    if isinstance(rng, int):
        rng = jax.random.key(rng)
    model = build_model(config, dtype=dtype)
    image, metadata = example_inputs(config, dtype=dtype)
    variables = model.init(rng, image_input=image, metadata_input=metadata,
                           train=False)
    scheme = config.get("init_scheme", "torch")
    if scheme == "torch":
        from .init import torch_default_reinit
        variables = dict(variables)
        variables["params"] = torch_default_reinit(rng, variables["params"])
    elif scheme != "flax":
        raise ValueError(f"unknown init_scheme: {scheme!r} "
                         "(expected 'torch' or 'flax')")
    return model, variables
