"""Metadata-only MLP (reference ``um_nn``, architectures.py:277-293):
BatchNorm → Dense → ReLU → Dropout → Dense → ReLU → Dense(1)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import MetadataBranch, check_inputs

Dtype = Any


class UmNN(nn.Module):
    config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_input=None, metadata_input=None,
                 train: bool = False) -> jnp.ndarray:
        check_inputs("um_nn", image_input, metadata_input)
        x = MetadataBranch(
            fc1=self.config["meta_fc1_neurons"],
            fc2=self.config["meta_fc2_neurons"],
            dropout=self.config["meta_dropout"],
            activation="relu",
            dtype=self.dtype,
            name="branch",
        )(metadata_input, train=train)
        self.sow("intermediates", "penultimate", x)
        return nn.Dense(1, dtype=self.dtype, name="out")(x)
