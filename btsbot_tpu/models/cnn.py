"""Custom VGG-style CNN models (the production BTSbot v1 family).

TPU-native re-design of the reference's ``mm_cnn``/``um_cnn``
(`/root/reference/btsbot/architectures.py:174-274`): NHWC layout (native for
TPU convolutions — the reference transposes its NHWC .npy data to NCHW,
train.py:154; we keep the on-disk layout end to end), exact-shape parity with
torch semantics:

* Conv2d(k, padding='same', stride 1) ⇔ XLA SAME padding (symmetric, odd k);
* MaxPool2d(2,2) / (4,4) ⇔ VALID max_pool with matching window/stride
  (floor semantics: 63 → 31 → 7 for the default 63×63 input);
* Dropout2d ⇔ Dropout broadcast over the spatial axes (channelwise).

The flattened conv feature dim is ``conv2_channels * (image_size // 8)**2``
(reference architectures.py:202) — identical count, but NHWC element order;
the torch→JAX weight converter permutes the first dense layer accordingly
(see btsbot_tpu.interop.convert).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import CombinedHead, ImageHead, MetadataBranch, check_inputs

Dtype = Any


class CnnBackbone(nn.Module):
    conv1_channels: int
    conv2_channels: int
    kernel: int
    dropout1: float
    dropout2: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = (self.kernel, self.kernel)
        x = nn.Conv(self.conv1_channels, k, padding="SAME", dtype=self.dtype,
                    name="conv1a")(x)
        x = nn.relu(x)
        x = nn.Conv(self.conv1_channels, k, padding="SAME", dtype=self.dtype,
                    name="conv1b")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        x = nn.Dropout(self.dropout1, broadcast_dims=(1, 2),
                       deterministic=not train)(x)

        x = nn.Conv(self.conv2_channels, k, padding="SAME", dtype=self.dtype,
                    name="conv2a")(x)
        x = nn.relu(x)
        x = nn.Conv(self.conv2_channels, k, padding="SAME", dtype=self.dtype,
                    name="conv2b")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (4, 4), strides=(4, 4), padding="VALID")
        x = nn.Dropout(self.dropout2, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        return x.reshape((x.shape[0], -1))  # NHWC flatten


def _backbone_from_config(config, dtype) -> CnnBackbone:
    return CnnBackbone(
        conv1_channels=config["conv1_channels"],
        conv2_channels=config["conv2_channels"],
        kernel=config["conv_kernel"],
        dropout1=config["conv_dropout1"],
        dropout2=config["conv_dropout2"],
        dtype=dtype,
        name="backbone",
    )


class MmCnn(nn.Module):
    """Multi-modal CNN (reference ``mm_cnn``, architectures.py:174-229)."""

    config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_input=None, metadata_input=None,
                 train: bool = False) -> jnp.ndarray:
        check_inputs("mm_cnn", image_input, metadata_input)
        conv_features = _backbone_from_config(self.config, self.dtype)(
            image_input, train=train)
        meta_features = MetadataBranch(
            fc1=self.config["meta_fc1_neurons"],
            fc2=self.config["meta_fc2_neurons"],
            dropout=self.config["meta_dropout"],
            activation="relu",
            dtype=self.dtype,
            name="metadata_branch",
        )(metadata_input, train=train)
        combined = jnp.concatenate([conv_features, meta_features], axis=1)
        return CombinedHead(
            fc1=self.config["comb_fc1_neurons"],
            fc2=self.config["comb_fc2_neurons"],
            dropout=self.config["comb_dropout"],
            activation="relu",
            dtype=self.dtype,
            name="combined_head",
        )(combined, train=train)


class UmCnn(nn.Module):
    """Image-only CNN (reference ``um_cnn``, architectures.py:232-274)."""

    config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_input=None, metadata_input=None,
                 train: bool = False) -> jnp.ndarray:
        check_inputs("um_cnn", image_input, metadata_input)
        features = _backbone_from_config(self.config, self.dtype)(
            image_input, train=train)
        return ImageHead(
            fc1=self.config["fc1_neurons"],
            fc2=self.config["fc2_neurons"],
            dropout=self.config["dropout"],
            activation="relu",
            dtype=self.dtype,
            name="head",
        )(features, train=train)
