"""Shared model building blocks.

These blocks mirror the layer contracts of the reference architectures
(`/root/reference/btsbot/architectures.py`) but are Flax modules operating in
NHWC with configurable compute dtype:

* ``MetadataBranch`` — BatchNorm → Dense → act → Dropout → Dense → act
  (reference architectures.py:68-75, :146-153, :205-212);
* ``CombinedHead``  — Dense → act → Dense → act → Dropout → Dense(1)
  (reference architectures.py:79-86, :157-164, :215-222);
* ``ImageHead``     — Dense → GELU/ReLU → Dense → act → Dropout → Dense(1)
  used by the single-modal backbones (reference architectures.py:32-40,
  :109-119, :263-270).

GELUs are exact (erf-based) to match ``torch.nn.GELU()`` defaults; BatchNorm
uses eps 1e-5 / momentum 0.9 (torch BatchNorm1d defaults, momentum=0.1 in
torch's running-stat convention).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching ``torch.nn.GELU()`` to the working precision.

    In float32 this is the exact erf form (bit-parity with torch's default).
    In bfloat16 the tanh approximation is used instead: its deviation from
    erf-GELU (≤3e-3 absolute) is below bf16 resolution (eps ≈ 7.8e-3), and
    on TPU the tanh form fuses into the preceding matmul's epilogue while
    XLA's erf costs a separate multi-pass VPU evaluation (~2.5× block-MLP
    cost at BTSbot shapes — measured on v5e, see bench notes).
    """
    if x.dtype == jnp.bfloat16:
        return nn.gelu(x, approximate=True)
    return nn.gelu(x, approximate=False)


ACTIVATIONS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "relu": nn.relu,
    "gelu": gelu_exact,
}


def check_inputs(model_name: str, image_input, metadata_input) -> None:
    """Friendly modality validation — a clear error instead of a deep flax
    NoneType failure when a required input is missing."""
    from ..core.config import (
        IMAGE_ONLY_MODELS,
        METADATA_ONLY_MODELS,
        MULTIMODAL_MODELS,
    )

    if model_name in IMAGE_ONLY_MODELS + MULTIMODAL_MODELS \
            and image_input is None:
        raise ValueError(
            f"{model_name} requires image_input (NHWC triplets)")
    if model_name in METADATA_ONLY_MODELS + MULTIMODAL_MODELS \
            and metadata_input is None:
        raise ValueError(f"{model_name} requires metadata_input")


class MetadataBranch(nn.Module):
    fc1: int
    fc2: int
    dropout: float
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        x = nn.Dense(self.fc1, dtype=self.dtype, name="fc1")(x)
        x = act(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.fc2, dtype=self.dtype, name="fc2")(x)
        x = act(x)
        return x


class CombinedHead(nn.Module):
    fc1: int
    fc2: int
    dropout: float
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        x = nn.Dense(self.fc1, dtype=self.dtype, name="fc1")(x)
        x = act(x)
        x = nn.Dense(self.fc2, dtype=self.dtype, name="fc2")(x)
        x = act(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        self.sow("intermediates", "penultimate", x)
        x = nn.Dense(1, dtype=self.dtype, name="out")(x)
        return x


class ImageHead(nn.Module):
    """Classifier head appended to backbones by the single-modal models."""

    fc1: int
    fc2: int
    dropout: float
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        x = nn.Dense(self.fc1, dtype=self.dtype, name="fc1")(x)
        x = act(x)
        x = nn.Dense(self.fc2, dtype=self.dtype, name="fc2")(x)
        x = act(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        self.sow("intermediates", "penultimate", x)
        x = nn.Dense(1, dtype=self.dtype, name="out")(x)
        return x
