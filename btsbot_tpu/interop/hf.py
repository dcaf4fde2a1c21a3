"""HuggingFace Hub model loading with the reference's public API.

Mirrors `/root/reference/btsbot/from_HF.py`: same repo naming scheme
(``nabeelr/BTSbot-{arch}-{pretrain}[-metadata]``, from_HF.py:32-34), same
parameter validation (:16-29), same local cache layout (``models/<name>``),
but the checkpoint is converted into a JAX param tree on load via
btsbot_tpu.interop.convert.  Returns ``(model, variables, config)`` ready for
jit-compiled inference.

Network access is optional: in air-gapped environments, point ``model_dir``
at a local snapshot containing ``train_config.json`` + ``pytorch_model.bin``.
"""

from __future__ import annotations

import json
import os

from ..core.config import normalize_config
from ..models.factory import build_model
from .convert import torch_state_dict_to_variables


def validate_model_params(architecture: str, multi_modal: bool, pretrain: str):
    if architecture == "convnext":
        architecture = "convnext-pico"
    elif architecture == "maxvit":
        architecture = "maxvit-tiny"
    elif architecture == "inceptionnext":
        # TPU-native serving variant published by this package (no such
        # repo exists upstream; naming mirrors the reference scheme)
        architecture = "inceptionnext-pico"
    else:
        raise ValueError(f"Invalid architecture: {architecture}")

    if pretrain == "imagenet":
        pretrain = "in1k"
    elif pretrain not in ("galaxyzoo", "randinit"):
        raise ValueError(f"Invalid pre-training regimen: {pretrain}")

    return architecture, multi_modal, pretrain


def get_HF_model_link(architecture: str, multi_modal: bool, pretrain: str) -> str:
    architecture, multi_modal, pretrain = validate_model_params(
        architecture, multi_modal, pretrain)
    return ("nabeelr/BTSbot-" + architecture + "-" + pretrain
            + ("-metadata" if multi_modal else ""))


def get_local_model_dir(architecture: str, multi_modal: bool, pretrain: str,
                        models_root: str = "models") -> str:
    link = get_HF_model_link(architecture, multi_modal, pretrain)
    return os.path.join(models_root, link.split("/")[-1])


def download_HF_model(architecture: str, multi_modal: bool, pretrain: str,
                      models_root: str = "models") -> str:
    """Snapshot-download the model repo (requires network + huggingface_hub)."""
    from huggingface_hub import snapshot_download

    link = get_HF_model_link(architecture, multi_modal, pretrain)
    model_dir = get_local_model_dir(architecture, multi_modal, pretrain,
                                    models_root)
    os.makedirs(model_dir, exist_ok=True)
    snapshot_download(repo_id=link, local_dir=model_dir)
    return model_dir


def load_torch_checkpoint(path: str) -> dict:
    """Read a torch .pth/.bin state dict as numpy arrays (needs torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def load_model_dir(model_dir: str, dtype=None):
    """Load (model, variables, config) from a local snapshot directory
    containing train_config.json + pytorch_model.bin."""
    import jax.numpy as jnp

    with open(os.path.join(model_dir, "train_config.json"), "r") as f:
        config = normalize_config(json.load(f))
    sd = load_torch_checkpoint(os.path.join(model_dir, "pytorch_model.bin"))
    model = build_model(config, dtype=dtype or jnp.float32)
    variables = torch_state_dict_to_variables(config, sd)
    return model, variables, config


def load_HF_model(architecture: str, multi_modal: bool, pretrain: str,
                  models_root: str = "models", dtype=None):
    """Reference-compatible entry point (from_HF.py:59-81): download if the
    local snapshot is missing, then build the JAX model + converted weights."""
    model_dir = get_local_model_dir(architecture, multi_modal, pretrain,
                                    models_root)
    required = ("pytorch_model.bin", "train_config.json")
    if not all(os.path.isfile(os.path.join(model_dir, f)) for f in required):
        download_HF_model(architecture, multi_modal, pretrain, models_root)
    return load_model_dir(model_dir, dtype=dtype)
