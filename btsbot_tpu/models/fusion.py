"""Frozen-fusion model: fuse two independently-trained single-modal models.

Reference ``frozen_fusion`` (`/root/reference/btsbot/architectures.py:296-372`)
loads a trained image model and a trained metadata model, strips their
classification heads, freezes both branches, and trains only a new combined
head.  Head-stripping semantics preserved per branch type
(architectures.py:297-320):

* ``um_cnn``  → features are the flattened conv stack output
  (head → Identity, emb = conv feature dim);
* ``ConvNeXt`` → global pool + head LayerNorm (emb = backbone channels);
* ``MaxViT``  → global pool only (emb = backbone channels);
* ``um_nn``   → BatchNorm→fc1→ReLU→Dropout→fc2, WITHOUT the trailing ReLU
  (the [:-2] slice at architectures.py:300-302 drops the final ReLU and
  Dense(1)).

The branch parameter subtrees keep the same names as the standalone models,
so trained checkpoints load directly into the fusion tree
(see btsbot_tpu.interop.convert.load_fusion_branches); freezing is applied in
the training engine by masking the optimizer update (zero-update on
``image_branch``/``meta_branch`` subtrees) rather than by ad-hoc
requires_grad flags (reference train.py:224-236).
"""

from __future__ import annotations

import json
import os
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .cnn import CnnBackbone
from .common import ACTIVATIONS, CombinedHead
from .convnext import global_avg_pool

Dtype = Any


def resolve_fusion_config(config: dict) -> dict:
    """Fill image_model_config / meta_model_config from the branch model dirs'
    report.json when not provided inline (architectures.py:323-326)."""
    config = dict(config)
    for key, dir_key in (("image_model_config", "image_model_dir"),
                         ("meta_model_config", "meta_model_dir")):
        if config.get(key) is None:
            report = os.path.join(config[dir_key], "report.json")
            with open(report, "r") as f:
                config[key] = json.load(f)["train_config"]
    return config


class _ImageFeatures(nn.Module):
    """Head-stripped image branch (um_cnn / ConvNeXt / MaxViT)."""

    branch_config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        name = self.branch_config["model_name"]
        if name == "um_cnn":
            feats = CnnBackbone(
                conv1_channels=self.branch_config["conv1_channels"],
                conv2_channels=self.branch_config["conv2_channels"],
                kernel=self.branch_config["conv_kernel"],
                dropout1=self.branch_config["conv_dropout1"],
                dropout2=self.branch_config["conv_dropout2"],
                dtype=self.dtype, name="backbone",
            )(x, train=train)
            return feats
        if name == "ConvNeXt":
            # reuse the canonical builder so inceptionnext/.r<k> kinds keep
            # their token_mixer + mlp_ratio (a trained branch checkpoint
            # must graft onto an identical tree)
            from .convnext import _backbone_from_config
            feats = _backbone_from_config(self.branch_config, self.dtype)(x)
            feats = global_avg_pool(feats)
            return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                name="head_norm")(feats)
        if name == "MaxViT":
            # canonical builder: window = native resolution / 32, so e.g. a
            # retargeted maxvit_tiny_rw_160 branch partitions correctly
            from .maxvit import _backbone_and_size
            backbone, image_size = _backbone_and_size(self.branch_config,
                                                      self.dtype)
            x = resize_bilinear(x, image_size)
            return jnp.mean(backbone(x, train=train), axis=(1, 2))
        raise ValueError(f"Model {name} not supported as fusion image branch")


class _MetaFeatures(nn.Module):
    """Head-stripped um_nn: BN→fc1→ReLU→Dropout→fc2 (no trailing act)."""

    branch_config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS["relu"]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.Dense(self.branch_config["meta_fc1_neurons"], dtype=self.dtype,
                     name="fc1")(x)
        x = act(x)
        x = nn.Dropout(self.branch_config["meta_dropout"],
                       deterministic=not train)(x)
        x = nn.Dense(self.branch_config["meta_fc2_neurons"], dtype=self.dtype,
                     name="fc2")(x)
        return x


def _branch_subtrees(branch_name: str, params: dict, stats: dict):
    """Map a trained standalone model's variable subtrees onto the fusion
    branch layout (head-stripping per architectures.py:297-320)."""
    if branch_name == "um_cnn":
        return {"backbone": params["backbone"]}, {}
    if branch_name == "ConvNeXt":
        return ({"backbone": params["backbone"],
                 "head_norm": params["head_norm"]}, {})
    if branch_name == "MaxViT":
        return ({"backbone": params["backbone"]},
                {"backbone": stats["backbone"]} if "backbone" in stats else {})
    if branch_name == "um_nn":
        return ({"bn": params["branch"]["bn"],
                 "fc1": params["branch"]["fc1"],
                 "fc2": params["branch"]["fc2"]},
                {"bn": stats["branch"]["bn"]})
    raise ValueError(f"Model {branch_name} not supported as fusion branch")


def load_fusion_branches(config: dict, fusion_variables: dict) -> dict:
    """Populate a FrozenFusion variables tree with trained branch weights.

    The reference loads each branch's ``best_model.pth`` through its own
    class and strips heads in-place (architectures.py:322-354).  Here each
    branch dir may hold either a btsbot-tpu checkpoint (``best/`` orbax dir)
    or a reference torch checkpoint (``best_model.pth``); weights are
    converted as needed and grafted into the ``image_branch``/``meta_branch``
    subtrees.  Returns a new variables dict.
    """
    import copy

    from ..core.config import normalize_config

    cfg = resolve_fusion_config(config)
    out = copy.deepcopy({k: dict(v) for k, v in fusion_variables.items()})

    for branch_key, cfg_key, dir_key in (
        ("image_branch", "image_model_config", "image_model_dir"),
        ("meta_branch", "meta_model_config", "meta_model_dir"),
    ):
        branch_cfg = normalize_config(cfg[cfg_key])
        model_dir = cfg[dir_key]
        variables = _load_branch_checkpoint(branch_cfg, model_dir)
        params, stats = _branch_subtrees(
            branch_cfg["model_name"], variables["params"],
            variables.get("batch_stats", {}))
        out["params"][branch_key] = params
        if stats:
            out.setdefault("batch_stats", {})[branch_key] = stats
    return out


def _load_branch_checkpoint(branch_cfg, model_dir: str) -> dict:
    from ..engine.checkpoint import load_model_checkpoint

    return load_model_checkpoint(branch_cfg, model_dir)


class FrozenFusion(nn.Module):
    config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_input=None, metadata_input=None,
                 train: bool = False) -> jnp.ndarray:
        from .common import check_inputs
        check_inputs("frozen_fusion", image_input, metadata_input)
        cfg = resolve_fusion_config(self.config)
        img = _ImageFeatures(cfg["image_model_config"], dtype=self.dtype,
                             name="image_branch")(image_input, train=train)
        meta = _MetaFeatures(cfg["meta_model_config"], dtype=self.dtype,
                             name="meta_branch")(metadata_input, train=train)
        combined = jnp.concatenate([img, meta], axis=1)
        return CombinedHead(
            fc1=cfg["comb_fc1_neurons"],
            fc2=cfg["comb_fc2_neurons"],
            dropout=cfg["comb_dropout"],
            activation="relu",
            dtype=self.dtype,
            name="combined_head",
        )(combined, train=train)
